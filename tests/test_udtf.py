"""Python UDTF surface (operators/table_functions.py).

Pins: the UDTF chunker emits EXACTLY the vectorized production
chunker's spans (twin equality), LATERAL-join SQL registration works,
and sentence fan-out is data-dependent per row."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.table_functions import (
    ChunkSpans,
    SentenceSpans,
    register_udtfs,
)
from cdc_historical_warehouse_platform_spark.operators.text import chunk_token_spans

from conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)


def test_udtf_chunker_matches_vectorized_twin(spark):
    docs = _docs(spark)
    expected = {
        (r.doc_id, r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_token_spans(
            docs, chunk_tokens=32, overlap=8
        ).collect()
    }
    got = {
        (r.doc_id, r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_text)
        for r in docs.lateralJoin(
            ChunkSpans(F.col("text").outer(), F.lit(32), F.lit(8))
        )
        .select("doc_id", "chunk_id", "start_token", "n_chunk_tokens", "chunk_text")
        .collect()
    }
    assert got == expected


def test_udtf_sql_lateral_registration(spark):
    register_udtfs(spark)
    _docs(spark).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens
        FROM udtf_docs d, LATERAL chunk_spans(d.text, 16, 4) c
        """
    ).collect()
    assert len(rows) > 0
    assert all(r.n_chunk_tokens <= 16 for r in rows)


def test_sentence_udtf_fanout_is_data_dependent(spark):
    df = spark.createDataFrame(
        [("a", "One. Two! Three?"), ("b", "Just one sentence"), ("c", None)],
        "doc_id string, text string",
    )
    out = (
        df.lateralJoin(SentenceSpans(F.col("text").outer()))
        .select("doc_id", "sentence_id", "sentence", "n_words")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.sentence)
    assert by_doc["a"] == ["One.", "Two!", "Three?"]
    assert by_doc["b"] == ["Just one sentence"]
    assert "c" not in by_doc
