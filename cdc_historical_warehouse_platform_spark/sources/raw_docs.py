"""Raw-asset ingestion: loose text / JSONL / binary files → the
engine's `documents` / multimodal schemas.

The corpus pipeline (pipeline/corpus_build.py) consumes
``documents.parquet``; these readers are the step BEFORE it — turning
a crawl/export directory into that table with stable, re-ingestable
ids. All three use Spark's built-in distributed file sources
(``text`` with ``wholetext``, ``json`` with an explicit schema +
FAILFAST, ``binaryFile``) — file listing and reading scale with the
cluster, never the driver.

Id discipline: ``doc_id`` is the first 15 hex digits of the md5 of the
file path (text) or the producer-supplied id (jsonl) — deterministic,
so re-ingesting the same directory yields the same ids and the corpus
fingerprint tier dedups re-deliveries instead of double-admitting
them. 15 hex < 2^60 keeps the id inside BIGINT exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "read_text_documents",
    "read_jsonl_documents",
    "read_html_documents",
    "read_binary_assets",
]

JSONL_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _path_id() -> F.Column:
    # md5(path)[:15 hex] < 2^60: exact in BIGINT, stable across runs
    return F.conv(
        F.substring(F.md5(F.input_file_name()), 1, 15), 16, 10
    ).cast("long")


def read_text_documents(
    spark: SparkSession, input_dir: str, source: str = "files"
) -> DataFrame:
    """One document per ``*.txt`` file (``wholetext`` — the file is the
    unit, not the line). Newlines normalized to spaces so the corpus
    tokenizers' whitespace contract holds."""
    raw = spark.read.text(f"{input_dir}/*.txt", wholetext=True)
    text = F.regexp_replace(F.col("value"), r"\s+", " ")
    return raw.select(
        _path_id().alias("doc_id"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(source).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def read_jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """One document per JSONL line, explicit schema + FAILFAST (the
    change_batches discipline: schema inference on untrusted producer
    data is a silent-drift vector)."""
    return (
        spark.read.schema(JSONL_DOC_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def read_binary_assets(
    spark: SparkSession, input_dir: str, pattern: str = "*"
) -> DataFrame:
    """Opaque binary ingestion via Spark's ``binaryFile`` source — the
    real seam the multimodal tier's deterministic fakes stand in for:
    (asset_id, payload, meta{mime, n_bytes, checksum, path}) in exactly
    the attach_binary_payload shape, so decode/feature UDFs compose
    unchanged. ``binaryFile`` caps file size via
    spark.sql.sources.binaryFile.maxLength (driver-side listing only;
    content is read executor-side)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(input_dir)
    )
    return raw.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
        .cast("long")
        .alias("asset_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("checksum"),
            F.col("path").alias("path"),
        ).alias("meta"),
    )


def read_html_documents(
    spark: SparkSession,
    input_dir: str,
    source: str = "web",
    min_words: int = 10,
    max_link_density: float = 0.33,
) -> DataFrame:
    """One document per ``*.htm(l)`` file: wholetext read, then
    boilerplate REMOVAL via operators/html.extract_main_content
    (link-density block scoring — nav/menu/footer link farms dropped,
    article prose kept), then the corpus whitespace contract. The
    extraction is Arrow-batched and per-file parallel; ids follow the
    same md5(path) discipline as the text reader, so re-ingesting a
    crawl directory re-delivers the same ids and the corpus
    fingerprint tier dedups instead of double-admitting. Pages whose
    every block is boilerplate yield empty text and fall to the
    corpus quality gate."""
    from cdc_historical_warehouse_platform_spark.operators.html import (
        extract_main_content,
    )

    raw = spark.read.text(f"{input_dir}/*.htm*", wholetext=True)
    pages = raw.select(_path_id().alias("doc_id"), F.col("value").alias("html"))
    content = extract_main_content(
        pages, html_col="html", min_words=min_words, max_link_density=max_link_density
    )
    text = F.regexp_replace(F.col("content"), r"\s+", " ")
    return content.select(
        "doc_id",
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(source).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
