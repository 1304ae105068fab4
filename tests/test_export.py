"""corpus-export — the packed-training-shard deliverable.

Pins the end-to-end chain corpus_build → bpe_train → token counts →
packing coordinates → range-sharded export, and the trainer-facing
invariants: tokens_before is the exclusive prefix sum in export order,
pack_id/pack_offset derive from it exactly, and every pack except the
last is fully covered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators import bpe as BPE
from cdc_historical_warehouse_platform_spark.operators.packing import packed_sequence_ids
from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import corpus_build

SF = "/root/testdata/sf0.001"
SEQ = 128


def test_export_chain_prefix_sum_contract(spark, tmp_path):
    corpus_build(spark, SF, str(tmp_path / "c"))
    docs = spark.read.parquet(str(tmp_path / "c")).select("doc_id", "text")
    merges_df, _ = BPE.bpe_train(docs, num_merges=10)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    counts = BPE.bpe_token_counts(docs, merges)
    packed = packed_sequence_ids(
        counts, token_col="n_bpe_tokens", seq_len=SEQ, order_col="doc_id",
        bucket_size=64,
    )
    rows = sorted(
        packed.select("doc_id", "n_bpe_tokens", "tokens_before", "pack_id", "pack_offset").collect(),
        key=lambda r: r["tokens_before"],
    )
    # exclusive prefix sum in doc order, zero-based
    running = 0
    for r in rows:
        assert r["tokens_before"] == running, r
        assert r["pack_id"] == running // SEQ
        assert r["pack_offset"] == running % SEQ
        running += r["n_bpe_tokens"]
    # doc order == doc_id order (the deterministic export order)
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)
    total = counts.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert running == total


def test_export_range_sharding_keeps_packs_contiguous(spark, tmp_path):
    corpus_build(spark, SF, str(tmp_path / "c"))
    docs = spark.read.parquet(str(tmp_path / "c")).select("doc_id", "text")
    merges_df, _ = BPE.bpe_train(docs, num_merges=5)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    counts = BPE.bpe_token_counts(docs, merges).join(docs, "doc_id")
    packed = packed_sequence_ids(
        counts, token_col="n_bpe_tokens", seq_len=SEQ, order_col="doc_id",
        bucket_size=64,
    )
    out = str(tmp_path / "exp")
    (
        packed.select("doc_id", "n_bpe_tokens", "tokens_before", "pack_id", "pack_offset")
        .repartitionByRange(4, "pack_id")
        .sortWithinPartitions("pack_id", "pack_offset")
        .write.mode("overwrite").parquet(out)
    )
    # range sharding: every pack_id lives in exactly one file (a
    # trainer never opens two files for one sequence's doc list)...
    per = (
        spark.read.parquet(out)
        .select("pack_id", F.input_file_name().alias("f"))
        .groupBy("pack_id")
        .agg(F.count_distinct("f").alias("nf"))
    )
    # ...except packs that straddle a range boundary — range
    # partitioning splits on pack_id VALUES, so a pack is never split
    assert per.filter(F.col("nf") > 1).count() == 0


def test_forget_then_export_excludes_forgotten_docs(spark, tmp_path):
    """Governance composes with the deliverable: after corpus_forget,
    the packed export contains no trace of the forgotten docs and the
    prefix-sum contract re-derives over the survivors."""
    from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import corpus_forget

    corpus_build(spark, SF, str(tmp_path / "c"))
    docs = spark.read.parquet(str(tmp_path / "c")).select("doc_id", "text")
    victims = [r["doc_id"] for r in docs.orderBy("doc_id").limit(2).collect()]
    corpus_forget(spark, victims, str(tmp_path / "c"))

    survivors = spark.read.parquet(str(tmp_path / "c")).select("doc_id", "text")
    merges_df, _ = BPE.bpe_train(survivors, num_merges=5)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    counts = BPE.bpe_token_counts(survivors, merges)
    packed = packed_sequence_ids(
        counts, token_col="n_bpe_tokens", seq_len=SEQ, order_col="doc_id",
        bucket_size=64,
    )
    ids = {r["doc_id"] for r in packed.select("doc_id").collect()}
    assert ids.isdisjoint(victims)
    rows = sorted(packed.collect(), key=lambda r: r["tokens_before"])
    running = 0
    for r in rows:
        assert r["tokens_before"] == running
        running += r["n_bpe_tokens"]
