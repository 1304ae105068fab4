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


def test_committed_read_survives_crash_mid_forget(spark, tmp_path):
    """Simulates a crash between corpus_forget's write_marker and its
    unlink loop (superseded shard files still on disk): a raw directory
    read resurrects the forgotten doc, read_committed_corpus must not —
    it repairs to the committed epoch and reads only the manifest's
    live file list. This is the read path corpus-export uses."""
    import shutil

    from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import (
        corpus_forget,
        read_committed_corpus,
    )

    out = tmp_path / "c"
    corpus_build(spark, SF, str(out))
    docs = spark.read.parquet(str(out)).select("doc_id", "text")
    victim = docs.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    pre_files = {p for p in out.rglob("*.parquet") if "shard=" in str(p)}
    stash = {}
    for p in pre_files:
        stash[p] = tmp_path / "stash" / p.relative_to(out)
        stash[p].parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(p, stash[p])
    corpus_forget(spark, [victim], str(out))
    # resurrect the superseded (pre-forget) files = the crash state
    for p, s in stash.items():
        if not p.exists():
            shutil.copy2(s, p)
    raw_ids = {r["doc_id"] for r in spark.read.parquet(str(out)).select("doc_id").collect()}
    assert victim in raw_ids  # the hazard is real
    committed = read_committed_corpus(spark, str(out))
    ids = [r["doc_id"] for r in committed.select("doc_id").collect()]
    assert victim not in ids
    assert len(ids) == len(set(ids))  # no double-counted survivors
