"""pipeline/corpus_build.corpus_forget — right-to-be-forgotten.

Pins: physical removal from shards + every dedup-state table, manifest
and marker consistency, quota give-back, re-admission of re-submitted
text (no tombstone), the no-op path for unknown ids, and repair
stability of the committed post-forget epoch.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import (
    corpus_append,
    corpus_build,
    corpus_forget,
    corpus_top_tokens,
)
from cdc_historical_warehouse_platform_spark.pipeline.corpus_state import read_marker, repair

SF = "/root/testdata/sf0.001"


def _ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).distinct().collect()}


def test_corpus_forget_end_to_end(spark, tmp_path):
    out = str(tmp_path / "c")
    corpus_build(spark, SF, out, track_top_tokens=256)
    before = spark.read.parquet(out).drop("shard").localCheckpoint(eager=True)
    kept_ids = sorted(_ids(before))
    victims = kept_ids[:3]
    n_before = before.count()
    epoch_before = read_marker(tmp_path / "c")["epoch"]

    r = corpus_forget(spark, victims, out)
    assert r["requested"] == 3 and r["forgotten"] == 3
    assert r["shards_rewritten"] >= 1

    # physically gone from the corpus and every state table
    after = spark.read.parquet(out)
    assert _ids(after).isdisjoint(victims)
    assert after.count() == n_before - 3 == r["corpus_rows"]
    for d in ("_kept_docs", "_lsh_index", "_fp_index"):
        assert _ids(spark.read.parquet(str(tmp_path / "c" / d))).isdisjoint(victims), d

    # manifest rows reconcile with the actual layout, marker advanced
    manifest = json.loads((tmp_path / "c" / "_manifest.json").read_text())
    assert manifest["total_rows"] == n_before - 3
    assert read_marker(tmp_path / "c")["epoch"] == epoch_before + 1

    # the committed post-forget state is repair-stable (nothing torn)
    assert repair(tmp_path / "c")["removed"] == []

    # top-token report still runs exactly over the post-forget corpus
    report = corpus_top_tokens(spark, out, k=5)
    assert report["provably_exact"] is True

    # no tombstone: re-submitting the SAME text under the same ids is
    # admitted again (fp + LSH state really forgot them)
    resubmit = before.filter(F.col("doc_id").isin([int(v) for v in victims]))
    a = corpus_append(spark, resubmit, out)
    assert a["appended"] == 3
    assert _ids(spark.read.parquet(out)) >= set(victims)


def test_corpus_forget_returns_quota_headroom(spark, tmp_path):
    out = str(tmp_path / "c")
    corpus_build(spark, SF, out, max_per_source=3)
    kept = spark.read.parquet(out).localCheckpoint(eager=True)
    # forget every kept doc of ONE source → its quota fully frees
    src, n_src = (
        kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).orderBy("source").collect()[0]
    )
    victims = [r["doc_id"] for r in kept.filter(F.col("source") == src).collect()]
    r = corpus_forget(spark, victims, out)
    assert r["forgotten"] == n_src
    counts = (
        spark.read.parquet(str(tmp_path / "c" / "_source_counts"))
        .groupBy("source")
        .agg(F.sum("n_kept").alias("n"))
    )
    freed = {row["source"]: row["n"] for row in counts.collect()}
    assert freed.get(src, 0) == 0
    # a fresh batch from that source can now fill the quota again
    fresh = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("doc_id").between(100, 160))
        .withColumn("doc_id", F.col("doc_id") + 50_000)
        .withColumn("source", F.lit(src))
        .withColumn("text", F.array_join(F.reverse(F.split(F.col("text"), " ")), " "))
    )
    a = corpus_append(spark, fresh, out)
    post = spark.read.parquet(out).filter(F.col("source") == src).count()
    # quota is live again: the source refills up to (not beyond) the cap
    assert 1 <= post <= 3
    assert a["appended"] == post


def test_corpus_forget_unknown_ids_is_safe(spark, tmp_path):
    out = str(tmp_path / "c")
    corpus_build(spark, SF, out)
    n = spark.read.parquet(out).count()
    r = corpus_forget(spark, [99_999_901, 99_999_902], out)
    assert r["forgotten"] == 0
    assert r["shards_rewritten"] == 0 and r["state_files_rewritten"] == 0
    assert spark.read.parquet(out).count() == n
    assert repair(tmp_path / "c")["removed"] == []


def test_corpus_append_aligns_producer_drift(spark, tmp_path):
    """A drifted producer batch (extra column, missing optional column)
    aligns to the stored corpus schema instead of poisoning the parquet
    layout; lossy type drift refuses loudly."""
    import pytest
    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.operators.schema_drift import SchemaDriftError

    out = str(tmp_path / "c")
    corpus_build(spark, SF, out)
    base = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("doc_id").between(50, 80))
        .withColumn("doc_id", F.col("doc_id") + 70_000)
        .withColumn("text", F.array_join(F.reverse(F.split(F.col("text"), " ")), " "))
    )
    drifted = base.drop("lang").withColumn("crawl_batch", F.lit("b7"))
    r = corpus_append(spark, drifted, out)
    assert r["schema_drift"]["extra"] == ["crawl_batch"]
    assert r["schema_drift"]["missing"] == ["lang"]
    got = spark.read.parquet(str(tmp_path / "c" / "_kept_docs"))
    assert "crawl_batch" not in got.columns
    # whole-dir reads still work: one consistent schema
    assert spark.read.parquet(out).count() == r["corpus_rows"]

    lossy = base.withColumn("n_chars", F.col("n_chars").cast("string")).withColumn(
        "n_chars", F.concat(F.col("n_chars"), F.lit("x"))
    )
    with pytest.raises(SchemaDriftError):
        corpus_append(spark, lossy, out)


def test_concurrent_epoch_writes_crash_before_marker_repairs_exactly(
    spark, tmp_path, monkeypatch
):
    """Fault-injection for the r7 concurrency change (corpus_append's
    4-6 state writes run in a thread pool, marker last). Kill the
    epoch AFTER some concurrent writes landed but BEFORE the marker:

    - the marker must never publish (this test fails the moment any
      future code path publishes before every write resolves);
    - repair() must roll the corpus back to the prior epoch EXACTLY
      (file set, manifest, row count);
    - the retried append must then succeed with consistent counts.
    """
    from cdc_historical_warehouse_platform_spark.pipeline import corpus_build as cb

    out = str(tmp_path / "c")
    cb.corpus_build(spark, SF, out)
    committed_marker = json.loads((tmp_path / "c" / "_corpus_commit").read_text())
    committed_manifest = (tmp_path / "c" / "_manifest.json").read_text()
    n_before = spark.read.parquet(out).count()

    new = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            (F.col("doc_id") + 70_000).alias("doc_id"),
            F.array_join(F.reverse(F.split(F.col("text"), " ")), " ").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )

    # crash injection: the shards thread completes its FILE writes and
    # manifest merge (state landed on disk), then dies before
    # returning — while the sibling threads (kept/lsh/fp) run to
    # completion; the epoch is torn mid-flight
    real_shards = cb.write_training_shards
    marker_calls = []

    def dying_shards(*a, **k):
        real_shards(*a, **k)
        raise RuntimeError("injected: thread died after its writes landed")

    def guarded_marker(*a, **k):  # pragma: no cover - must never run
        marker_calls.append(1)
        raise AssertionError("marker published before every write resolved")

    monkeypatch.setattr(cb, "write_training_shards", dying_shards)
    monkeypatch.setattr(cb, "write_marker", guarded_marker)
    try:
        cb.corpus_append(spark, new, out)
        raise AssertionError("append must propagate the injected crash")
    except RuntimeError as e:
        assert "injected" in str(e)
    # the marker NEVER published before every write resolved
    assert marker_calls == []
    assert (
        json.loads((tmp_path / "c" / "_corpus_commit").read_text())
        == committed_marker
    )

    # repair restores the prior epoch exactly: torn files removed,
    # manifest byte-identical, corpus rows unchanged
    monkeypatch.undo()
    r = repair(tmp_path / "c")
    assert r["epoch"] == committed_marker["epoch"]
    assert r["removed"], "the torn epoch left files that repair must remove"
    assert (tmp_path / "c" / "_manifest.json").read_text() == committed_manifest
    assert spark.read.parquet(out).count() == n_before

    # the retried append (same batch) completes and reconciles
    a = cb.corpus_append(spark, new, out)
    assert a["appended"] > 0
    assert spark.read.parquet(out).count() == n_before + a["appended"]
    assert repair(tmp_path / "c")["removed"] == []
