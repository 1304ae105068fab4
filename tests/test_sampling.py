"""Deterministic sampling + shard-writer: properties the oracle gate
can't express (re-run determinism, shard disjointness, file bounds)."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.sampling import (
    _rate_threshold,
    hash_sample,
    keep_expr,
    shard_id,
    stratified_hash_sample,
    write_training_shards,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_rate_threshold_hex():
    assert _rate_threshold(0.5) == "8000"
    assert _rate_threshold(0.125) == "2000"
    assert _rate_threshold(1 / 65536) == "0001"
    with pytest.raises(ValueError):
        _rate_threshold(0.0)
    with pytest.raises(ValueError):
        _rate_threshold(1.0)


def test_hash_sample_deterministic_and_python_reproducible(docs):
    kept1 = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.25).select("doc_id").collect())
    kept2 = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.25).select("doc_id").collect())
    assert kept1 == kept2
    # the keep decision is plain md5 — recompute it in Python
    expected = [
        r.doc_id
        for r in docs.select("doc_id").collect()
        if hashlib.md5(f"corpus-sample:{r.doc_id}".encode()).hexdigest()[:4] < "4000"
    ]
    assert kept1 == sorted(expected)
    # rate lands near the target on uniform keys
    n = docs.count()
    assert abs(len(kept1) / n - 0.25) < 0.08


def test_hash_sample_monotone_nesting(docs):
    """A row kept at rate r is kept at every rate > r — hash gating
    gives nested samples (resize a sample without re-drawing)."""
    k10 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.10).select("doc_id").collect()}
    k50 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.50).select("doc_id").collect()}
    assert k10 <= k50


def test_keep_expr_degenerate_rates(docs):
    n = docs.count()
    assert docs.where(keep_expr(F.col("doc_id"), 1.0)).count() == n
    assert docs.where(keep_expr(F.col("doc_id"), 0.0)).count() == 0


def test_stratified_rates_and_audit_column(docs):
    base = docs.withColumn(
        "stratum", F.when(F.col("doc_id") % 2 == 0, F.lit("even")).otherwise(F.lit("odd"))
    )
    kept = stratified_hash_sample(
        base, "doc_id", "stratum", rates={"even": 1.0, "odd": 0.25}
    )
    rows = kept.select("doc_id", "stratum", "sample_key").collect()
    evens = [r for r in rows if r.stratum == "even"]
    odds = [r for r in rows if r.stratum == "odd"]
    n_even = base.where("stratum = 'even'").count()
    n_odd = base.where("stratum = 'odd'").count()
    assert len(evens) == n_even  # rate 1.0 keeps everything
    assert 0 < len(odds) < n_odd
    for r in odds:
        assert r.sample_key < "4000"
        assert (
            hashlib.md5(f"corpus-sample:{r.doc_id}".encode()).hexdigest()[:4]
            == r.sample_key
        )


def test_stratified_unlisted_stratum_dropped_by_default(docs):
    base = docs.withColumn("stratum", F.lit("unlisted"))
    assert stratified_hash_sample(base, "doc_id", "stratum", rates={"known": 1.0}).count() == 0


def test_shard_id_stable_under_reordering(docs):
    a = {
        r.doc_id: r.s
        for r in docs.select("doc_id", shard_id(F.col("doc_id"), 8).alias("s")).collect()
    }
    b = {
        r.doc_id: r.s
        for r in docs.orderBy(F.rand(seed=7))
        .repartition(3)
        .select("doc_id", shard_id(F.col("doc_id"), 8).alias("s"))
        .collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))


def test_write_training_shards_manifest_and_bounds(docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs.select("doc_id", "lang", "text"),
        out,
        key_col="doc_id",
        num_shards=4,
        max_records_per_file=10,
    )
    n = docs.count()
    assert manifest["total_rows"] == n
    assert len(manifest["shards"]) == 4
    # every file respects the record bound
    spark = docs.sparkSession
    for k, meta in manifest["shards"].items():
        d = Path(out) / f"shard={k}"
        for fname in meta["files"]:
            assert spark.read.parquet(str(d / fname)).count() <= 10
    # round-trip: exactly the input rows, each exactly once
    back = spark.read.parquet(out)
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n
    # manifest persisted and identical to the returned dict
    on_disk = json.loads((Path(out) / "_manifest.json").read_text())
    assert on_disk == manifest
    # shard assignment matches the shard_id expression (re-run stable)
    expected = {
        r.doc_id: r.s
        for r in docs.select("doc_id", shard_id(F.col("doc_id"), 4).alias("s")).collect()
    }
    actual = {r.doc_id: int(r.shard) for r in back.select("doc_id", "shard").collect()}
    assert actual == expected


def test_write_training_shards_append_extends_layout(docs, tmp_path):
    from cdc_historical_warehouse_platform_spark.operators.sampling import write_training_shards

    spark = docs.sparkSession
    first = docs.filter(F.col("doc_id") < 50)
    extra = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 70))
    out = str(tmp_path / "shards")
    m1 = write_training_shards(first, out, key_col="doc_id", num_shards=4)
    m2 = write_training_shards(
        extra, out, key_col="doc_id", num_shards=4, mode="append"
    )
    assert m1["total_rows"] == 50 and m2["total_rows"] == 70
    back = spark.read.parquet(out)
    assert back.count() == 70
    # shard assignment is stable: a doc present since the first write
    # sits in the same shard the appended manifest reports
    ids = {r["doc_id"] for r in back.filter(F.col("shard") == 0).collect()}
    again = {
        r["doc_id"]
        for r in spark.read.parquet(out).filter(F.col("shard") == 0).collect()
    }
    assert ids == again and m2["num_shards"] == 4


def test_stratified_fractional_default_rate_samples_unlisted(docs):
    from cdc_historical_warehouse_platform_spark.operators.sampling import stratified_hash_sample

    # no stratum listed: everything falls through to default_rate=0.5,
    # which must SAMPLE (not drop) — regression for the fallback that
    # collapsed fractional defaults to 0
    out = stratified_hash_sample(
        docs, key_col="doc_id", stratum_col="lang", rates={}, default_rate=0.5
    )
    n = out.count()
    total = docs.count()
    assert 0 < n < total
    assert abs(n / total - 0.5) < 0.1


def test_append_manifest_merges_without_rescanning(docs, tmp_path):
    """Append must count only ITS new files and merge the previous
    manifest (O(batch) per increment, never O(corpus)) — and the merged
    manifest must be identical to what a full rescan would produce."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import write_training_shards

    spark = docs.sparkSession
    out = str(tmp_path / "shards")
    write_training_shards(
        docs.filter(F.col("doc_id") < 60), out, key_col="doc_id", num_shards=4
    )
    m2 = write_training_shards(
        docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 90)),
        out,
        key_col="doc_id",
        num_shards=4,
        mode="append",
    )
    assert m2["total_rows"] == 90
    # ground truth from an actual full read of the layout
    per_shard = {
        str(r["shard"]): r["n"]
        for r in spark.read.parquet(out)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {s: m["rows"] for s, m in m2["shards"].items()} == per_shard
    # every data file on disk is accounted for exactly once
    on_disk = {
        (sdir.name.split("=", 1)[1], f.name)
        for sdir in Path(out).glob("shard=*")
        for f in sdir.glob("*.parquet")
    }
    in_manifest = {
        (s, f) for s, m in m2["shards"].items() for f in m["files"]
    }
    assert on_disk == in_manifest


def test_compact_shards_bounds_files_and_preserves_rows(docs, tmp_path):
    """Fragmented shards (many tiny appended files) compact into few
    files with identical rows; untouched shards keep their files."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import compact_shards

    spark = docs.sparkSession
    out = str(tmp_path / "shards")
    # 10 appends of 10 docs → ~10 files per shard
    write_training_shards(
        docs.filter(F.col("doc_id") < 10), out, key_col="doc_id", num_shards=2
    )
    for i in range(1, 10):
        write_training_shards(
            docs.filter((F.col("doc_id") >= i * 10) & (F.col("doc_id") < (i + 1) * 10)),
            out,
            key_col="doc_id",
            num_shards=2,
            mode="append",
        )
    before = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    m_before = json.loads((Path(out) / "_manifest.json").read_text())
    assert any(len(m["files"]) > 3 for m in m_before["shards"].values())

    result = compact_shards(spark, out, max_files_per_shard=3)
    assert result["compacted_shards"] == 2
    assert result["files_after"] < result["files_before"]

    m_after = json.loads((Path(out) / "_manifest.json").read_text())
    assert all(len(m["files"]) <= 3 for m in m_after["shards"].values())
    # rows carried over, never recounted — and actually identical
    assert m_after["total_rows"] == m_before["total_rows"]
    after = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert after == before
    # manifest matches disk exactly (old files deleted)
    on_disk = {
        (sdir.name.split("=", 1)[1], f.name)
        for sdir in Path(out).glob("shard=*")
        for f in sdir.glob("*.parquet")
    }
    in_manifest = {
        (s, f) for s, m in m_after["shards"].items() for f in m["files"]
    }
    assert on_disk == in_manifest


def test_corpus_compact_marker_excludes_superseded_files(docs, tmp_path):
    """The compaction marker must NOT list the old files it is about to
    delete — a crash mid-unlink must leave them uncommitted so the next
    repair finishes the job."""
    from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import corpus_compact
    from cdc_historical_warehouse_platform_spark.pipeline.corpus_state import (
        read_marker,
        repair,
        write_marker,
    )

    spark = docs.sparkSession
    out = tmp_path / "corpus"
    write_training_shards(
        docs.filter(F.col("doc_id") < 20), str(out), key_col="doc_id", num_shards=2
    )
    for i in range(1, 6):
        write_training_shards(
            docs.filter((F.col("doc_id") >= i * 20) & (F.col("doc_id") < (i + 1) * 20)),
            str(out),
            key_col="doc_id",
            num_shards=2,
            mode="append",
        )
    write_marker(out, epoch=5)
    result = corpus_compact(spark, str(out), max_files_per_shard=2)
    assert result["compacted_shards"] == 2
    marker = read_marker(out)
    assert marker["epoch"] == 6
    # no ghost files: everything the marker lists exists on disk, and
    # repair on the clean post-compaction state is a no-op
    for rel in marker["files"]["shards"]:
        assert (out / rel).exists()
    assert repair(out)["removed"] == []
    rows = spark.read.parquet(str(out)).count()
    assert rows == 120


def test_compact_skips_shards_already_at_minimal_layout(docs, tmp_path):
    """A shard whose row count NEEDS more than max_files_per_shard
    files must not be rewritten on every run (same layout forever)."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import compact_shards

    out = str(tmp_path / "shards")
    write_training_shards(
        docs.filter(F.col("doc_id") < 100),
        out,
        key_col="doc_id",
        num_shards=1,
        max_records_per_file=10,  # 100 rows -> ~10 files, all necessary
    )
    m = json.loads((Path(out) / "_manifest.json").read_text())
    n_files = len(m["shards"]["0"]["files"])
    assert n_files >= 5
    result = compact_shards(
        spark=docs.sparkSession,
        path=out,
        max_files_per_shard=2,  # below the minimal layout
        max_records_per_file=10,
    )
    assert result["compacted_shards"] == 0  # nothing to gain, skipped


def test_cap_per_source_equals_naive_rank(spark, docs):
    """The two-phase (gate → rank) implementation must equal the naive
    single-phase window rank wherever the gate passes ≥ cap rows — on
    the real corpus AND on a skewed synthetic corpus where one source
    dwarfs the cap (the case the gate exists for)."""
    from pyspark.sql import Window

    from cdc_historical_warehouse_platform_spark.operators.sampling import cap_per_source

    def naive(df, cap):
        draw = F.md5(
            F.concat(F.lit("domain-cap:"), F.col("doc_id").cast("string"))
        )
        w = Window.partitionBy("source").orderBy(
            draw.asc(), F.col("doc_id").asc()
        )
        return (
            df.withColumn("cap_rank", F.row_number().over(w))
            .filter(F.col("cap_rank") <= cap)
            .select("source", "doc_id", "cap_rank")
        )

    for cap in (1, 3, 10):
        got = {
            tuple(r)
            for r in cap_per_source(docs, cap)
            .select("source", "doc_id", "cap_rank")
            .collect()
        }
        want = {tuple(r) for r in naive(docs, cap).collect()}
        assert got == want, f"cap={cap}: two-phase diverged from naive rank"

    # skewed: one hot source with 400 docs, two small ones; gate engages
    # (p = 4*10/400 = 0.1) and must still keep exactly the naive top-10
    rows = [("hot", i) for i in range(400)] + [
        ("small_a", 1000),
        ("small_b", 2000),
        ("small_b", 2001),
    ]
    skewed = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        tuple(r)
        for r in cap_per_source(skewed, 10).select("source", "doc_id", "cap_rank").collect()
    }
    want = {tuple(r) for r in naive(skewed, 10).collect()}
    assert got == want
    per_source = {
        r["source"]: r["n"]
        for r in cap_per_source(skewed, 10)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_source == {"hot": 10, "small_a": 1, "small_b": 2}


def test_cap_per_source_rerun_stable(spark, docs):
    """Same kept set on a re-run over a reshuffled input — the
    determinism a 100 TB restart depends on."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import cap_per_source

    a = {
        tuple(r)
        for r in cap_per_source(docs, 5).select("source", "doc_id").collect()
    }
    b = {
        tuple(r)
        for r in cap_per_source(docs.repartition(13), 5)
        .select("source", "doc_id")
        .collect()
    }
    assert a == b


def test_cap_per_source_null_source_capped_not_dropped(spark):
    """NULL source is one ordinary group (GROUP BY / window-partition
    semantics): it must be CAPPED like any other, never dropped by the
    counts join."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import cap_per_source

    rows = [("a", 1), ("a", 2), (None, 3), (None, 4), (None, 5), ("b", 6)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    kept = cap_per_source(df, 2).select("source", "doc_id").collect()
    by_src: dict = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src[None]) == 2  # capped, not dropped
    assert by_src["a"] == {1, 2} and by_src["b"] == {6}


def test_weighted_sample_wor_budget_determinism_and_weight_bias(spark, docs):
    """r11: Efraimidis–Spirakis fixed-budget sampling — exact k per
    stratum, 1-based contiguous ranks, identical across re-runs (no
    RNG state), zero-weight rows never win a slot, and an
    overwhelmingly heavy doc takes rank 1."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import (
        weighted_sample_wor,
    )

    got = weighted_sample_wor(docs, k=5, weight_col="n_chars", strata_col="source")
    rows = got.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["sample_rank"])
    n_docs_per_src = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, ranks in by_src.items():
        want = min(5, n_docs_per_src[src])
        assert sorted(ranks) == list(range(1, want + 1)), src
    assert set(by_src) == set(n_docs_per_src)

    # restart-stable: a second run keeps the identical sample
    again = weighted_sample_wor(docs, k=5, weight_col="n_chars", strata_col="source")
    key = lambda rs: sorted((r["source"], r["sample_rank"], r["doc_id"]) for r in rs)
    assert key(rows) == key(again.collect())

    # zero/negative weights are excluded; a dominant weight wins rank 1
    df = spark.createDataFrame(
        [(i, "s", 1.0) for i in range(1, 21)]
        + [(99, "s", 1e12), (100, "s", 0.0), (101, "s", -3.0)],
        ["doc_id", "source", "w"],
    )
    top = weighted_sample_wor(df, k=10, weight_col="w", strata_col="source").collect()
    assert len(top) == 10
    ids = {r["doc_id"] for r in top}
    assert 100 not in ids and 101 not in ids
    assert next(r["doc_id"] for r in top if r["sample_rank"] == 1) == 99


def test_weighted_sample_wor_unstratified_no_global_sort(spark):
    """r12 (verdict task #5): strata_col=None must NOT plan an
    unpartitioned row_number window (whole table sorted into one
    partition). The branch routes through orderBy().limit(k) —
    TakeOrderedAndProject, a per-partition heap + k-row merge — plus
    the bounded k×k broadcast rank self-join; the selected set and
    ranks stay IDENTICAL to the window formulation."""
    import math

    from cdc_historical_warehouse_platform_spark.operators.sampling import (
        weighted_sample_wor,
    )

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3), float(1 + (i * 7) % 13)) for i in range(1, 101)]
        + [(200, "s0", 0.0)],
        ["doc_id", "source", "w"],
    )
    got = weighted_sample_wor(df, k=7, weight_col="w", strata_col=None)

    # reference semantics: the E-S key computed independently in Python
    def es(doc_id, w):
        h = hashlib.md5(f"wor-sample:{doc_id}".encode()).hexdigest()[:13]
        u = (int(h, 16) + 1.0) / float(1 << 52)
        return math.log(u) / w

    expect = sorted(
        ((es(i, float(1 + (i * 7) % 13)), i) for i in range(1, 101)),
        key=lambda t: (-t[0], t[1]),
    )[:7]
    want = {doc: rank + 1 for rank, (_, doc) in enumerate(expect)}
    rows = got.collect()
    assert {r["doc_id"]: r["sample_rank"] for r in rows} == want
    assert set(got.columns) == {"doc_id", "source", "w", "sample_rank"}

    # plan pin: no Window node anywhere in the prepared plan, and the
    # top-k subtree (pre-checkpoint) is a TakeOrderedAndProject
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_weighted_sample_wor_branch_equivalence(spark):
    """r12: the two weighted_sample_wor branches implement ONE
    semantics — on a constant stratum column, the stratified window
    path and the stratum-less TakeOrderedAndProject + rank-self-join
    path must select the identical set with identical ranks, for
    several k (including k > n) and weight shapes."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import (
        weighted_sample_wor,
    )

    rows = [
        (i, "all", w)
        for i, w in enumerate(
            [1.0, 1.0, 5.0, 0.5, 100.0, 3.25, 0.0, -1.0, 7.0, 2.0, 2.0, 9.5],
            start=1,
        )
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])

    def key(res):
        return sorted((r["doc_id"], r["sample_rank"]) for r in res.collect())

    for k in (1, 3, 10, 50):
        strat = weighted_sample_wor(df, k=k, weight_col="w", strata_col="grp")
        flat = weighted_sample_wor(df, k=k, weight_col="w", strata_col=None)
        assert key(strat) == key(flat), k


def test_global_shuffle_dense_positions_and_determinism(spark):
    """Every shard's positions are exactly 0..count-1 (dense, no gaps
    — a manifest can address shard[i] directly), the assignment is a
    pure function of (salt, key) (re-run and input-order invariant),
    and a different salt yields a genuinely different permutation."""
    from cdc_historical_warehouse_platform_spark.operators.sampling import global_shuffle

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = global_shuffle(docs, num_shards=8).select("doc_id", "shard", "position")
    rows = out.collect()
    assert len(rows) == docs.count()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.position)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions)))
    # re-run on a reshuffled input: identical assignment
    again = {
        (r.doc_id): (r.shard, r.position)
        for r in global_shuffle(
            docs.orderBy(F.desc("doc_id")), num_shards=8
        ).collect()
    }
    assert {r.doc_id: (r.shard, r.position) for r in rows} == again
    # a new salt is a new epoch permutation (not the identity map)
    other = {
        r.doc_id: (r.shard, r.position)
        for r in global_shuffle(docs, num_shards=8, salt="epoch-2").collect()
    }
    assert other != again
