"""Similarity search over embedding columns (`array<float>`).

Three tiers (north-star requirement):

- **Brute-force cosine top-k** — broadcast the query set, one linear
  scan of the corpus, per-query heap via window top-k. Exact; scales
  to any corpus size (the scan parallelizes; no corpus shuffle at all
  when queries are broadcast).
- **LSH-bucketed ANN** — random-hyperplane signatures bucket the
  corpus; queries probe their bucket (+ optional 1-bit flips). The
  corpus is sharded by bucket in one shuffle, then lookups are
  bucket-local — the 100 TB path where a full scan per query batch is
  too slow.
- **IVF ANN** — a coarse k-means quantizer (deterministic seeds + a
  distributed Lloyd step) partitions the corpus into inverted lists;
  queries probe only their closest lists. Centroids are bounded
  (n_lists × dim) and inlined as literals, so index assignment is
  map-only with zero corpus shuffle.

All arithmetic is sequential double folds over the array (deterministic
and bit-exact vs the DuckDB oracle's list_reduce — verified).
Hyperplanes are derived from xxhash64(plane, dim) so the whole index is
reproducible with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "hyperplane_signature",
    "lsh_bucket_ann",
    "ivf_centroids",
    "probed_queries",
    "hyperplane_bits_arrow",
    "ivf_search",
    "ivf_topk",
    "quantize_int8",
    "int_dot",
    "quantize_corpus",
    "sq_topk",
    "sq_ivf_search",
]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    ``broadcast(queries)`` keeps the corpus un-shuffled: each corpus
    partition scores all queries locally; the only exchange is the
    (tiny) per-query candidate set into the window."""
    pairs = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    ).crossJoin(
        F.broadcast(
            queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv"))
        )
    )
    scored = pairs.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _plane_weight(plane: int | Column, d: Column) -> Column:
    """Deterministic pseudo-random weight in [-1, 1): derived from
    xxhash64(plane, dim) — reproducible across runs and clusters."""
    p = plane if isinstance(plane, Column) else F.lit(plane)
    h = F.xxhash64(p, d)
    return (F.pmod(h, F.lit(2000001)) - F.lit(1000000)).cast("double") / F.lit(1000000.0)


# weight matrices keyed by (n_planes, dim): tiny (n_planes × dim
# doubles), computed once per process via a miniature Spark job so the
# values are BIT-IDENTICAL to the in-row _plane_weight expression —
# re-deriving xxhash64 in Python would risk a silent bucket reshuffle
_WEIGHT_CACHE: dict[tuple[int, int], list[list[float]]] = {}


def _plane_weight_matrix(n_planes: int, dim: int) -> list[list[float]]:
    key = (n_planes, dim)
    if key not in _WEIGHT_CACHE:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "hyperplane plane weights are derived by a one-time Spark "
                "job; construct LSH expressions after the SparkSession is "
                "started (and on a thread where it is active)"
            )
        rows = (
            spark.range(n_planes * dim)
            .select(
                (F.col("id") / dim).cast("int").alias("p"),
                F.pmod(F.col("id"), F.lit(dim)).cast("int").alias("i"),
            )
            .select("p", "i", _plane_weight(F.col("p"), F.col("i")).alias("w"))
            .collect()
        )
        mat = [[0.0] * dim for _ in range(n_planes)]
        for r in rows:
            mat[r["p"]][r["i"]] = r["w"]
        _WEIGHT_CACHE[key] = mat
    return _WEIGHT_CACHE[key]


def portable_plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic plane weights in [-1, 1) derived from md5 instead
    of xxhash64: w(p, i) = (int(md5(f"{p}:{i}")[:8], 16) % 2000001
    − 1000000) / 1e6. hashlib.md5 here, Spark's ``md5`` and DuckDB's
    ``md5`` all agree byte-for-byte on ASCII input, so ANY engine —
    including the DuckDB oracle, with no Spark session — can re-derive
    the exact same matrix. Used by the driver-checked ANN query so the
    whole bucketing pipeline has a hash-exact SQL twin; the xxhash64
    matrix (:func:`_plane_weight_matrix`) stays the default elsewhere."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16) % 2000001 - 1000000)
            / 1e6
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_signature(
    vec: Column,
    n_planes: int = 16,
    dim: int = 64,
    weights: list[list[float]] | None = None,
) -> Column:
    """n-bit random-hyperplane signature of a vector (int result).

    The plane weights are row-invariant, so they are inlined as
    literal arrays (one tiny driver-cached job derives them from the
    same xxhash64 expression — identical buckets, but the per-row cost
    drops from n_planes × dim hash evaluations to a zip_with multiply;
    measured 85 s → 23 s for 100K-vector banded near-dup).

    The projection iterates over min(dim, size(vec)) — trusting the
    ``dim`` parameter alone would read past shorter vectors, null every
    projection, zero every signature, and silently collapse the bucket
    join into a full cross product. Empty (size-0) vectors get a NULL
    signature for the same reason — NULL never equi-joins, so empty
    vectors simply drop out of every banding path."""
    if weights is None:
        weights = _plane_weight_matrix(n_planes, dim)
    wlen = F.least(F.lit(dim), F.size(vec))
    head = F.slice(vec, F.lit(1), wlen)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                head,
                F.slice(F.lit(weights[p]), F.lit(1), wlen),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return F.when(F.size(vec) > 0, sig).otherwise(F.lit(None).cast("long"))


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    probes: int = 1,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    weights: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: compare only within hyperplane buckets.

    ``probes`` > 1 additionally probes buckets at Hamming distance 1
    (flipping the lowest ``probes - 1`` signature bits), trading query
    fan-out for recall. ``weights`` overrides the plane matrix (e.g.
    :func:`portable_plane_weights` for the oracle-checkable variant).
    Returns the same schema as cosine_topk."""
    csig = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        hyperplane_signature(F.col(corpus_vec), n_planes, dim, weights).alias("bucket"),
    )
    qsig = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        hyperplane_signature(F.col(query_vec), n_planes, dim, weights).alias("__qsig"),
    )
    probe_sigs = [F.col("__qsig")] + [
        F.col("__qsig").bitwiseXOR(F.lit(1 << b)) for b in range(max(0, probes - 1))
    ]
    probed = qsig.select(
        "query_id", "__qv", F.explode(F.array(*probe_sigs)).alias("bucket")
    )
    scored = (
        csig.join(F.broadcast(probed), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )

def _centroid_literals(cents: list[list[float]]) -> list[Column]:
    """Inline centroids as literal array columns. Bounded by
    n_lists × dim scalars (e.g. 16×64 = 1 KB) — NOT data-sized; this is
    what makes IVF assignment a zero-shuffle map-only expression.
    Each centroid is ONE ArrayType Literal node (F.lit of the list),
    not dim CreateArray children — per-element literals multiply the
    plan size by dim and stall Catalyst/codegen."""
    return [F.lit([float(x) for x in c]) for c in cents]


# Column-expression memo for the per-centroid cosine trees. Building
# the n_lists × (zip_with + aggregate) tree costs hundreds of Py4J
# round-trips (~2 s at n_lists=16 — measured r9), dwarfing the actual
# execution on bulk probes; Column trees are immutable, so the SAME
# expression object is safely reusable across DataFrames and queries.
# Keyed by the centroid VALUES (md5 of the packed doubles), so a
# rebuilt index with different centroids never hits a stale entry.
_EXPR_CACHE: dict[tuple, Column] = {}
_EXPR_CACHE_MAX = 32


def _cents_key(cents: list[list[float]]) -> bytes:
    import hashlib
    import struct as _struct

    h = hashlib.md5()
    for c in cents:
        h.update(_struct.pack(f"<{len(c)}d", *[float(x) for x in c]))
    return h.digest()


def _cached_expr(key: tuple, build) -> Column:
    col = _EXPR_CACHE.get(key)
    if col is None:
        if len(_EXPR_CACHE) >= _EXPR_CACHE_MAX:
            _EXPR_CACHE.clear()
        col = build()
        _EXPR_CACHE[key] = col
    return col


def _nearest_list_expr(vec: Column, cents: list[list[float]]) -> Column:
    """list_id of the max-cosine centroid, fully codegen'd: an
    array_max over per-centroid (cos, -list_id) structs (struct
    comparison is lexicographic, so ties go to the SMALLEST list id).
    Memoized per (centroids, input expression) like the probe
    structs."""
    candidates = _cached_expr(
        ("nearest_list", _cents_key(cents), str(vec)),
        lambda: F.array(
            *[
                F.struct(
                    cosine(vec, lit_c).alias("cos"), F.lit(-i).alias("neg_id")
                )
                for i, lit_c in enumerate(_centroid_literals(cents))
            ]
        ),
    )
    return -F.array_max(candidates)["neg_id"]


def ivf_centroids(
    corpus: DataFrame,
    n_lists: int = 16,
    refine: int = 1,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> list[list[float]]:
    """IVF coarse quantizer: ``n_lists`` centroid vectors (driver-side
    list — bounded by n_lists × dim, never by corpus size).

    Every step is cross-engine portable, so the whole quantizer — and
    therefore IVF assignment, probing, and SemDeDup built on it — has
    a hash-exact DuckDB oracle twin:

    - Seeds are the ``n_lists`` corpus vectors with the smallest
      ``md5(cast(id as string))`` — a deterministic pseudo-random
      sample with no RNG state, re-derivable in any engine (ASCII hex
      compares identically under Spark and DuckDB binary collation).
    - Each ``refine`` round is one distributed Lloyd step: assignment
      is a map-only literal-centroid expression (zero shuffle), and
      the element-wise re-average is one posexplode →
      groupBy(list, pos) aggregate whose map-side combine reduces
      every partition to at most n_lists × dim partial rows before
      the exchange. Values are quantized to integer picos
      (floor(v·1e12), exact IEEE in every engine) and summed exactly
      (DECIMAL(38,0)), so the mean is order-independent AND engine-
      independent — float partial-sum order can never move a
      centroid. (Below ~2^53 pico-units per (list, pos) cell the
      sum→double cast is exact everywhere; beyond that it is still
      order-independent, merely correctly rounded.)
    """
    seed_rows = (
        corpus.orderBy(F.md5(F.col(corpus_id).cast("string")), F.col(corpus_id))
        .limit(n_lists)
        .select(F.col(corpus_vec).alias("c"))
        .collect()
    )
    cents = [[float(x) for x in r["c"]] for r in seed_rows]
    for _ in range(refine):
        assigned = corpus.select(
            _nearest_list_expr(F.col(corpus_vec), cents).alias("list_id"),
            F.col(corpus_vec).alias("v"),
        )
        rows = (
            assigned.select("list_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(
                (
                    F.sum(
                        F.floor(F.col("val").cast("double") * F.lit(1e12))
                        .cast("long")
                        .cast("decimal(38,0)")
                    ).cast("double")
                    / F.lit(1e12)
                    / F.count(F.lit(1))
                ).alias("avg_val")
            )
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in rows:
            by_list.setdefault(r["list_id"], {})[r["pos"]] = r["avg_val"]
        cents = [
            [vals[p] for p in sorted(vals)] if (vals := by_list.get(i)) else cents[i]
            for i in range(len(cents))
        ]
    return cents


def probed_queries(
    queries: DataFrame,
    cents: list[list[float]],
    n_probes: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Per-query probe set: each query exploded to its ``n_probes``
    closest lists by centroid cosine — map-only literal expressions on
    the (small) query side. Columns: query_id, __qv, list_id.

    The per-centroid struct array is memoized per centroid set
    (:data:`_EXPR_CACHE`): repeated probes against the same index skip
    the Py4J-heavy tree construction entirely, with bit-identical
    results (it is literally the same expression object)."""
    probe_structs = _cached_expr(
        ("probe_structs", _cents_key(cents)),
        lambda: F.array(
            *[
                F.struct(
                    cosine(F.col("__qv"), lit_c).alias("cos"),
                    F.lit(-i).alias("neg_id"),
                )
                for i, lit_c in enumerate(_centroid_literals(cents))
            ]
        ),
    )
    return (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
        )
        .withColumn(
            "list_id",
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(probe_structs)), 1, n_probes),
                    lambda s: -s["neg_id"],
                )
            ),
        )
        .select("query_id", "__qv", "list_id")
    )


def ivf_search(
    assigned: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    k: int = 10,
    n_probes: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    probed: DataFrame | None = None,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Search an (already-assigned) IVF corpus: ``assigned`` has
    columns (neighbor_id, __cv, list_id). The probed query set is
    broadcast and scoring touches only corpus rows whose list_id is
    probed. Shared by the inline :func:`ivf_topk` and the persisted
    ``IVFIndex.probe`` path — the latter passes its already-built
    ``probed`` set so the centroid-literal expression tree isn't
    evaluated twice per query batch.

    ``broadcast_probe=False`` is the BULK-query mode (r8): the probe
    set joins shuffled instead of broadcast — no query-batch broadcast
    ceiling. Scale note: the shuffle moves only list-pruned candidate
    rows and the probe set, both proportional to the intrinsic scoring
    work, never the whole index (IVFIndex.probe pushes the probed-list
    IN-filter into the scan before this join)."""
    if probed is None:
        probed = probed_queries(queries, cents, n_probes, query_id, query_vec)
    P = F.broadcast if broadcast_probe else (lambda df: df)
    scored = (
        assigned.join(P(probed), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def sq_ivf_search(
    assigned_q: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    k: int = 10,
    n_probes: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    probed: DataFrame | None = None,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Search an IVF-assigned INT8 corpus (the IVF-SQ composition —
    coarse quantizer for pruning, scalar quantizer for storage, per
    the standard inverted-file + SQ8 design): ``assigned_q`` has
    columns (neighbor_id, __cq, __na, list_id) — int8 vectors and
    precomputed integer self-norms, NO full-precision copy. Probing
    (centroid selection) runs on the full-precision query vector; the
    list-local scoring is one integer fold per candidate, identical
    arithmetic to :func:`sq_topk`. Output schema matches ivf_search
    with ``qcosine`` instead of ``cosine``."""
    if probed is None:
        probed = probed_queries(queries, cents, n_probes, query_id, query_vec)
    P = F.broadcast if broadcast_probe else (lambda df: df)
    pq = probed.select(
        "query_id",
        "list_id",
        quantize_int8(F.col("__qv")).alias("__qq"),
    )
    pq = pq.select(
        "query_id", "list_id", "__qq", int_dot(F.col("__qq"), F.col("__qq")).alias("__nb")
    ).filter(F.col("__nb") > 0)
    scored = (
        # zero-norm corpus rows may be stored (the persisted index keeps
        # them for id-dedup idempotence) — they have no defined cosine,
        # so they drop here, before the division can make NaN
        assigned_q.filter(F.col("__na") > 0)
        .join(P(pq), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                int_dot(F.col("__cq"), F.col("__qq")).cast("double")
                / F.sqrt((F.col("__na") * F.col("__nb")).cast("double"))
            ).alias("qcosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qcosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probes: int = 2,
    refine: int = 1,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k — the brief's second ANN scale path
    ("IVF or LSH-bucketed variant") next to lsh_bucket_ann.

    Index: each corpus vector gets the list_id of its nearest coarse
    centroid — a map-only literal expression, zero corpus shuffle.
    Search: each query probes its ``n_probes`` closest lists, the
    probed query set is broadcast, and scoring touches only corpus
    rows whose list_id is probed (~n_probes/n_lists of the data per
    query batch). Same output schema as cosine_topk.

    One-shot convenience: rebuilds the quantizer inline unless
    ``centroids`` is passed. A probe-many workload should build the
    index ONCE (sources/ann_index.IVFIndex.build) and call
    ``IVFIndex.probe`` — zero corpus passes per query batch beyond the
    probed lists.
    """
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_lists, refine, corpus_id, corpus_vec)
    )
    assigned = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        _nearest_list_expr(F.col(corpus_vec), cents).alias("list_id"),
    )
    return ivf_search(assigned, queries, cents, k, n_probes, query_id, query_vec)


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization:
    ``q[i] = floor(v[i] * 127 / max|v| + 0.5)`` ∈ [-127, 127].

    The memory tier of the ANN stack: an int8 corpus is 4× smaller
    than float32 (8× than float64), so four times more vectors fit in
    executor memory / page cache per scan at 100 TB. Cosine over the
    quantized vectors needs NO dequantization — the per-vector scale
    cancels in the ratio — and the dot/norm sums are exact int64
    arithmetic, so results are bit-identical on any engine that
    reproduces the (IEEE-deterministic) quantization expression.

    A zero vector (max|v| = 0) quantizes to all zeros; downstream
    scoring treats its cosine as undefined and drops it, matching the
    full-precision tiers.
    """
    s = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    # ByteType for real: values are provably in [-127, 127], and a
    # 32-bit cast here would quietly store int8 values at float32
    # width — the whole memory claim of the tier.
    q = F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * F.lit(127.0) / s + F.lit(0.5)).cast(
            "byte"
        ),
    )
    return F.when(s > F.lit(0.0), q).otherwise(
        F.transform(vec, lambda x: F.lit(0).cast("byte"))
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two int arrays (order-independent —
    integer addition is associative, unlike the double folds above)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("bigint") * y.cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def quantize_corpus(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """Build the int8 search corpus ONCE: ``(id, __cq, __na)`` with
    zero-norm rows dropped. Pass the result to :func:`sq_topk` via
    ``quantized=`` for every probe batch after the first.

    ``materialize=True`` (default) puts a ``localCheckpoint`` barrier
    after the WHOLE build — quantized array AND self-norm AND the
    zero-norm filter — so probes scan precomputed (id, int8 array,
    norm) rows and never re-run the interpreted higher-order-function
    folds (a barrier after only the quantize would leave every probe
    re-folding the O(N·dim) norm). The build itself pays the
    quantize expression ~twice (the zero-norm filter pushes into the
    scan and inlines it) — a one-time cost the barrier exists to
    amortize. Measured at 200K×64 / 10 queries: build 3.6 s once,
    then warm probes run ~1.4× FASTER than full-precision brute
    force (1.11 s vs 1.51 s), with the byte reduction showing up
    directly in scan time. In production the quantized corpus is a
    stored table (parquet of int8 arrays) and ``materialize`` is
    irrelevant."""
    qc = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        quantize_int8(F.col(corpus_vec)).alias("__cq"),
    )
    qc = qc.select(
        "neighbor_id", "__cq", int_dot(F.col("__cq"), F.col("__cq")).alias("__na")
    ).filter(F.col("__na") > 0)
    if materialize:
        qc = qc.localCheckpoint(eager=False)
    return qc


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    quantized: DataFrame | None = None,
) -> DataFrame:
    """Top-k by cosine over int8-quantized vectors (scalar
    quantization) — same scan shape as :func:`cosine_topk` (corpus
    un-shuffled, queries broadcast) but the corpus-side arithmetic is
    int64-exact over a 4×-smaller representation. A probe-many
    workload builds the int8 corpus once (:func:`quantize_corpus`)
    and passes it via ``quantized=`` — the probe then scans int8
    only, measured ~2× faster than the full-precision brute scan;
    recall vs the
    full-precision ranking is pinned by pytest, and the ranking itself
    is deterministic: the integer dot/norms are exact, the final
    ``qdot / sqrt(na*nb)`` is one double expression identical across
    engines, ties broken by neighbor id. Composable with the IVF/LSH
    tiers (quantize within lists/buckets) — this operator is the
    flat-scan baseline of the quantized path.
    """
    # Quantize and fold the self-norm ONCE PER ROW, below the join —
    # folding norms after the join would re-run both ~dim-element
    # aggregates per PAIR (measured 5× slower at 200K×10 pairs); the
    # zero-norm filter (0/0 is NaN, whose ordering is not portable
    # across engines) also belongs here, where it prunes rows, not
    # pairs. Per-pair work is exactly one integer fold.
    qc = (
        quantized
        if quantized is not None
        else quantize_corpus(corpus, corpus_id, corpus_vec, materialize=False)
    )
    qq = queries.select(
        F.col(query_id).alias("query_id"),
        quantize_int8(F.col(query_vec)).alias("__qq"),
    )
    qq = qq.select(
        "query_id", "__qq", int_dot(F.col("__qq"), F.col("__qq")).alias("__nb")
    ).filter(F.col("__nb") > 0)
    pairs = qc.crossJoin(F.broadcast(qq)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (
            int_dot(F.col("__cq"), F.col("__qq")).cast("double")
            / F.sqrt((F.col("__na") * F.col("__nb")).cast("double"))
        ).alias("qcosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qcosine")
    )


def hyperplane_bits_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    dim: int = 64,
) -> DataFrame:
    """All plane projections as ONE Arrow-batched BLAS matmul:
    ``sign(V @ W.T)`` per batch instead of n_planes × dim interpreted
    fold steps per row — the vectorized-Pandas-UDF escape hatch for
    the one place the expression path is genuinely compute-bound
    (measured 27 s → ~2 s for 512 planes × 100K × 64-d vectors).

    Weights are the same ``_plane_weight_matrix`` values, so buckets
    match the expression path except when a projection sits within
    float-sum-reordering distance of 0 (BLAS pairwise vs sequential
    fold) — a recall-boundary wobble the exact verify tier absorbs;
    use the expression path when bit-exact bucket reproducibility
    across BLAS builds matters more than speed.

    Returns ``(id, __bits)`` with the id column at its ORIGINAL type
    (casting to long would null string ids and silently empty the
    candidate join); short vectors are zero-padded to ``dim`` (the
    expression path's weight-slice gives the same sums) and
    empty/NULL vectors are dropped (they get NULL signatures there).
    """
    import numpy as np
    from pyspark.sql import types as T

    W = np.asarray(_plane_weight_matrix(n_planes, dim), dtype=np.float64)
    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("__bits", T.ArrayType(T.IntegerType())),
        ]
    )

    def _bits(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows_ids, mats = [], []
            for i, v in zip(pdf["id"], pdf["vec"]):
                if v is None or len(v) == 0:
                    continue
                a = np.zeros(dim, dtype=np.float64)
                head = np.asarray(v[:dim], dtype=np.float64)
                a[: head.size] = head
                rows_ids.append(i)
                mats.append(a)
            if not rows_ids:
                yield pd.DataFrame({"id": [], "__bits": []})
                continue
            proj = np.stack(mats) @ W.T
            bits = (proj > 0).astype(np.int32)
            yield pd.DataFrame({"id": rows_ids, "__bits": list(bits)})

    slim = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return slim.mapInPandas(_bits, schema)
