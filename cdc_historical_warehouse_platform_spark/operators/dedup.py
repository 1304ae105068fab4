"""Deduplication families for training-data pipelines.

Five tiers, cheapest → most general (north-star requirement;
no analog in the reference, which only dedups change records by key —
scd2_loader.py:512-531 — but the same latest-per-key W1 idea scaled to
content identity):

- **Exact**: md5 fingerprint of normalized text, hash-groupBy. One
  shuffle on a 16-byte key regardless of document size.
- **N-gram Jaccard**: word-shingle overlap — exact, quadratic in the
  worst case; the verification step of the fuzzy tiers.
- **MinHash + LSH**: per-doc signature (min of H hashes over shingles),
  banded into buckets; only same-bucket docs are compared. Linear scan
  + one shuffle on band keys — the 100 TB path.
- **SimHash**: 64-bit weighted-bit signature; near-dups = small
  Hamming distance; banded by 16-bit chunks for candidate generation.
- **Embedding cosine**: semantic near-dup over `array<float>` vectors
  (brute force here; LSH-bucketed variant in operators/similarity.py).

Approximate tiers (MinHash/SimHash signatures) hash with xxhash64 — no
cross-engine parity needed because their *results* are verified against
exact Jaccard, which IS oracle-checkable with pure integer arithmetic.

Scale notes: the shingle self-join (jaccard_pairs) keeps a doc-frequency
cap on shingles — a stop-shingle appearing in every doc would square the
join; at 100 TB run MinHash-LSH first and use jaccard only to verify
candidates (minhash_lsh_pairs does exactly that composition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.pins import pin_corpus_sized
from cdc_historical_warehouse_platform_spark.operators.text import (
    fingerprint,
    ngrams_from_tokens,
    normalize_text,
    tokens,
)

__all__ = [
    "exact_dedup_groups",
    "exact_dedup",
    "jaccard_pairs",
    "containment_pairs",
    "minhash_signature",
    "minhash_band_buckets",
    "minhash_lsh_pairs",
    "incremental_minhash_dedup",
    "connected_components",
    "simhash64",
    "simhash_pairs",
    "simhash64_portable",
    "simhash_pairs_portable",
    "embedding_near_dup_pairs",
    "banded_embedding_near_dup",
    "semdedup",
    "decontaminate",
    "bloom_positions",
    "bloom_prefilter",
    "exact_substring_spans",
    "substring_spans_from_flagged",
    "incremental_exact_substring",
    "remove_duplicate_spans",
]


def _union_all(parts: list[DataFrame]) -> DataFrame:
    """unionByName over a non-empty list (segment-probe results compose
    with it: semi/anti joins distribute over unions of disjoint
    segments)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents:
    fingerprint, member count, canonical (min) id."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one doc per fingerprint (the min id — deterministic)."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def _shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """doc_id → distinct shingle array. Tokenizes behind a projection
    boundary so the split runs once per doc (see ngrams_from_tokens)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("__toks"),
    ).select("doc_id", ngrams_from_tokens(F.col("__toks"), n).alias("sh_set"))


def _shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # explode_outer, NOT explode: InferFiltersFromGenerate adds a
    # `size(arr) > 0` filter under inner explodes, re-inlining the whole
    # shingle expression below the projection boundary and making it
    # O(len²) per doc again (observed 66 s vs 5 s at sf0.1). The outer
    # variant gets no inferred filter; the cheap null-check on the
    # generated column replaces it.
    return (
        _shingle_sets(df, text_col, id_col, n)
        .select("doc_id", F.explode_outer("sh_set").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def _pinned_shingle_stream(
    df: DataFrame, text_col: str, id_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    """The (doc_id, shingle) stream the pair operators consume —
    derived ONCE (r12 optimization round, guide §2.4/§5). Without the
    pins each of a pair operator's consumers (the df-cap counts, the
    per-doc sizes, BOTH self-join sides) re-ran the regex-heavy
    normalize/tokenize/n-gram subtree — the audited jaccard plan
    scanned the corpus 8×. Two lazy pins: the per-doc shingle-set
    arrays (tokenize once; explode per consumer is cheap) and, when
    the stop-shingle cap applies, the capped stream (the df groupBy +
    anti-join runs once instead of once per consumer). Both are
    bounded: sets ≈ the corpus's distinct n-grams per doc, the capped
    stream strictly smaller. Lazy — computed inside the query's own
    action, nothing persists across runs."""
    sets = pin_corpus_sized(_shingle_sets(df, text_col, id_col, n))
    sh = (
        sets.select("doc_id", F.explode_outer("sh_set").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    if max_doc_freq is not None:
        # Broadcast the DROP-list, not the keep-list: shingles with
        # df > cap are the heavy hitters — bounded by corpus_size/cap
        # at any scale — while the keep-list is ~the whole distinct
        # shingle dictionary (corpus-sized at 100 TB; force-
        # broadcasting it was the r4 audit's scale-killer). Anti-join
        # against the small side is the same filter.
        df_counts = sh.groupBy("shingle").agg(F.countDistinct("doc_id").alias("df"))
        sh = pin_corpus_sized(
            sh.join(
                F.broadcast(
                    df_counts.filter(F.col("df") > max_doc_freq).select("shingle")
                ),
                "shingle",
                "left_anti",
            )
        )
    return sh


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard ≥ t).

    jaccard = |A∩B| / (|A|+|B|−|A∩B|) computed from integer counts, so
    the only float op is one division — bit-exact across engines.

    ``max_doc_freq`` drops shingles appearing in more than that many
    docs before the self-join (stop-shingle guard; at scale always set
    it — frequency-capped shingles bound the join output).
    """
    sh = _pinned_shingle_stream(df, text_col, id_col, n, max_doc_freq)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT near-dup pairs (r11): containment
    = |A∩B| / min(|A|,|B|) — the quote/substring-duplication detector
    Jaccard structurally misses (a short doc fully embedded in a long
    one has Jaccard ≈ |A|/|B| → 0 as the host grows, but containment
    1.0). CC-scale pipelines run this as a tier beside Jaccard
    (RefinedWeb/FineWeb-style sub-document dedup).

    Same integer-count discipline as :func:`jaccard_pairs` — the only
    float op is one division, bit-exact across engines — and the same
    stop-shingle ``max_doc_freq`` guard bounds the self-join at scale.
    Output: (doc_a < doc_b, containment ≥ threshold, containment,
    contained_id) where ``contained_id`` is the smaller-set doc (ties
    → lower id): the one a keep-list would drop."""
    sh = _pinned_shingle_stream(df, text_col, id_col, n, max_doc_freq)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least("na", "nb"),
        )
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "contained_id",
            F.when(F.col("na") < F.col("nb"), F.col("doc_a"))
            .when(F.col("nb") < F.col("na"), F.col("doc_b"))
            .otherwise(F.least("doc_a", "doc_b")),
        )
        .select("doc_a", "doc_b", "containment", "contained_id")
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    n-gram with an evaluation/benchmark set (the standard guard against
    test-set leakage into training data; production pipelines use
    n=8–13 — n is a parameter here because the synthetic corpus has a
    tiny vocabulary).

    Returns one row per CONTAMINATED corpus doc:
    ``doc_id, n_contaminated_ngrams, n_ngrams, contamination_frac``.

    Scale shape: the eval set is tiny relative to a 100 TB corpus, so
    its distinct n-gram set is broadcast — the corpus is shingled in a
    single map pass and never shuffled before the per-doc aggregation;
    no self-join, no cartesian anywhere. Shingle arrays are distinct
    per doc (ngrams_from_tokens), so plain counts are distinct counts.
    """
    eval_ngrams = (
        _shingles(eval_df, text_col, id_col, n).select("shingle").distinct()
    )
    # Pin the corpus shingle SETS once (r12 optimization round, guide
    # §2.4): both consumers below (per-doc sizes + the contamination
    # hits) otherwise re-run the regex-heavy tokenize over the whole
    # corpus. The explode per consumer over the pinned arrays is cheap.
    corpus_sets = pin_corpus_sized(_shingle_sets(corpus, text_col, id_col, n))
    corpus_sh = (
        corpus_sets.select("doc_id", F.explode_outer("sh_set").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    sizes = corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        corpus_sh.join(F.broadcast(eval_ngrams), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        hits.join(sizes, "doc_id")
        .withColumn(
            "contamination_frac",
            F.col("n_contaminated_ngrams").cast("double") / F.col("n_ngrams"),
        )
        .select("doc_id", "n_contaminated_ngrams", "n_ngrams", "contamination_frac")
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """Per-doc MinHash signature: element i = MIN(xxhash64(i, s)) over
    shingles s — one explode + one groupBy; the num_hashes aggregates
    fuse into a single codegen'd stage, so a 100 TB corpus signature is
    one linear pass. (xxhash64 is ~10× md5; the LSH result is verified
    against exact Jaccard, so no cross-engine hash parity is needed.)
    """
    sh = _shingles(df, text_col, id_col, n)
    # Hash the shingle STRING once, then derive the num_hashes values by
    # re-hashing the 8-byte long (xxhash64(i, h)): string traversal cost
    # is paid once per shingle instead of num_hashes times — measured
    # 1.48 s → 1.04 s warm at sf0.1 (260K shingles), and the gap widens
    # with shingle length. Stays inside whole-stage codegen; no
    # overflow-prone arithmetic (ANSI mode is on).
    base = sh.withColumn("__h", F.xxhash64("shingle"))
    # one F.expr (one py4j round trip) per aggregate instead of the
    # 4-5 a composed Column costs: the 64-wide agg list is otherwise
    # pure DRIVER-side construction latency — measured ~0.85 s per
    # warm minhash_band_buckets call before any action ran, i.e. the
    # single largest fixed cost of an incremental corpus append
    aggs = [
        F.expr(f"min(xxhash64({i}, __h)) AS mh_{i}") for i in range(num_hashes)
    ]
    return base.groupBy("doc_id").agg(*aggs)


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 32,
    rows_per_band: int = 2,
) -> DataFrame:
    """(doc_id, bucket) band-bucket assignments — the persistable LSH
    index: each doc lands in `bands` buckets keyed by the xxhash64 of
    its band's signature rows. ``minhash_lsh_pairs`` self-joins this;
    ``incremental_minhash_dedup`` joins a NEW batch's buckets against a
    STORED copy, which is what makes corpus-building incremental (the
    existing corpus is never re-signatured)."""
    sig = minhash_signature(df, text_col, id_col, n, bands * rows_per_band)
    # selectExpr strings: the 32 band expressions ship in ONE py4j
    # call each stage (same driver-latency rationale as the signature
    # aggs; values byte-identical to the previous Column composition —
    # pinned by the cross-path bucket-equality test)
    band_exprs = [
        "concat_ws(':', '{b}', cast(xxhash64({cols}) AS string)) AS band_{b}".format(
            b=b,
            cols=", ".join(
                f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    ]
    banded = sig.selectExpr("doc_id", *band_exprs)
    return banded.selectExpr(
        "doc_id",
        "explode(array({})) AS bucket".format(
            ", ".join(f"band_{b}" for b in range(bands))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 32,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash → banded LSH buckets → candidate pairs → exact-Jaccard
    verification. The full scalable dedup composition:

    - candidate generation is one shuffle on (band, bucket-hash);
    - verification joins only candidates, never all pairs;
    - miss probability per true pair = (1 − j^r)^b — with b=32, r=2,
      j≥0.7 that is < 1e-8.
    """
    buckets = minhash_band_buckets(df, text_col, id_col, n, bands, rows_per_band)
    a = buckets.select(F.col("doc_id").alias("doc_a"), "bucket")
    b2 = buckets.select(F.col("doc_id").alias("doc_b"), "bucket")
    candidates = (
        a.join(b2, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        # Materialize the (small) candidate-pair table: it feeds three
        # branches below (two semi-join sides + the verify join), and
        # without truncation each branch would re-run the full
        # signature+banding pipeline over the corpus (observed: 12
        # FileScans, 0 ReusedExchange). Two corpus passes total —
        # signature, then candidate-only verify — is the 100 TB shape.
        # LAZY (r13 optimization round): the eager form dispatched one
        # driver-synchronous job per call before the consumer's action;
        # the lazy pin truncates the plan identically and the RDD
        # persists on first computation inside the consumer's own job,
        # so all three branches still derive from ONE materialization
        # (same job-fusion rationale as the r12 BPE checkpoint change).
        .localCheckpoint(eager=False)
    )
    # Verify ONLY candidates (never all co-shingle pairs — that would be
    # the quadratic cost LSH exists to avoid): join each side's shingle
    # set and compute exact Jaccard with JVM array ops. Tokenize only
    # docs that appear in a candidate pair (semi-join first): candidates
    # are sparse, so re-shingling the full corpus for the verify pass
    # would re-pay the dominant map cost for rows that can't match.
    cand_ids = (
        candidates.select(F.col("doc_a").alias("__cand_id"))
        .union(candidates.select(F.col("doc_b").alias("__cand_id")))
        .distinct()
    )
    needed = df.join(cand_ids, F.col(id_col) == F.col("__cand_id"), "semi")
    # Pin the candidate shingle sets ONCE (r12 optimization round,
    # guide §2.4): they feed BOTH join sides (sa and sb) below, and
    # without the boundary each side re-runs the corpus scan + the
    # semi-join + the shingle-set aggregation. Bounded by the
    # candidate-pair doc set, never the corpus, so the checkpoint is
    # small at any scale — and it removes one full corpus scan from
    # every LSH-verify consumer (this row, corpus_keep_decisions, and
    # the corpus builds).
    sets = _shingle_sets(needed, text_col, id_col, n).localCheckpoint(eager=False)
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected near-dup pair graph:
    every node labeled with the MIN doc id reachable from it — the
    canonicalization step that resolves TRANSITIVE duplicate chains
    (a~b, b~c ⇒ one canonical a), which pairwise keep-lists can't.

    Min-label propagation: each round joins labels across edges and
    takes the elementwise min; converges once no label changes.
    Rounds = graph diameter; near-dup clusters are shallow (dups of a
    common source), so this is small in practice — `max_iter` guards
    pathological chains. Per round: one shuffle join + one groupBy,
    with `localCheckpoint` truncating lineage so the plan doesn't grow
    3^n across iterations (the known Catalyst trap). The driver-side
    convergence check reads one count per round, never row data.

    Returns (doc_id, component_id) for every node that appears in a
    pair; singletons are by definition their own component and are
    left to the caller (joining them in would shuffle the full corpus
    for rows whose answer is the identity).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_labels = edges.join(
            labels, edges["v"] == labels["node"]
        ).select(F.col("u").alias("node"), "label")
        new_labels = (
            neighbor_labels.union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc: token hashed to 64 bits (xxhash64); each
    bit votes ±1 weighted by term frequency; signature bit = sign of
    the vote. One explode + one groupBy; the 64 bit-votes are fused
    into a single aggregate stage by codegen."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).withColumn("h", F.xxhash64("token"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v_{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        # bit literal computed driver-side; bit 63 wraps to long min — fine,
        # the signature is a bit pattern, not an ordinal
        bit = (1 << b) if b < 63 else -(1 << 63)
        sig = sig + F.when(F.col(f"v_{b}") > 0, F.lit(bit).cast("long")).otherwise(0)
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k, banded: split the
    64-bit signature into 4 × 16-bit chunks — any pair within Hamming
    ≤ 3 must agree on ≥1 chunk (pigeonhole), so the join is on chunk
    values, never all-pairs.

    The signature frame is pinned once (r12 optimization round, guide
    §2.4): both join sides consume it, and without the pin each side
    re-ran the tokenize + 64-wide vote aggregation. (doc_id, simhash)
    is two scalars per doc — far smaller than the corpus it
    summarizes. Lazy: computes inside the query's own action."""
    sig = simhash64(df, text_col, id_col).localCheckpoint(eager=False)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(c)),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .cast("string"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("chunk"),
    )
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "chunk"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "chunk"
    )
    return (
        a.join(b, "chunk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _md5_word32(col: Column, pos: int) -> Column:
    """Unsigned 32-bit word from md5 hex chars [pos, pos+8) — the
    cross-engine hash primitive: Spark's md5/conv, DuckDB's
    ``('0x' || substr(md5(x), pos, 8))::BIGINT`` and Python's hashlib
    all yield the same value for the same UTF-8 input."""
    return F.conv(F.substring(F.md5(col), pos, 8), 16, 10).cast("long")


def simhash64_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash-64 with the token hash drawn from md5 instead of
    xxhash64, carried as two 32-bit words (``sig_hi``/``sig_lo``) so
    every intermediate stays inside signed-64 range in any engine.

    Same algorithm as :func:`simhash64` — per-bit ±1 term-frequency
    votes, signature bit = sign of the vote — but every primitive
    (md5, substring, hex→int, shift, mask) exists in both Spark and
    DuckDB, so the whole SimHash tier gains a hash-exact oracle twin
    (plans/datapipe_queries.SQL_SIMHASH). xxhash64 stays the
    production fast path (~10× cheaper per token); recall parity of
    the two variants is pinned in tests/test_datapipe.py."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).select(
        "doc_id",
        _md5_word32(F.col("token"), 1).alias("w_hi"),
        _md5_word32(F.col("token"), 9).alias("w_lo"),
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"w_{w}"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v_{w}_{b}")
            for w in ("hi", "lo")
            for b in range(32)
        ]
    )

    def word_sig(w: str) -> Column:
        sig = F.lit(0).cast("long")
        for b in range(32):
            sig = sig + F.when(
                F.col(f"v_{w}_{b}") > 0, F.lit(1 << b).cast("long")
            ).otherwise(0)
        return sig

    return votes.select(
        "doc_id", word_sig("hi").alias("sig_hi"), word_sig("lo").alias("sig_lo")
    )


def simhash_pairs_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs from the portable SimHash: the same 4 × 16-bit
    pigeonhole banding and Hamming ≤ k verify as :func:`simhash_pairs`,
    over the split-word signature. Output schema is identical
    (doc_a, doc_b, hamming).

    Signature pinned once — same rationale as :func:`simhash_pairs`."""
    sig = simhash64_portable(df, text_col, id_col).localCheckpoint(eager=False)
    chunk_exprs = [
        F.concat_ws(
            ":", F.lit("0"), F.col("sig_hi").bitwiseAND(F.lit(0xFFFF)).cast("string")
        ),
        F.concat_ws(":", F.lit("1"), F.shiftright(F.col("sig_hi"), 16).cast("string")),
        F.concat_ws(
            ":", F.lit("2"), F.col("sig_lo").bitwiseAND(F.lit(0xFFFF)).cast("string")
        ),
        F.concat_ws(":", F.lit("3"), F.shiftright(F.col("sig_lo"), 16).cast("string")),
    ]
    chunks = sig.select(
        "doc_id", "sig_hi", "sig_lo", F.explode(F.array(*chunk_exprs)).alias("chunk")
    )
    a = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig_hi").alias("hi_a"),
        F.col("sig_lo").alias("lo_a"),
        "chunk",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig_hi").alias("hi_b"),
        F.col("sig_lo").alias("lo_b"),
        "chunk",
    )
    return (
        a.join(b, "chunk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
            + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _tune_banding(
    threshold: float,
    miss_target: float = 1e-9,
    max_planes: int = 512,
    n_hint: int | None = None,
) -> tuple[int, int]:
    """Pick (rows_per_band, bands) for random-hyperplane LSH.

    Per-bit agreement for a pair at cosine t is p = 1 − arccos(t)/π
    (Goemans–Williamson). A pair at the threshold is missed by one band
    w.p. 1 − p^r and by all B bands w.p. (1 − p^r)^B; B is sized so
    that model miss ≤ ``miss_target``. Among feasible (r, B) we pick
    the one minimizing expected candidate volume B·(1/2)^r under the
    orthogonal-background model (random pairs agree per bit w.p. 1/2).

    ``n_hint`` is the 100 TB lever: expected RANDOM-pair candidates are
    B·n²/2·2^−r — quadratic in corpus size at fixed r, so the r that is
    fine at 100K vectors drowns the verify step at 100M. Given the
    corpus size, (r, B) additionally honors
    E[random candidates] ≤ 20·n (a linear candidate budget), trading a
    wider signature for a collision rate that stays flat as the corpus
    grows. Without a hint, sizing depends only on the threshold
    (backward-compatible).

    Everything is deterministic (planes are xxhash64-derived), so the
    model only guides sizing — actual recall is verified empirically
    against the exact-pairs oracle in tests.
    """
    import math

    if n_hint is not None:
        # the candidate budget needs wider signatures than the
        # threshold-only default — signature cost is linear in planes,
        # candidate cost quadratic in n, so spending planes is cheap
        max_planes = max(max_planes, 4096)
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    best: tuple[float, int, int] | None = None
    fallback: tuple[float, int, int] | None = None  # ignores the budget
    for r in range(1, 65):
        pr = p**r
        if pr < 1e-12:
            break
        if pr >= 1.0:
            # threshold 1.0: every band matches a true pair exactly —
            # one band has zero model miss (log(1-pr) would blow up)
            bands = 1
        else:
            bands = max(1, math.ceil(math.log(miss_target) / math.log(1.0 - pr)))
        if r * bands > max_planes:
            continue
        cost = bands * (0.5**r)
        if fallback is None or cost < fallback[0]:
            fallback = (cost, r, bands)
        if n_hint is not None and n_hint > 1:
            exp_cand = bands * (n_hint * (n_hint - 1) / 2) * (0.5**r)
            if exp_cand > 20.0 * n_hint:
                continue
            # budget satisfied → signature work (planes, linear in n)
            # is now the marginal cost: take the NARROWEST signature
            # that stays inside the budget
            key = float(r * bands)
        else:
            key = cost
        if best is None or key < best[0]:
            best = (key, r, bands)
    if best is None:
        best = fallback  # budget unreachable: best collision rate we can buy
    if best is None:  # extreme threshold: fall back to one wide band
        return 1, max_planes
    return best[1], best[2]


def banded_embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    rows_per_band: int | None = None,
    bands: int | None = None,
    signature: str = "expr",
    n_hint: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane-LSH
    candidates + exact cosine verification — the bucketed counterpart
    of :func:`embedding_near_dup_pairs` (same output, no cross join).

    Composition mirrors ``minhash_lsh_pairs``: signature pass (one
    projection per plane, fused into a single array expression) →
    posexplode band buckets → equi-join on (band, bucket) → dedup
    candidate pairs → exact cosine ≥ t filter. The join is a hash/
    sort-merge equi-join whose partitions are bounded by bucket size —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere, so no
    single-node O(n) broadcast at 100 TB.

    Honest scale note: pruning power depends on the Hamming gap
    p(t) − 1/2. At production near-dup thresholds (t ≥ 0.95, p ≥ 0.9)
    the auto-tuned banding prunes the candidate set by ~20× and more;
    at loose thresholds (t ≈ 0.4, p ≈ 0.63) no LSH scheme can prune a
    dense 64-d corpus (candidates ≈ all pairs ×B·2^−r) — there the
    exact tier (:func:`embedding_near_dup_pairs`) is the honest choice.
    ``_tune_banding`` sizes (r, B) for model miss ≤ 1e−9 for a pair at
    exactly the threshold (the miss model is a guide — planes are
    uniform xxhash64-derived weights, not Gaussian); planes are
    deterministic, so recall is reproducible run-to-run, and
    tests/test_datapipe.py pins banded ≡ brute-force output on corpora
    with planted near-dups.
    """
    from cdc_historical_warehouse_platform_spark.operators.similarity import (
        _plane_weight_matrix,
        cosine,
        hyperplane_bits_arrow,
    )

    if rows_per_band is None or bands is None:
        rows_per_band, bands = _tune_banding(threshold, n_hint=n_hint)
    n_planes = rows_per_band * bands

    vec = F.col(vec_col)
    # Plane weights are row-invariant: inline them as ONE nested-array
    # literal (n_planes × dim doubles, bit-identical to the in-row
    # xxhash64 expression via _plane_weight_matrix) instead of
    # evaluating n_planes × dim hash calls per row — at t=0.99 that is
    # 512 × 64 = 32K xxhash64 per vector, the dominant cost of the
    # whole operator. Projections read the first min(dim, size(vec))
    # components, so ``dim`` MUST cover the embedding dimensionality —
    # silently truncating a 768-d corpus to 64 components would break
    # the (r, B) miss model and lose recall with no error. When not
    # given, it is derived from the corpus's first vector (one 1-row
    # job at plan build, the ivf_centroids pattern).
    if dim is None:
        first = emb.select(F.size(vec).alias("n")).filter(F.col("n") > 0).limit(1).collect()
        dim = first[0]["n"] if first else 64
    weights = F.lit(_plane_weight_matrix(n_planes, dim))
    wlen = F.least(F.lit(dim), F.size(vec))
    head = F.slice(vec, F.lit(1), wlen)

    def bit(p: Column) -> Column:
        # sign of <v, w_p> — each plane evaluated exactly once per row
        pw = F.slice(F.element_at(weights, p + 1), F.lit(1), wlen)
        return (
            F.aggregate(
                F.zip_with(head, pw, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("int")

    # Bucket keys as ONE fused expression, each band hashing its own r
    # freshly-computed bits. Deliberately NOT "signature array column +
    # per-band slice": CollapseProject inlines a single-referenced array
    # alias into the band transform, re-evaluating all B*r planes once
    # PER BAND (observed: >270 s vs ~10 s at 500 rows). Computing each
    # plane inside exactly one band keeps total work at B*r projections.
    buckets = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            b,
            F.transform(
                F.sequence(b * rows_per_band, (b + 1) * rows_per_band - 1),
                bit,
            ),
        ),
    )
    # Band-explode IDS ONLY: the exploded relation carries (id, band,
    # bucket) — three scalars — so the B× row duplication never
    # replicates the embedding vectors, and the candidate dedup
    # shuffles bare id pairs instead of pairs of 64-double arrays.
    # Vectors re-enter via two hash equi-joins on the (small,
    # post-prune) candidate set for the exact cosine verify.
    if signature == "arrow":
        # BLAS path: one Arrow matmul computes every bit, then the
        # band hashing stays JVM-side over bit slices — xxhash64 of
        # the same int arrays the expr path hashes, so buckets agree
        # except at float-reorder distance of a zero projection
        # (absorbed by the exact verify; see hyperplane_bits_arrow).
        bits = hyperplane_bits_arrow(emb, id_col, vec_col, n_planes, dim)
        arrow_buckets = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(
                b,
                F.slice(F.col("__bits"), b * rows_per_band + 1, rows_per_band),
            ),
        )
        sig = bits.select("id", arrow_buckets.alias("__buckets"))
    else:
        sig = emb.select(F.col(id_col).alias("id"), buckets.alias("__buckets"))
    # Pin the banded keys once (r12 optimization round, guide §2.4):
    # both sides of the candidate equi-join consume this frame, and
    # without the pin each side re-runs the full signature pass —
    # B·r plane projections per vector, the operator's dominant cost,
    # paid twice. The pinned frame is (id, band, bucket) — three
    # scalars × B rows per vector, never the embedding payload. Lazy:
    # computes inside the query's own action.
    banded = (
        sig.select("id", F.posexplode_outer("__buckets").alias("band", "bucket"))
        .filter(F.col("bucket").isNotNull())
        .localCheckpoint(eager=False)
    )
    cand = (
        banded.select(F.col("id").alias("id_a"), "band", "bucket")
        .join(
            banded.select(F.col("id").alias("id_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = emb.select(F.col(id_col).alias("id"), vec.alias("v"))
    return (
        cand.join(
            vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
        )
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Semantic near-dup pairs: cosine ≥ t over all (a < b) pairs.
    Brute force (exact, the verification tier); for corpus-scale
    candidate generation use similarity.lsh_bucket_ann's hyperplane
    buckets and verify with this on candidates only."""
    from cdc_historical_warehouse_platform_spark.operators.similarity import cosine

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_lists: int = 16,
    refine: int = 1,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (cluster-then-compare, per the
    public SemDeDup method — Abbas et al. 2023, arXiv:2303.09540):
    coarse-quantize the embedding space, then compute exact cosine
    ONLY within a cluster and drop every vector that has a smaller-id
    in-cluster neighbor above ``threshold``. Returns one row per input
    vector: (id, list_id, keep).

    Scale shape (the whole point of the cluster partition):

    - centroid fit reuses :func:`similarity.ivf_centroids` — driver
      state is bounded by n_lists × dim, never corpus size; pass
      ``centroids`` (e.g. from a persisted sources/ann_index.IVFIndex)
      to skip the inline re-fit entirely;
    - cluster assignment is a map-only literal-centroid expression —
      zero shuffle, vectors never replicated;
    - the pair comparison is ONE equi-join on ``list_id``, so the
      quadratic term is bounded by the largest cluster (O(n²/k) total
      for balanced clusters) instead of the corpus. At 100 TB, scale
      ``n_lists`` with the corpus to hold cluster size constant and
      let AQE's skew-join split any hot cluster.

    Approximation is cluster-boundary-only: a near-dup pair split
    across two clusters is missed (the published method accepts the
    same miss). Identical vectors always co-cluster (same argmax), so
    exact-duplicate recall is 1.0 — pinned, with the pair⊆brute-force
    precision check, in tests/test_datapipe.py.
    """
    from cdc_historical_warehouse_platform_spark.operators.similarity import (
        _nearest_list_expr,
        cosine,
        ivf_centroids,
    )

    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(
            emb, n_lists=n_lists, refine=refine, corpus_id=id_col, corpus_vec=vec_col
        )
    )
    # Pin the assignment pass once (r12 optimization round, guide
    # §2.4): three consumers (both in-cluster join sides + the final
    # keep join) otherwise re-run the nearest-centroid expression —
    # n_lists × dim multiply-adds per vector, the operator's dominant
    # map cost — once each. Lazy; corpus-row-sized (one extra long per
    # vector over the input).
    assigned = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _nearest_list_expr(F.col(vec_col), cents).alias("list_id"),
    ).localCheckpoint(eager=False)
    a = assigned.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "list_id")
    b = assigned.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "list_id")
    dropped = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        assigned.join(dropped, "id", "left")
        .select(
            "id",
            "list_id",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    stored_buckets: DataFrame,
    stored_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 32,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    stored_fps: DataFrame | None = None,
    *,
    fp_segments: list[DataFrame] | None = None,
    bucket_segments: list[DataFrame] | None = None,
    probe_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW document batch against an already-built corpus using
    its persisted LSH index — the CDC idea applied to corpus building:
    each incremental load touches only the new batch plus the candidate
    rows it collides with; the existing corpus is NEVER re-signatured.

    ``stored_buckets`` is the persisted output of
    :func:`minhash_band_buckets` over the kept corpus (e.g. in a
    VersionedTable); ``stored_docs`` holds the kept documents' text
    (fetched only for verification candidates). Returns
    ``(kept_new_docs, kept_new_buckets)`` — append the second to the
    store to complete the increment.

    A new doc is dropped if it exact-Jaccard-matches (≥ threshold) a
    stored doc OR a smaller-id doc within its own batch (greedy batch
    semantics: near-dup is not transitive at a threshold, so, like any
    single-pass dedup, chains crossing the batch boundary resolve
    greedily).

    Scale shape: signature/banding is one linear pass over the NEW
    batch only; the cross join against the store is a hash equi-join
    on bucket whose build side is the (small) new-batch bucket set;
    verification tokenizes candidate docs only (semi-join first, both
    corpora). Store growth is `bands` rows per kept doc — the same
    16-byte-per-key regime as the streaming dedup state.

    Exact-fingerprint tier (runs FIRST, like the full build's
    quality → exact → near-dup order): docs with fewer than ``n``
    tokens have an empty shingle set, so they get no LSH buckets and
    the Jaccard tier can never drop their exact duplicates (union=0 →
    null jaccard). The md5-of-normalized-text tier catches them — and
    every other exact duplicate — against the store and within the
    batch (min-id wins). ``stored_fps`` is the persisted fingerprint
    column of the kept corpus (corpus-append's ``_fp_index``); when
    None it is derived from ``stored_docs`` (one extra pass — fine
    for tests, pass the index in production). The store probe is a
    broadcast semi-join against the new batch's (tiny, distinct)
    fingerprint set: the fp index is scanned one 16-byte column wide
    and never shuffled.

    Bulk-append probes (r8, the same ceiling-removal as the
    incremental-ExactSubstr tier): the default broadcast probes cap at
    the broadcast budget — roughly one 16-byte row per BATCH doc (fp)
    and ``bands`` rows per batch doc (buckets), comfortable for CDC
    appends, not for a 100M-doc bulk load. Pass the stores as BUCKETED
    segment scans (``fp_segments`` clustered on ``fp``,
    ``bucket_segments`` clustered on ``bucket`` — see
    :class:`~cdc_historical_warehouse_platform_spark.sources.tables.
    BucketedSegmentTable`) plus ``probe_partitions`` = the stores'
    bucket count, and the probes run co-partitioned: the batch side is
    repartitioned once per key to the stores' layout and the store
    scans join Exchange-free — no broadcast ceiling, store never
    re-shuffled. The candidate TEXT fetch stays an ids-semi-join
    (candidates are LSH-collision-bounded, orders of magnitude below
    the batch at sane band/row parameters).
    """
    # NULL text → NULL fingerprint: excluded from the tier entirely
    # (two unknown texts are not evidence of duplication; NULLs would
    # otherwise co-partition in the intra-batch window and drop
    # distinct docs). Empty-NORMALIZED texts (e.g. pure punctuation)
    # share a real md5('') fingerprint and DO dedup — exact_dedup and
    # the full build's keep-decision tier group them the same way.
    fp_new = (
        new_docs.select(
            F.col(id_col).alias("__fid"), fingerprint(F.col(text_col)).alias("fp")
        )
        .filter(F.col("fp").isNotNull())
        # consumed three times below (store probe's broadcast build,
        # store-hit anti, intra-batch window) — the lazy barrier keeps
        # normalize+md5 from running once per consumer. Two narrow
        # columns, batch-sized.
        .localCheckpoint(eager=False)
    )
    if fp_segments is not None:
        # co-partitioned bulk probe: one explicit batch-side Exchange
        # aligned to the fp store's bucket layout; the store segments
        # join Exchange-free and hit_fps stays partition-aligned for
        # the drop join
        fp_probe = fp_new.select("fp")
        if probe_partitions:
            fp_probe = fp_probe.repartition(probe_partitions, "fp")
        fp_probe = fp_probe.distinct()
        hit_fps = _union_all(
            [s.select("fp").join(fp_probe, "fp", "left_semi") for s in fp_segments]
        )
        drop_store = fp_new.join(hit_fps, "fp", "left_semi").select("__fid")
    else:
        if stored_fps is None:
            stored_fps = stored_docs.select(
                fingerprint(F.col(text_col)).alias("fp")
            )
        hit_fps = stored_fps.select("fp").join(
            F.broadcast(fp_new.select("fp").distinct()), "fp", "left_semi"
        )
        drop_store = fp_new.join(
            F.broadcast(hit_fps), "fp", "left_semi"
        ).select("__fid")
    w_fp = Window.partitionBy("fp").orderBy("__fid")
    drop_intra = (
        fp_new.withColumn("__rn", F.row_number().over(w_fp))
        .filter(F.col("__rn") > 1)
        .select("__fid")
    )
    # Materialize the (tiny, ids-only) exact-drop set: it truncates the
    # _fp_index scan out of the returned DataFrames' lineage, so a
    # caller can append to the fp store without its later writes
    # re-planning over a directory that changed mid-job.
    exact_dropped = (
        drop_store.unionByName(drop_intra).distinct().localCheckpoint(eager=True)
    )
    new_docs = new_docs.join(
        exact_dropped.select(F.col("__fid").alias(id_col)), id_col, "anti"
    )

    nb = minhash_band_buckets(
        new_docs, text_col, id_col, n, bands, rows_per_band
    ).localCheckpoint(eager=True)

    if bucket_segments is not None:
        nb_probe = nb.select(F.col("doc_id").alias("new_id"), "bucket")
        if probe_partitions:
            nb_probe = nb_probe.repartition(probe_partitions, "bucket")
        cross = (
            _union_all(
                [
                    nb_probe.join(
                        s.select(F.col("doc_id").alias("old_id"), "bucket"),
                        "bucket",
                    )
                    for s in bucket_segments
                ]
            )
            .select("new_id", "old_id")
            .distinct()
        )
    else:
        cross = (
            nb.select(F.col("doc_id").alias("new_id"), "bucket")
            .join(
                stored_buckets.select(F.col("doc_id").alias("old_id"), "bucket"),
                "bucket",
            )
            .select("new_id", "old_id")
            .distinct()
        )
    intra = (
        nb.select(F.col("doc_id").alias("new_id"), "bucket")
        .join(nb.select(F.col("doc_id").alias("old_id"), "bucket"), "bucket")
        .filter(F.col("old_id") < F.col("new_id"))
        .select("new_id", "old_id")
        .distinct()
    )
    candidates = cross.unionByName(intra).distinct().localCheckpoint(eager=True)

    new_ids = candidates.select(F.col("new_id").alias("__id")).distinct()
    old_ids = candidates.select(F.col("old_id").alias("__id")).distinct()
    new_sets = _shingle_sets(
        new_docs.join(new_ids, F.col(id_col) == F.col("__id"), "semi"),
        text_col, id_col, n,
    )
    old_sets = _shingle_sets(
        stored_docs.unionByName(new_docs)
        .join(old_ids, F.col(id_col) == F.col("__id"), "semi"),
        text_col, id_col, n,
    )
    inter = F.size(F.array_intersect(F.col("sh_new"), F.col("sh_old")))
    union = F.size(F.col("sh_new")) + F.size(F.col("sh_old")) - inter
    dropped = (
        candidates.join(
            new_sets.select(F.col("doc_id").alias("new_id"), F.col("sh_set").alias("sh_new")),
            "new_id",
        )
        .join(
            old_sets.select(F.col("doc_id").alias("old_id"), F.col("sh_set").alias("sh_old")),
            "old_id",
        )
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
        # Materialize the near-dup drop set (ids only): the expensive
        # candidate-verify subtree — and its scans of the stored bucket
        # and document state — runs ONCE here instead of once per
        # consumer of kept/kept_buckets (measured 12.5 s → 7.5 s for a
        # full sf0.1 append cycle). With nb checkpointed above, the
        # returned DataFrames' lineage is now just the new batch plus
        # small checkpointed sets — no stored-state directory appears,
        # so callers may append to the store before consuming them.
        .localCheckpoint(eager=True)
    )
    kept = new_docs.join(dropped, id_col, "anti")
    kept_buckets = nb.join(
        dropped.select(F.col(id_col).alias("doc_id")), "doc_id", "anti"
    )
    return kept, kept_buckets


def exact_substring_spans(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2021, arXiv:2107.06499): every
    k-token span whose token sequence occurs MORE THAN ONCE anywhere in
    the corpus (across docs or repeated within one), with overlapping
    flagged spans merged per document.

    Returns (id_col, span_start, span_end, n_positions): 1-based token
    positions, span covers tokens [span_start, span_end] inclusive,
    n_positions = flagged k-gram starts merged into the span.

    Spark shape instead of the paper's suffix array: the k-gram stream
    (id, pos, md5-of-k-tokens) is built map-only with JVM HOFs
    (transform over sequence + slice — no per-token explode of the
    corpus), duplicated grams are flagged by ONE count window
    partitioned by the hash, and the span merge is the gaps-and-islands
    lag trick partitioned by doc — every stage shuffles hashes or
    integers, never text. The window (not a groupBy + semi-join-back)
    is a measured choice: the gram build dominates, and the semi-join
    variant re-derives it for the probe side — 3.7 s vs 2.0 s warm at
    sf0.1. Both shapes key the shuffle on the gram hash, so a
    boilerplate gram duplicated millions of times skews one partition
    equally either way; the count window streams it without
    buffering. At 100 TB the gram shuffle is the method's inherent
    cost — banding it down is what the MinHash tier is for.
    """
    grams = _gram_stream(docs, k, id_col, text_col)
    flagged = (
        grams.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("n") > 1)
        .select(id_col, "pos")
    )
    return substring_spans_from_flagged(flagged, k, id_col=id_col)


def _gram_stream(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """The (id, pos, g) k-gram stream — map-only JVM HOFs, the corpus
    is never token-exploded (shared by the full and incremental
    ExactSubstr paths so the two can never hash differently)."""
    toks = F.split(F.col(text_col), " ")
    grams_arr = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - k + 1),
            lambda p: F.md5(F.array_join(F.slice(toks, p, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col), F.posexplode(grams_arr).alias("pos0", "g")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "g")


def substring_spans_from_flagged(
    flagged: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Gaps-and-islands merge of flagged k-gram start positions into
    (span_start, span_end, n_positions) per doc — the read-time half of
    ExactSubstr, doc-partitioned lag window over the (small) flagged
    set only."""
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = flagged.withColumn("prev", F.lag("pos").over(w)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + k), 1
            ).otherwise(0)
        ).over(w),
    )
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_positions"),
        )
        .select(id_col, "span_start", "span_end", "n_positions")
        .orderBy(id_col, "span_start")
    )


def incremental_exact_substring(
    new_docs: DataFrame,
    stored_unique: DataFrame | None,
    stored_dup_hashes: DataFrame | None,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    unique_segments: list[DataFrame] | None = None,
    dup_segments: list[DataFrame] | None = None,
    broadcast_probe: bool = True,
    probe_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ExactSubstr increment: flag every duplicated k-gram
    introduced by a NEW batch without re-scanning stored text — the
    CDC idea the LSH/fingerprint tiers already use
    (:func:`incremental_minhash_dedup`), applied to the k-gram index.

    Persisted state (LSM-style, append-only between compactions):

    - ``stored_unique``      — (id, pos, g): every gram occurrence
      that was globally UNIQUE when admitted (the frontier). Rows
      whose hash later duplicated are logically dead but never
      rewritten in place (compaction drops them).
    - ``stored_dup_hashes``  — (g): every hash known duplicated.

    A new occurrence is flagged when its hash (a) repeats within the
    batch, (b) is already in ``stored_dup_hashes``, or (c) matches a
    LIVE frontier row — in which case that OLD occurrence crosses the
    1→2 threshold and is flagged too (exactly once: the hash then
    moves to the dup set, and dead frontier rows are masked by the
    anti-join below). Returns append deltas
    ``(flagged_adds, dup_hash_adds, unique_adds)`` — flagged_adds is
    (id, pos) over BOTH old and new docs; feed the accumulated flagged
    store to :func:`substring_spans_from_flagged` for spans identical
    to a from-scratch :func:`exact_substring_spans` over the union
    corpus (rebuild-equivalence is pytest- and oracle-pinned).

    Scale shape — two probe modes, both O(batch) shuffle work:

    - ``broadcast_probe=True`` (default, CDC-sized appends): the
      stored tables are SCANNED once but never shuffled — the probe
      side is the batch's distinct hash set, broadcast. Ceiling: that
      set must fit the broadcast budget.
    - ``broadcast_probe=False`` (bulk appends): pass the stores as
      ``unique_segments`` / ``dup_segments`` — lists of BUCKETED scans
      (:class:`~cdc_historical_warehouse_platform_spark.sources.tables.
      BucketedSegmentTable.segments`, bucketed on ``g``) and set
      ``probe_partitions`` to the store's bucket count. Each segment
      probe is an SMJ where the segment side satisfies
      HashPartitioning from its file layout and the probe side is
      explicitly repartitioned to the matching (g, num_buckets) —
      EnsureRequirements then adds NO store-side Exchange at any
      bucket-count/shuffle-partition combination. The only Exchanges
      in the plan are on batch-derived sides; no broadcast ceiling,
      store never re-shuffled. (Semi/anti joins distribute over the
      union of segments because segments are disjoint by the append
      protocol; the one probe exchange is reused across segments.)

    When segment lists are given they replace ``stored_unique`` /
    ``stored_dup_hashes`` (pass None). Doc ids must be unique across
    batches (the corpus pipeline's contract). Reference analog: the
    reference re-derives its dedup state per full load
    (scd2_loader.py); the incremental posture is this repo's 100-TB
    extension.
    """
    uniq_src = (
        unique_segments if unique_segments is not None else [stored_unique]
    )
    dup_src = dup_segments if dup_segments is not None else [stored_dup_hashes]
    # probe wrapper: broadcast for small batches, plain (batch-side
    # shuffle only, against bucketed store scans) for bulk ones
    P = F.broadcast if broadcast_probe else (lambda df: df)
    _u = _union_all

    new_grams = _gram_stream(new_docs, k, id_col, text_col).localCheckpoint(
        eager=False
    )
    # eager pin: intra/singles feed flagged/dup/unique deltas, which
    # ExactSubstrIndex.append now writes CONCURRENTLY — without the
    # pin each writer job would re-run this batch-wide count-window
    # shuffle simultaneously (it also materializes the new_grams
    # checkpoint the probe joins share)
    counted = new_grams.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    ).localCheckpoint(eager=True)
    intra = counted.filter(F.col("__n") > 1).select(id_col, "pos", "g")
    singles = counted.filter(F.col("__n") == 1).select(id_col, "pos", "g")
    new_hashes = new_grams.select("g")
    if not broadcast_probe and probe_partitions:
        # pre-align the probe with the stores' bucket layout BEFORE the
        # distinct: the aggregate runs on the already-correct
        # partitioning, so the probe costs exactly one Exchange and the
        # co-partitioned segment joins add none
        new_hashes = new_hashes.repartition(probe_partitions, "g")
    new_hashes = new_hashes.distinct()
    # known-dup hashes touched by this batch: stored scan(s), no store
    # shuffle in either mode; batch-bounded result — eager pin so the
    # three consumers don't re-scan the store
    dup_hits = _u(
        [s.select("g").join(P(new_hashes), "g", "semi") for s in dup_src]
    ).localCheckpoint(eager=True)
    # LIVE frontier rows newly duplicated: one stored-unique scan per
    # segment, no store shuffle; dead rows (hash already dup) masked
    # by the anti
    frontier = (
        _u(
            [
                s.select(id_col, "pos", "g").join(P(new_hashes), "g", "semi")
                for s in uniq_src
            ]
        )
        .join(P(dup_hits), "g", "anti")
        .localCheckpoint(eager=True)
    )
    frontier_hashes = frontier.select("g").distinct()
    flagged_new = (
        intra
        .unionByName(new_grams.join(P(dup_hits), "g", "semi"))
        .unionByName(new_grams.join(P(frontier_hashes), "g", "semi"))
        .select(id_col, "pos")
        .distinct()
    )
    flagged_adds = flagged_new.unionByName(frontier.select(id_col, "pos"))
    dup_hash_adds = (
        intra.select("g")
        .distinct()
        .unionByName(frontier_hashes)
        .distinct()
        .join(P(dup_hits), "g", "anti")
    )
    unique_adds = (
        singles.join(P(dup_hits), "g", "anti")
        .join(P(frontier_hashes), "g", "anti")
    )
    return flagged_adds, dup_hash_adds, unique_adds


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """The cut step: drop every token covered by a flagged span.

    Map-only after ONE equi-join of the (few) spans per doc — the
    token stream is never exploded: the doc's spans arrive as an array
    of (start, end) structs and a positional HOF filter keeps tokens
    outside all of them. Docs with no spans pass through unchanged.
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = F.split(F.col(text_col), " ")
    keep = F.filter(
        toks,
        lambda _t, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
                F.array_join(keep, " ")
            ),
        )
        .drop("__spans")
    )


def bloom_positions(key: Column, m: int, k: int, salt: str = "bloom") -> Column:
    """Array of the ``k`` Bloom bit positions (each in [0, m)) for a
    key: position j = first-8-hex of md5('<salt>-<j>:<key>') mod m.
    md5-derived so the positions are engine-portable (a DuckDB/Trino
    twin computes the identical bits)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit(f"{salt}-{j}:"), key.cast("string"))
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m),
            ).cast("int")
            for j in range(1, k + 1)
        ]
    )


def bloom_prefilter(
    df: DataFrame,
    block_df: DataFrame,
    key_col: str,
    id_col: str | None = None,
    block_key_col: str | None = None,
    m: int = 2048,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom-filter membership prefilter against a blocklist, with
    exact false-positive accounting — the standard trick for skipping
    the full blocklist join on the (vast) majority of a 100 TB corpus
    that cannot possibly match.

    The filter is materialized RELATIONALLY as the distinct set of hot
    bit positions — at most min(k·|blocklist|, m) rows, broadcastable
    at ANY corpus size because m bounds it — rather than a packed
    bitmap: the broadcast-join probe below tests exactly the same bits
    a bitmap test would, engine-neutrally (no UDAF, oracle-checkable).
    A probe key is ``maybe_blocked`` iff ALL k of its positions are
    hot (bool_and over a position left-join — zero Bloom false
    negatives by construction, pinned in pytest). ``blocked`` is the
    exact semi-join answer, computed here for EVERY row so the query
    reports per-row ``false_positive``; in production the exact join
    runs only over the maybe_blocked survivors — the saved shuffle on
    (1 − fill)^k of the corpus is the whole point, and the measured
    false-positive count prices it.

    Returns one row per distinct (id, key) — one per input row when
    ``id_col`` names a unique id: (*ids, key, maybe_blocked, blocked,
    false_positive).
    """
    bkey = block_key_col or key_col
    ids = [id_col] if id_col and id_col != key_col else []
    # Pin the distinct blocklist keys once (r12 optimization round,
    # guide §2.4): the hot-position set AND the exact-membership side
    # both derive from the blocklist, and without the pin each re-ran
    # its derivation (in the registered row: a corpus scan + md5 per
    # consumer). Positions over distinct keys are the same distinct
    # position set as over all rows. Blocklist-sized; lazy.
    block_keys = (
        block_df.select(F.col(bkey).alias(key_col))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hot = (
        block_keys.select(
            F.explode(bloom_positions(F.col(key_col), m, k, salt)).alias("__pos")
        )
        .distinct()
        .withColumn("__hot", F.lit(True))
    )
    probe = df.select(
        *ids,
        F.col(key_col),
        F.explode(bloom_positions(F.col(key_col), m, k, salt)).alias("__pos"),
    )
    maybe = (
        probe.join(F.broadcast(hot), "__pos", "left")
        .groupBy(*ids, key_col)
        .agg(F.bool_and(F.coalesce("__hot", F.lit(False))).alias("maybe_blocked"))
    )
    exact = block_keys.withColumn("__blocked", F.lit(True))
    return (
        maybe.join(exact, key_col, "left")
        .select(
            *ids,
            key_col,
            "maybe_blocked",
            F.coalesce("__blocked", F.lit(False)).alias("blocked"),
            (
                F.col("maybe_blocked")
                & ~F.coalesce("__blocked", F.lit(False))
            ).alias("false_positive"),
        )
    )
