"""operators/dedup.exact_substring_spans + remove_duplicate_spans —
ExactSubstr dedup (Lee et al. 2021, arXiv:2107.06499).

Pins planted-span detection, island merging across overlapping grams,
the k-boundary (no merge across a gap > k), short-doc safety, the cut
step's token-exact removal, and partitioning invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.dedup import (
    exact_substring_spans,
    remove_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _w(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_planted_cross_doc_span_found_and_merged(spark):
    """A 6-token sequence shared by two docs, k=4: flagged starts are
    positions 1..3 of the shared run in each doc — ONE merged island
    per doc covering exactly the shared tokens."""
    shared = _w("s", 6)
    rows = [
        (1, f"{_w('a', 5)} {shared} {_w('b', 5)}"),
        (2, f"{_w('c', 3)} {shared} {_w('d', 7)}"),
    ]
    spans = exact_substring_spans(_docs(spark, rows), k=4).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_positions"]) for r in spans}
    # doc 1: shared run occupies tokens 6..11 -> flagged starts 6,7,8
    # doc 2: tokens 4..9 -> flagged starts 4,5,6
    assert got == {(1, 6, 11, 3), (2, 4, 9, 3)}


def test_within_doc_repeat_flags(spark):
    """A doc repeating its own 4-token phrase is self-duplicated —
    both occurrences flag (the paper's any-repeat semantics)."""
    phrase = _w("p", 4)
    rows = [(1, f"{phrase} {_w('x', 5)} {phrase}")]
    spans = exact_substring_spans(_docs(spark, rows), k=4).collect()
    got = {(r["span_start"], r["span_end"]) for r in spans}
    assert got == {(1, 4), (10, 13)}


def test_gap_wider_than_k_stays_two_islands(spark):
    """Two shared runs separated by > k unique tokens must NOT merge."""
    s1, s2 = _w("s", 4), _w("t", 4)
    rows = [
        (1, f"{s1} {_w('u', 6)} {s2}"),
        (2, f"{s1} {_w('v', 9)} {s2}"),
    ]
    spans = exact_substring_spans(_docs(spark, rows), k=4).filter(
        F.col("doc_id") == 1
    ).collect()
    assert [(r["span_start"], r["span_end"]) for r in spans] == [(1, 4), (11, 14)]


def test_short_docs_are_safe(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, _w("z", 25))]
    assert exact_substring_spans(_docs(spark, rows), k=20).count() == 0


def test_remove_spans_cuts_exactly_the_flagged_tokens(spark):
    shared = _w("s", 6)
    rows = [
        (1, f"{_w('a', 5)} {shared} {_w('b', 5)}"),
        (2, f"{_w('c', 3)} {shared} {_w('d', 7)}"),
        (3, _w("q", 8)),  # untouched doc passes through byte-identical
    ]
    docs = _docs(spark, rows)
    spans = exact_substring_spans(docs, k=4)
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(docs, spans).collect()
    }
    assert out[1] == f"{_w('a', 5)} {_w('b', 5)}"
    assert out[2] == f"{_w('c', 3)} {_w('d', 7)}"
    assert out[3] == _w("q", 8)


def test_partitioning_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = exact_substring_spans(docs.coalesce(1), k=20).collect()
    b = exact_substring_spans(docs.repartition(16), k=20).collect()
    key = lambda r: (r["doc_id"], r["span_start"])  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[1])
    )
    assert len(a) > 0  # the testdata's planted near-dups produce spans
