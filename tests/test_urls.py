"""URL canonicalization (operators/urls.py): the exact-URL dedup tier
of crawl pipelines. Spark chain behavior pinned on hand-built variants;
Spark ↔ DuckDB twin parity pinned on the same inputs (the oracle row
dedup_url_normalized re-pins it hash-exact at sf0.01)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.urls import (
    normalize_url,
    normalize_url_sql,
)

CASES = [
    # (raw, canonical)
    ("http://Example.COM/Path", "http://example.com/Path"),  # host case only
    ("HTTPS://EXAMPLE.com/a", "https://example.com/a"),  # scheme case
    ("http://example.com:80/a", "http://example.com/a"),  # default port
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # non-default kept
    ("https://example.com:80/a", "https://example.com:80/a"),  # mismatched kept
    ("http://www.example.com/a", "http://example.com/a"),  # www
    ("http://example.com/a#frag", "http://example.com/a"),  # fragment
    ("http://example.com/", "http://example.com"),  # bare root slash
    ("http://example.com/a/", "http://example.com/a/"),  # deep slash kept
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&b=1", "http://example.com/a?b=1"),
    ("http://example.com/a?b=1&utm_source=x", "http://example.com/a?b=1"),
    (
        "http://example.com/a?utm_source=x&utm_medium=y&utm_campaign=z",
        "http://example.com/a",
    ),
    ("http://example.com/a?b=1&fbclid=XYZ&c=2", "http://example.com/a?b=1&c=2"),
    ("http://example.com/a?gclid=1&msclkid=2&b=3", "http://example.com/a?b=3"),
    ("http://example.com/a?b=1", "http://example.com/a?b=1"),  # clean kept
    (
        "HTTP://WWW.Example.com:80/a?utm_source=x&b=1#f",  # everything at once
        "http://example.com/a?b=1",
    ),
    ("not a url", "not a url"),  # schemeless passes through
]


def test_normalize_url_spark_cases(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, u string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", normalize_url(F.col("u")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_normalize_url_differential_fuzz(spark):
    """Cross-engine differential fuzz: 400 deterministically-generated
    URL-ish strings (random schemes/hosts/ports/params/fragments,
    including malformed fragments-first and empty-part shapes) must
    canonicalize IDENTICALLY through the Spark chain and the DuckDB
    twin — any Java-vs-RE2 dialect drift in the shared patterns fails
    here before it can fail the driver's oracle hash."""
    import random

    rng = random.Random(101)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://", ""]
    hosts = ["example.com", "WWW.Example.COM", "www.a-b.ORG", "x.example", ""]
    ports = ["", ":80", ":443", ":8080", ":0080"]
    paths = ["", "/", "/a", "/a/", "/A/b.c", "/%7Euser", "/a?b"]
    params = [
        "", "?a=1", "?utm_source=x", "?a=1&utm_medium=y", "?utm_a=1&utm_b=2",
        "?fbclid=z&gclid=w", "?a=1&b=2", "?utm_source=&a=1", "?&", "?a",
        "?msclkid=7&utm_campaign=c&b=2",
    ]
    frags = ["", "#f", "#a?b=1", "##x"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(params) + rng.choice(frags)
        for _ in range(400)
    ]

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, u string"
    )
    spark_out = {
        r["i"]: r["c"]
        for r in df.select("i", normalize_url(F.col("u")).alias("c")).collect()
    }
    con = duckdb.connect()
    expr = normalize_url_sql("u")
    mismatches = []
    for i, u in enumerate(urls):
        duck = con.execute(
            f"SELECT {expr} AS c FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]
        if duck != spark_out[i]:
            mismatches.append((u, spark_out[i], duck))
    assert not mismatches, mismatches[:5]


def test_normalize_url_duckdb_twin_matches():
    con = duckdb.connect()
    expr = normalize_url_sql("u")
    for raw, want in CASES:
        got = con.execute(f"SELECT {expr} AS c FROM (SELECT ? AS u)", [raw]).fetchone()[0]
        assert got == want, f"duckdb {raw!r}: {got!r} != {want!r}"
