"""URL canonicalization for web-corpus pipelines (r10).

Exact-URL dedup is the FIRST dedup tier of every Common-Crawl-scale
pipeline (CCNet, C4, RefinedWeb all dedup by normalized URL before any
content pass): the same page is crawled under scheme/case/port/
tracking-parameter variants, and collapsing those is pure string
canonicalization — a map-only projection that runs at wire speed
before the (much more expensive) content-hash and near-dup tiers.

``normalize_url`` is a pure-Catalyst expression chain (zero Python on
the hot path, whole-stage codegen, trivially 100 TB-scalable); every
regex is valid in BOTH Java regex and RE2 (no lookarounds, no
backreferences in patterns), so the DuckDB oracle twin
(``normalize_url_sql``) runs the literally-same patterns — only the
replacement group syntax differs per dialect ($1 vs \\1), which the
shared chain table carries explicitly.

Steps, in order:

1. drop the fragment (``#...`` never reaches the server);
2. lowercase the scheme+authority (host names are case-insensitive;
   paths are NOT touched);
3. strip default ports (``http://h:80`` ≡ ``http://h``,
   ``https://h:443`` ≡ ``https://h``);
4. strip a leading ``www.`` from the host;
5. remove tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid`` — the query-string noise crawlers see most). The
   rewrite is applied three times: regexp replacement is
   non-overlapping, so each pass collapses one run of adjacent
   tracking params (three passes cover any realistic URL; a
   pathological 4+-adjacent tail keeps its remainder rather than
   breaking the URL);
6. clean separator artifacts (``?&`` → ``?``, trailing ``?``/``&``);
7. drop a bare-root trailing slash (``http://h/`` ≡ ``http://h`` —
   deeper trailing slashes are left alone: ``/a/`` vs ``/a`` is not
   an equivalence the standard guarantees).

Reference parity note: the reference has no URL surface — this module
belongs to the training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_url", "normalize_url_sql", "URL_TRACKING_PARAMS"]

URL_TRACKING_PARAMS = r"utm_[^=&#]*|fbclid|gclid|msclkid"

# the scheme://authority prefix (RFC 3986 scheme chars; authority runs
# to the first /, ? or #)
_AUTHORITY = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

# (pattern, spark replacement, duckdb replacement) applied in order
# AFTER the lowercase step; patterns are dialect-shared verbatim
_CHAIN: list[tuple[str, str, str]] = [
    # 3. default ports
    (r"^(http://[^/?#:]*):80([/?#]|$)", "$1$2", r"\1\2"),
    (r"^(https://[^/?#:]*):443([/?#]|$)", "$1$2", r"\1\2"),
    # 4. leading www.
    (r"^(https?://)www\.", "$1", r"\1"),
    # 5. tracking params (applied 3x — see module docstring)
    (rf"([?&])({URL_TRACKING_PARAMS})=[^&#]*&?", "$1", r"\1"),
    (rf"([?&])({URL_TRACKING_PARAMS})=[^&#]*&?", "$1", r"\1"),
    (rf"([?&])({URL_TRACKING_PARAMS})=[^&#]*&?", "$1", r"\1"),
    # 6. separator artifacts
    (r"\?&", "?", "?"),
    (r"[?&]+$", "", ""),
    # 7. bare-root trailing slash
    (r"^(https?://[^/?#]*)/$", "$1", r"\1"),
]


def normalize_url(col: Column) -> Column:
    """Canonical form of a URL column — Catalyst-only; see the module
    docstring for the step list. Shared verbatim with
    :func:`normalize_url_sql` (hash-exact oracle row
    ``dedup_url_normalized``)."""
    # 1. fragment
    c = F.regexp_replace(col, r"#.*$", "")
    # 2. lowercase scheme+authority, leave the rest untouched
    c = F.concat(
        F.lower(F.regexp_extract(c, _AUTHORITY, 0)),
        F.regexp_replace(c, _AUTHORITY, ""),
    )
    for pat, spark_rep, _ in _CHAIN:
        c = F.regexp_replace(c, pat, spark_rep)
    return c


def normalize_url_sql(expr: str) -> str:
    """The DuckDB twin of :func:`normalize_url` over SQL expression
    ``expr`` — same patterns, RE2 replacement syntax."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    c = f"regexp_replace({expr}, '#.*$', '', 'g')"
    c = (
        f"concat(lower(regexp_extract({c}, '{q(_AUTHORITY)}', 0)), "
        f"regexp_replace({c}, '{q(_AUTHORITY)}', '', 'g'))"
    )
    for pat, _, duck_rep in _CHAIN:
        c = f"regexp_replace({c}, '{q(pat)}', '{q(duck_rep)}', 'g')"
    return c
