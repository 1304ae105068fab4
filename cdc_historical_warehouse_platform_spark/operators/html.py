"""HTML text extraction for web-corpus pipelines (r9 continuation).

Web crawl dumps are the dominant input of large-scale training-data
pipelines, and HTML→text extraction is their first transform (the
WET-extraction / boilerplate-removal step of CCNet-style pipelines).
Two tiers, mirroring the repo's codec-tier philosophy:

1. **``strip_html``** — a pure-Catalyst expression chain (comment /
   script / style removal, tag stripping, the six standard entity
   decodes, whitespace collapse). Stays inside whole-stage codegen —
   zero Python on the hot path, trivially scales to 100 TB of pages
   as a map-only projection. Every regex used is valid in BOTH Java
   regex and RE2 (no backreferences, inline ``(?s)`` flags only), so
   the DuckDB oracle twin runs the literally-same patterns.

2. **``extract_main_content``** — boilerplate REMOVAL, not just tag
   stripping: a stdlib ``html.parser`` walk segments the page into
   block-level text blocks, scores each block by link density
   (anchor-text chars / block chars — the Boilerpipe/jusText
   signal) and length, and keeps content blocks while dropping
   nav/menu/footer link farms. Arrow-batched ``mapInPandas`` —
   payload bytes cross the JVM↔Python boundary once per batch; the
   parse is per-document and embarrassingly parallel.

Reference parity note: mrohitth/cdc-historical-warehouse-platform has
no text-extraction surface — this module is part of the
training-data-pipeline north star, not reference parity.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "strip_html",
    "CONTENT_SCHEMA",
    "extract_main_content",
    "HTML_ENTITIES",
]

# decode order matters: && is decoded LAST so escaped entities
# ("&amp;lt;") surface as their literal text ("&lt;"), per the spec
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_html(col: Column) -> Column:
    """HTML → visible text, entirely JVM-side: drop comments and
    script/style subtrees, strip tags, decode the six standard
    entities, collapse whitespace. All patterns are shared verbatim
    with the DuckDB oracle (Java-regex ∩ RE2 dialect)."""
    c = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # NOT \s: Java's \s includes \x0B (vertical tab) but RE2's does
    # not — the explicit class is identical in both dialects
    return F.trim(F.regexp_replace(c, r"[ \t\n\x{B}\f\r]+", " "))


def strip_html_sql(expr: str) -> str:
    """The DuckDB twin of :func:`strip_html` over SQL expression
    ``expr`` — the same regexes (RE2's default dot already spans
    newlines; the inline (?s) is accepted and redundant there)."""
    c = f"regexp_replace({expr}, '(?s)<!--.*?-->', ' ', 'g')"
    c = f"regexp_replace({c}, '(?is)<script[^>]*>.*?</script\\s*>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?is)<style[^>]*>.*?</style\\s*>', ' ', 'g')"
    c = f"regexp_replace({c}, '<[^>]*>', ' ', 'g')"
    for ent, rep in HTML_ENTITIES:
        r = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{r}')"
    return f"trim(regexp_replace({c}, '[ \\t\\n\\x{{B}}\\f\\r]+', ' ', 'g'))"


CONTENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_kept", T.IntegerType()),
        T.StructField("kept_chars", T.IntegerType()),
        T.StructField("link_chars", T.IntegerType()),
    ]
)

# elements that terminate a text block when opened or closed
_BLOCK_TAGS = frozenset(
    "p div article section main li ul ol h1 h2 h3 h4 h5 h6 td th tr "
    "table pre blockquote br hr form nav header footer aside".split()
)
# subtrees whose text is never content
_SKIP_TAGS = frozenset(("script", "style", "noscript", "template"))


class _BlockParser(HTMLParser):
    """Segment a page into text blocks, tracking per-block anchor-text
    chars (the link-density numerator). stdlib html.parser is
    error-tolerant, so crawl-grade malformed markup parses without
    raising."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._anchor_depth = 0
        self._skip_depth = 0

    def _flush(self):
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, self._link_chars))
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._anchor_depth:
            self._link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def parse_blocks(html: str) -> list[tuple[str, int]]:
    """HTML → [(block text, anchor chars)] — the segmentation
    :func:`extract_main_content` scores. Exposed for tests."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Boilerplate removal: keep blocks with ≥ ``min_words`` words and
    link density ≤ ``max_link_density`` (nav bars, menus, and footer
    link farms are short and link-dense; article prose is long and
    link-sparse — the Boilerpipe observation). Returns the kept blocks
    joined by newlines plus the block-accounting columns."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                if html is None:
                    continue
                blocks = parse_blocks(str(html))
                kept = [
                    text
                    for text, link_chars in blocks
                    if len(text.split()) >= min_words
                    and link_chars <= max_link_density * len(text)
                ]
                out.append(
                    {
                        "doc_id": doc_id,
                        "content": "\n".join(kept),
                        "n_blocks": len(blocks),
                        "n_kept": len(kept),
                        "kept_chars": sum(len(t) for t in kept),
                        "link_chars": sum(lc for _t, lc in blocks),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in CONTENT_SCHEMA.fields])

    return df.select(
        F.col(id_col).alias(id_col), F.col(html_col).alias(html_col)
    ).mapInPandas(_extract, CONTENT_SCHEMA)
