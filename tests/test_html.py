"""HTML text extraction (operators/html.py): the JVM strip tier and
the Arrow boilerplate-removal tier."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.html import (
    extract_main_content,
    parse_blocks,
    strip_html,
    strip_html_sql,
)


def test_strip_html_jvm_tier(spark):
    """Comments, script/style subtrees, tags, the six entities, and
    whitespace all handled; dialect parity with DuckDB pinned by
    running strip_html_sql on the identical inputs."""
    import duckdb

    cases = [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("a<!-- hidden\nstuff -->b", "a b"),
        ('<script type="x">var a = 1 < 2; </script>after', "after"),
        ("<style>p { color: red }</style>text", "text"),
        ("x&nbsp;y &amp; z &lt;tag&gt; &quot;q&quot; &#39;s&#39;", 'x y & z <tag> "q" \'s\''),
        # &amp; decodes LAST: escaped entities stay literal text
        ("&amp;lt;", "&lt;"),
        ("  lots\t of \n whitespace  ", "lots of whitespace"),
        # review fixes: uppercase tags and the VT dialect gap
        ('<SCRIPT TYPE="x">var secret = 1;</SCRIPT>after', "after"),
        ("<STYLE>p{}</STYLE>shown", "shown"),
        ("a\x0bb", "a b"),  # Java \s has VT, RE2's does not: explicit class
        ("<div><ul><li>one</li><li>two</li></ul></div>", "one two"),
        ("no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], ["i", "s"])
    got = {
        r["i"]: r["out"]
        for r in df.select("i", strip_html(F.col("s")).alias("out")).collect()
    }
    for i, (_s, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"
    # DuckDB twin: the same patterns produce the same strings
    con = duckdb.connect()
    for i, (s, want) in enumerate(cases):
        (val,) = con.execute(
            f"SELECT {strip_html_sql('?')}", [s]
        ).fetchone()
        assert val == want, f"duckdb case {i}: {val!r} != {want!r}"


PAGE = """
<html><head><title>Ignored</title><script>nav.init();</script></head>
<body>
<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/contact">Contact</a></nav>
<header><a href="/login">Log in</a> or <a href="/join">join us today</a></header>
<article>
<h1>Short headline</h1>
<p>This is the first real paragraph of the article body and it clearly
has more than ten words of actual prose content for readers.</p>
<p>A second substantial paragraph follows with additional sentences, a
<a href="/ref">single inline reference</a>, and plenty of surrounding
words so the link density stays far below the cutoff threshold.</p>
<p>tiny</p>
</article>
<aside><a href="/ad1">Sponsored link one</a> <a href="/ad2">Sponsored link two</a>
<a href="/ad3">Sponsored link three</a> <a href="/ad4">Sponsored link four</a>
<a href="/ad5">Sponsored link five</a></aside>
<footer><a href="/terms">Terms</a> | <a href="/privacy">Privacy</a> |
<a href="/imprint">Imprint</a></footer>
</body></html>
"""


def test_parse_blocks_segmentation_and_link_chars():
    blocks = parse_blocks(PAGE)
    texts = [t for t, _ in blocks]
    # article paragraphs are separate blocks
    assert any(t.startswith("This is the first real paragraph") for t in texts)
    assert any(t.startswith("A second substantial paragraph") for t in texts)
    # script content never appears
    assert not any("nav.init" in t for t in texts)
    # the nav block is fully link text
    nav = next((t, lc) for t, lc in blocks if t.startswith("Home"))
    assert nav[1] >= len("Home") + len("News") + len("Contact")
    # the inline-reference paragraph counts only the anchor chars
    ref = next((t, lc) for t, lc in blocks if "single inline reference" in t)
    assert ref[1] == len("single inline reference")


def test_extract_main_content_drops_boilerplate(spark):
    df = spark.createDataFrame([(1, PAGE)], ["doc_id", "html"])
    row = extract_main_content(df).collect()[0]
    content = row["content"]
    # both real paragraphs kept, in order
    assert "first real paragraph" in content
    assert "second substantial paragraph" in content
    assert content.index("first real") < content.index("second substantial")
    # nav/header/aside/footer link farms and the tiny block dropped
    for junk in ("Home", "Log in", "Sponsored", "Terms", "tiny", "Short headline"):
        assert junk not in content
    assert row["n_kept"] == 2
    assert row["n_blocks"] > 5
    assert row["kept_chars"] == len(content) - 1  # joined by one newline


def test_extract_main_content_malformed_html_is_tolerated(spark):
    """Crawl-grade breakage (unclosed tags, stray brackets, bad
    entities) parses without raising and still yields the prose."""
    bad = (
        "<p>Unclosed paragraph with twelve words of genuine readable prose "
        "content for the extractor to keep <div>Another block that also has "
        "enough plain words to pass the minimum length bar easily"
        "<a href=broken>x</a> < 5 &unknown; &#xZZ;"
    )
    df = spark.createDataFrame([(7, bad), (8, None)], ["doc_id", "html"])
    rows = extract_main_content(df).collect()
    assert len(rows) == 1  # NULL html dropped like every Arrow pipeline
    assert rows[0]["n_kept"] >= 2
    assert "genuine readable prose" in rows[0]["content"]


def test_extract_main_content_thresholds(spark):
    page = (
        "<p>one two three four five six seven eight nine ten eleven</p>"
        '<p><a href="/x">one two three four five six seven eight nine ten eleven</a></p>'
    )
    df = spark.createDataFrame([(1, page)], ["doc_id", "html"])
    # default: the all-link twin is dropped
    assert extract_main_content(df).collect()[0]["n_kept"] == 1
    # raising max_link_density admits it; raising min_words drops both
    assert (
        extract_main_content(df, max_link_density=1.0).collect()[0]["n_kept"] == 2
    )
    assert extract_main_content(df, min_words=12).collect()[0]["n_kept"] == 0


@pytest.mark.parametrize("entity,want", [("&amp;", "&"), ("&nbsp;", " ")])
def test_python_tier_decodes_entities(entity, want):
    blocks = parse_blocks(f"<p>a{entity}b c d e</p>")
    assert blocks[0][0] == f"a{want}b c d e".replace("  ", " ").strip()


def test_fast_parse_blocks_matches_stdlib_differential_fuzz():
    """The r13 fast scanner must be event-identical to the stdlib
    html.parser segmentation (parse_blocks_stdlib) — including the
    tolerant/bogus-markup corners and CHUNK BOUNDARIES (link_chars
    strips per data chunk, so even chunking drift would surface).
    Two fuzz tiers: fragment recombination (realistic malformed
    markup) and random markup soup (pathological)."""
    import random

    from cdc_historical_warehouse_platform_spark.operators.html import (
        parse_blocks_stdlib,
    )

    frags = [
        "plain text ", "with &amp; entity", "&#65;", "&bogus;", "&unclosed",
        "& lone", "<p>", "</p>", "<div class='x'>", "</div>",
        "<a href='/x'>link text</a>", '<a href="a>b">q</a>',
        "<script>var x = '<p>not a tag</p>';</script>", "<script>never closed",
        "<style>b{}</style>", "<template><p>tpl</p></template>",
        "<noscript><a>n</a></noscript>", "<!-- comment with <p> -->",
        "<!-- unterminated", "<!DOCTYPE html>", "<![CDATA[ raw <p> ]]>",
        "<![if ie]>x<![endif]>", "stray < here", "< ", "</>", "</3 bogus>",
        "<br/>", "<hr />", "<p attr=>", "<p 'a'=b>", "<p/q>",
        "<p a='1' b=2 c>", "text<", "</unclosed", "<?php echo '>x'; ?>",
        "<?pi", "<!>", "<!bogus decl>", "<!bogus", "<SCRIPT>UP</script >",
        "</ p>", "<a><a>nested anchors</a>text</a>", "<ul><li>one<li>two</ul>",
        "\n\t  whitespace block \f", "tail &am", "tail &amp",
        "mixed &lt;tag&gt; text",
    ]
    soup = list("<>/!?&;#=-'\"[] \n\tabcPSZ09") + [
        "script", "style", "<!--", "-->", "<![CDATA[", "]]>", "<![if",
        "<![x", "doctype", "&amp;", "template", "<a", "</a>",
    ]

    def outcome(fn, s):
        try:
            return ("ok", fn(s))
        except Exception as e:  # the stdlib raises on some soup; mirror it
            return ("exc", type(e).__name__)

    rng = random.Random(20260818)
    cases = []
    for _ in range(400):
        s = "".join(rng.choice(frags) for _ in range(rng.randint(1, 10)))
        if rng.random() < 0.3:
            s = s[: rng.randint(0, len(s))]
        cases.append(s)
    for _ in range(600):
        cases.append(
            "".join(rng.choice(soup) for _ in range(rng.randint(0, 50)))
        )
    for s in cases:
        assert outcome(parse_blocks, s) == outcome(parse_blocks_stdlib, s), repr(s)
