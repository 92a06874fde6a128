"""Byte-identity tests for the HTML→text extractor (the per-row invariant,
BASELINE.json input_hint) and the link pipeline.

Expected strings are hand-derived from the reference pipeline
(hybrid_crawler.py:364-375: decompose script/style → get_text →
splitlines → strip → split('  ') → strip → join non-empty with '\\n').
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.functions.text import (
    extract_text_and_hrefs,
    make_extract_udf,
    resolve_links,
)


def test_basic_extraction():
    # get_text() concatenates text nodes with NO separator: adjacent tags
    # with no whitespace between them merge ('TitleHello world'), while
    # newline text nodes become line boundaries.
    html = "<html><body><h1>Title</h1><p>Hello world</p></body></html>"
    text, _ = extract_text_and_hrefs(html)
    assert text == "TitleHello world"

    html_nl = "<html><body>\n<h1>Title</h1>\n<p>Hello world</p>\n</body></html>"
    text_nl, _ = extract_text_and_hrefs(html_nl)
    assert text_nl == "Title\nHello world"


def test_script_style_removed():
    html = (
        "<html><head><style>p { color: red }</style>\n"
        "<script>var x = 'SCRIPT_TEXT';</script></head>\n"
        "<body><p>kept</p>\n<script>more()</script>\n<p>also kept</p></body></html>"
    )
    text, _ = extract_text_and_hrefs(html)
    assert text == "kept\nalso kept"
    assert "SCRIPT_TEXT" not in text and "color" not in text


def test_comments_excluded():
    # bs4 get_text() excludes Comment nodes
    text, _ = extract_text_and_hrefs("<p>a<!-- hidden -->b</p>")
    assert text == "ab"


def test_entities_decoded():
    text, _ = extract_text_and_hrefs("<p>a &amp; b &#65; &lt;tag&gt;</p>")
    assert text == "a & b A <tag>"


def test_two_space_phrase_split():
    # '  ' inside a line splits into separate output lines; single spaces kept
    text, _ = extract_text_and_hrefs("<p>alpha  beta gamma   delta</p>")
    # 'alpha', 'beta gamma', '', 'delta' → blanks dropped
    assert text == "alpha\nbeta gamma\ndelta"


def test_whitespace_only_lines_dropped():
    html = "<div>\n   \n  first\n\t\nsecond   </div>"
    text, _ = extract_text_and_hrefs(html)
    assert text == "first\nsecond"


def test_bytes_input():
    text, _ = extract_text_and_hrefs("<p>ünïcødé</p>".encode("utf-8"))
    assert text == "ünïcødé"


def test_href_document_order_and_filtering():
    html = (
        '<a href="/one">1</a><a>no href</a><a href="">empty</a>'
        '<a href="#frag">frag</a><a href="mailto:x@y">mail</a>'
        '<a href="/two">2</a><a href="/one">dup</a>'
        '<a href="https://other.test/abs">abs</a>'
    )
    _, hrefs = extract_text_and_hrefs(html)
    assert hrefs == ["/one", "", "#frag", "mailto:x@y", "/two", "/one",
                     "https://other.test/abs"]
    links = resolve_links("https://base.test/dir/page", hrefs, max_links=10)
    # empty + '#frag' skipped; mailto dropped (non-http); dup deduped
    assert links == [
        "https://base.test/one",
        "https://base.test/two",
        "https://other.test/abs",
    ]


def test_link_cap():
    hrefs = [f"/p{i}" for i in range(20)]
    links = resolve_links("https://h.test/", hrefs, max_links=5)
    assert links == [f"https://h.test/p{i}" for i in range(5)]


def test_relative_resolution_urljoin_semantics():
    links = resolve_links(
        "https://h.test/a/b/page.html", ["sibling", "../up", "/root", "//proto.test/x"],
        max_links=None,
    )
    assert links == [
        "https://h.test/a/b/sibling",
        "https://h.test/a/up",
        "https://h.test/root",
        "https://proto.test/x",
    ]


def test_udf_matches_pure_python(spark):
    """The Spark-side pandas UDF must agree byte-for-byte with the pure
    function over the full tiny corpus (mock graph + edge cases)."""
    pages = corpus.tiny_pages(spark)
    extract = make_extract_udf(max_links=10)
    out = (
        pages.withColumn("ex", extract(F.col("url"), F.col("html")))
        .select("url", "html", "text", F.col("ex.text").alias("got"),
                F.col("ex.links").alias("links"))
        .collect()
    )
    assert len(out) == 17
    for row in out:
        want_text, want_hrefs = extract_text_and_hrefs(bytes(row.html))
        assert row.got == want_text, row.url
        assert row.got == row.text, row.url  # corpus text column = invariant
        assert row.links == resolve_links(row.url, want_hrefs, 10), row.url


def test_mock_graph_links_roundtrip(spark):
    """Extracted+resolved links of the mock home page equal the fixture
    graph absolutized in document order."""
    pages = corpus.tiny_pages(spark)
    extract = make_extract_udf(max_links=10)
    row = (
        pages.filter(F.col("url") == f"{corpus.SITE_A}/")
        .select(extract(F.col("url"), F.col("html")).alias("ex"))
        .collect()[0]
    )
    assert row.ex.links == [
        f"{corpus.SITE_A}/about",
        f"{corpus.SITE_A}/services",
        f"{corpus.SITE_A}/contact",
        f"{corpus.SITE_B}/",
    ]


def test_markdown_structure_goldens():
    """Structure-preserving markdown variant (Crawl4AI-path output shape,
    hybrid_crawler.py:322-353): own golden vectors per SURVEY §7.3 —
    browser parity is out of contract, determinism is in."""
    from distributed_crawl_spark.functions.text import html_to_markdown

    html = (
        "<html><head><script>var x=1;</script>"
        "<style>p{}</style></head><body>"
        "<h1>Main &amp; Title</h1>"
        "<p>Intro with <b>bold</b> and <em>em</em> text.</p>"
        "<h2>Links</h2>"
        '<p>See <a href="/docs">the docs</a> or '
        '<a href="https://ext.test/page">external</a>.</p>'
        "<ul><li>first</li><li>second <a href='#frag'>frag</a></li>"
        "<ol><li>nested</li></ol></ul>"
        "<pre>  spaced   code  </pre>"
        "</body></html>"
    )
    got = html_to_markdown(html, base_url="https://site.test/a/b")
    expected = "\n".join(
        [
            "# Main & Title",
            "Intro with **bold** and *em* text.",
            "## Links",
            "See [the docs](https://site.test/docs) or "
            "[external](https://ext.test/page).",
            "- first",
            "- second [frag](https://site.test/a/b#frag)",
            "  - nested",
            "spaced code",
        ]
    )
    assert got == expected

    # byte-determinism + bytes input + no base_url
    assert html_to_markdown(html.encode(), base_url="https://site.test/a/b") == expected
    assert html_to_markdown(None) == ""
    assert "[raw](/docs)" in html_to_markdown('<a href="/docs">raw</a>')


def test_markdown_udf_matches_core(spark):
    from distributed_crawl_spark.functions.text import (
        html_to_markdown,
        markdown_extract_udf,
    )

    rows = [
        ("https://s.test/p1", "<h1>One</h1><p>alpha <b>beta</b></p>"),
        ("https://s.test/p2", '<p><a href="x">rel</a></p>'),
        ("https://s.test/p3", None),
    ]
    df = spark.createDataFrame(rows, ["url", "html"])
    got = {
        r.url: r.md
        for r in df.select(
            "url", markdown_extract_udf("url", "html").alias("md")
        ).collect()
    }
    for u, h in rows:
        assert got[u] == html_to_markdown(h, base_url=u)
    assert got["https://s.test/p2"] == "[rel](https://s.test/x)"


def test_anchor_pairs_edge_cases():
    """Anchor capture: nested tags inside <a>, whitespace collapse,
    self-closing/empty anchors dropped, '#'/mailto hygiene, duplicate
    targets KEPT, and the text invariant untouched by the capture."""
    from distributed_crawl_spark.functions.text import (
        extract_anchor_texts,
        extract_text_and_hrefs,
    )

    html = (
        '<p>intro</p>'
        '<a href="/d/1">go <b>one</b></a>'
        '<a href="/d/1">go\n  one</a>'          # dup target, messy ws
        '<a href="#frag">skip</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="/icon/1"></a>'                 # empty text
        '<a href="/d/2/">two</a>'
        '<a>no href</a>'
        '<script><a href="/d/3">hidden</a></script>'
    )
    pairs = extract_anchor_texts("https://ex.test/page", html)
    assert pairs == [
        ("https://ex.test/d/1", "go one"),
        ("https://ex.test/d/1", "go one"),
        ("https://ex.test/d/2/", "two"),
    ]
    # capture is additive: text + href stream identical semantics
    text, hrefs = extract_text_and_hrefs(html)
    assert "intro" in text and "hidden" not in text
    assert hrefs[0] == "/d/1" and "/icon/1" in hrefs


def test_parser_nofollow_and_meta_capture():
    """Additive captures: per-href rel=nofollow flags and the first
    <meta name=robots> content — raw hrefs/text untouched."""
    from distributed_crawl_spark.functions.text import _run_parser

    html = (
        '<html><head><meta name="ROBOTS" content="noindex, NOFOLLOW">'
        '<meta name="robots" content="all"></head><body>'
        '<a href="/a" rel="nofollow">a</a>'
        '<a href="/b" rel="ugc nofollow">b</a>'
        '<a href="/c" rel="author">c</a>'
        '<a href="/d">d</a>'
        "<p>text stays</p></body></html>"
    )
    p = _run_parser(html)
    assert p.hrefs == ["/a", "/b", "/c", "/d"]
    assert p.href_nofollow == [True, True, False, False]
    assert p.meta_robots == "noindex, nofollow"  # first wins, lowercased
    # self-closing meta also captured
    p2 = _run_parser('<meta name="robots" content="nofollow" />x')
    assert p2.meta_robots == "nofollow"


def test_extract_udf_honor_nofollow(spark):
    """honor_nofollow drops rel=nofollow links; meta robots nofollow
    drops ALL links; default keeps raw parity. Text identical in all
    modes."""
    from distributed_crawl_spark.functions.text import make_extract_udf

    base = "https://n.test/"
    rows = [
        (base, ('<a href="/x" rel="nofollow">x</a>'
                '<a href="/y">y</a>hello').encode()),
        (base + "m", ('<meta name="robots" content="nofollow">'
                      '<a href="/z">z</a>world').encode()),
    ]
    df = spark.createDataFrame(rows, "url STRING, html BINARY")

    def run(flag):
        udf = make_extract_udf(max_links=10, honor_nofollow=flag)
        return {
            r.url: (r.ex.text, list(r.ex.links))
            for r in df.select(
                "url", udf(F.col("url"), F.col("html")).alias("ex")
            ).collect()
        }

    raw = run(False)
    hygienic = run(True)
    assert raw[base][1] == ["https://n.test/x", "https://n.test/y"]
    assert hygienic[base][1] == ["https://n.test/y"]
    assert raw[base + "m"][1] == ["https://n.test/z"]
    assert hygienic[base + "m"][1] == []
    for u in raw:
        assert raw[u][0] == hygienic[u][0]  # text invariant unaffected


def test_parser_canonical_capture():
    from distributed_crawl_spark.functions.text import _run_parser

    html = ('<head><link rel="stylesheet" href="/s.css">'
            '<link rel="Canonical" href="/real">'
            '<link rel="canonical" href="/second"></head>')
    p = _run_parser(html)
    assert p.canonical == "/real"  # first canonical wins, rel token-matched
    assert _run_parser('<link rel="canonical" href="x"/>ok').canonical == "x"
    assert _run_parser("<p>none</p>").canonical is None
