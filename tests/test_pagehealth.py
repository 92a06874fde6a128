"""Soft-404 detection and content-evidence tracking-param inference.

soft404_flags/_hosts are checked against hand-built pages with a
planted shared error template, a unique-text error page, boundary word
counts, and a hard-404 row (status given → excluded from soft flags).
strippable_params is checked against a brute-force Python DUST mirror
on a seeded random URL corpus, plus targeted cases: a pure tracking
param, a content-bearing param, mixed evidence (one inconsistent group
vetoes), a valueless flag param, a repeated name in one URL, and a
param only ever seen with one value (observed, n_groups=0).
"""

from __future__ import annotations

import hashlib
import random
from urllib.parse import urlsplit

from distributed_crawl_spark.functions.pagehealth import (
    SOFT404_MAX_WORDS,
    soft404_flags,
    soft404_hosts,
    strippable_params,
)

TEMPLATE = "Error 404 not found. The page you requested does not exist."


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_soft404_flags_planted(spark):
    long_body = " ".join(["word"] * (SOFT404_MAX_WORDS + 1)) \
        + " page not found"
    rows = [
        ("http://a.test/missing", TEMPLATE, 200),
        ("http://a.test/gone", "This item is no longer available.", 200),
        ("http://a.test/real", "An ordinary page about crawling.", 200),
        # phrase present but body too long -> not a soft 404
        ("http://a.test/longerr", long_body, 200),
        # real 404 status -> has_phrase yes, is_soft404 no
        ("http://a.test/hard", TEMPLATE, 404),
    ]
    df = spark.createDataFrame(rows, "url string, text string, status int")
    got = {r["url"]: r for r in
           soft404_flags(df, status_col="status").collect()}
    assert got["http://a.test/missing"]["is_soft404"]
    assert got["http://a.test/gone"]["is_soft404"]
    assert not got["http://a.test/real"]["is_soft404"]
    assert not got["http://a.test/real"]["has_phrase"]
    assert not got["http://a.test/longerr"]["is_soft404"]
    assert got["http://a.test/longerr"]["has_phrase"]
    assert not got["http://a.test/hard"]["is_soft404"]
    assert got["http://a.test/hard"]["has_phrase"]
    assert got["http://a.test/missing"]["digest"] == _md5(TEMPLATE)
    assert got["http://a.test/missing"]["host"] == "a.test"


def test_soft404_hosts_template_pick(spark):
    # host a: 3 copies of the shared template + 2 distinct error texts
    # + 5 clean pages; host b: only 2 flagged (below min_pages=3).
    rows = []
    for i in range(3):
        rows.append((f"http://a.test/t{i}", TEMPLATE))
    rows.append(("http://a.test/u1", "Sorry u1, page not found here."))
    rows.append(("http://a.test/u2", "Sorry u2, page not found here!"))
    for i in range(5):
        rows.append((f"http://a.test/ok{i}", f"A real page number {i}."))
    rows.append(("http://b.test/x", TEMPLATE))
    rows.append(("http://b.test/y", TEMPLATE))
    df = spark.createDataFrame(rows, "url string, text string")
    out = soft404_hosts(soft404_flags(df), min_pages=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["host"] == "a.test"
    assert r["n_pages"] == 10 and r["n_soft404"] == 5
    assert r["soft404_rate_bp"] == 5000
    assert r["template_digest"] == _md5(TEMPLATE)
    assert r["template_n"] == 3 and r["template_share_bp"] == 6000


def test_strippable_params_targeted(spark):
    rows = [
        # utm varies, content constant -> strippable
        ("http://h.test/p?page=1&utm=a", "c1"),
        ("http://h.test/p?page=1&utm=b", "c1"),
        # page varies, content varies -> NOT strippable
        ("http://h.test/p?page=2&utm=a", "c2"),
        # sess: one consistent group and one INconsistent group -> veto
        ("http://h.test/q?sess=1", "q"),
        ("http://h.test/q?sess=2", "q"),
        ("http://h.test/r?sess=1", "r1"),
        ("http://h.test/r?sess=2", "r2"),
        # flag param without '=', two "values" (flag / flag=on), same doc
        ("http://h.test/s?flag", "s"),
        ("http://h.test/s?flag=on", "s"),
        # param only ever one value -> observed, zero evidence
        ("http://h.test/t?lone=1", "t"),
        # no query at all -> contributes nothing
        ("http://h.test/plain", "p"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {(r["host"], r["param"]): r
           for r in strippable_params(df).collect()}
    assert set(got) == {("h.test", p)
                        for p in ("utm", "page", "sess", "flag", "lone")}
    assert got[("h.test", "utm")]["strippable"]
    assert got[("h.test", "utm")]["n_groups"] == 1
    assert not got[("h.test", "page")]["strippable"]
    assert got[("h.test", "page")]["n_groups"] == 1
    assert got[("h.test", "page")]["n_consistent"] == 0
    s = got[("h.test", "sess")]
    assert (s["n_groups"], s["n_consistent"]) == (2, 1)
    assert not s["strippable"]
    assert got[("h.test", "flag")]["strippable"]
    lone = got[("h.test", "lone")]
    assert (lone["n_groups"], lone["strippable"]) == (0, False)


def _dust_mirror(rows, min_groups=1):
    """Brute-force Python mirror of strippable_params."""
    groups: dict[tuple, tuple[set, set]] = {}
    observed = set()
    for url, text in rows:
        sp = urlsplit(url)
        host = sp.netloc.lower()
        page = url.split("#")[0].split("?")[0]
        kvs = [kv for kv in (url.split("#")[0].split("?", 1)[1]
                             if "?" in url.split("#")[0] else ""
                             ).split("&") if kv]
        for kv in kvs:
            name = kv.split("=")[0]
            observed.add((host, name))
            others = "&".join(sorted(
                x for x in kvs if x.split("=")[0] != name))
            key = (host, page, name, others)
            vals, digs = groups.setdefault(key, (set(), set()))
            vals.add(kv)
            digs.add(_md5(text))
    out = {}
    for (host, name) in observed:
        ev = [(v, d) for (h, _, n, _), (v, d) in groups.items()
              if h == host and n == name and len(v) >= 2]
        n_groups = len(ev)
        n_cons = sum(1 for _, d in ev if len(d) == 1)
        out[(host, name)] = (n_groups, n_cons,
                             n_groups >= min_groups and n_cons == n_groups)
    return out


def test_strippable_params_random_vs_mirror(spark):
    rng = random.Random(41)
    rows = []
    for _ in range(300):
        host = f"h{rng.randrange(3)}.test"
        path = f"/p{rng.randrange(4)}"
        parts = []
        page_v = rng.randrange(3)
        # page is always present: the content depends on it, and a URL
        # that omits it while the text still varies with it would make
        # utm legitimately non-strippable (a hidden variable, not the
        # regime under test).
        parts.append(f"page={page_v}")
        if rng.random() < 0.7:
            parts.append(f"utm={rng.randrange(5)}")
        if rng.random() < 0.3:
            parts.append(f"ref={rng.randrange(2)}")
        rng.shuffle(parts)
        q = "&".join(parts)
        url = f"http://{host}{path}" + (f"?{q}" if q else "")
        # content depends on host/path/page only -> utm+ref strippable
        text = f"content {host}{path} page {page_v}"
        rows.append((url, text))
    df = spark.createDataFrame(rows, "url string, text string")
    got = {(r["host"], r["param"]):
           (r["n_groups"], r["n_consistent"], r["strippable"])
           for r in strippable_params(df).collect()}
    assert got == _dust_mirror(rows)
    # sanity: the planted semantics hold on this seed
    assert any(got[k][2] for k in got if k[1] == "utm")
    assert any(not got[k][2] for k in got if k[1] == "page")


def test_canonicalize_urls_collapses_dust(spark):
    from distributed_crawl_spark.functions.pagehealth import (
        canonicalize_urls,
    )

    rows = [
        ("http://h.test/p?utm=a&page=1", "c1"),
        ("http://h.test/p?page=1&utm=b", "c1"),
        ("http://h.test/p?page=2&utm=a", "c2"),
        ("http://h.test/p?page=2", "c2"),
        ("http://h.test/plain#frag", "p"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    learned = strippable_params(df)
    got = {r["url"]: (r["canonical_url"], r["n_stripped"])
           for r in canonicalize_urls(df, learned).collect()}
    # utm stripped everywhere; members sorted; fragment dropped
    assert got["http://h.test/p?utm=a&page=1"] == \
        ("http://h.test/p?page=1", 1)
    assert got["http://h.test/p?page=1&utm=b"] == \
        ("http://h.test/p?page=1", 1)
    assert got["http://h.test/p?page=2&utm=a"] == \
        ("http://h.test/p?page=2", 1)
    assert got["http://h.test/p?page=2"] == \
        ("http://h.test/p?page=2", 0)
    assert got["http://h.test/plain#frag"] == ("http://h.test/plain", 0)
    # DUST collapsed: distinct canonicals == distinct contents
    assert len({c for c, _ in got.values()}) == 3


def test_canonicalize_then_redirect_resolve(spark):
    """The composition order the docstring mandates: strip DUST first,
    then resolve redirect chains over canonicalized nodes."""
    from distributed_crawl_spark.functions.pagehealth import (
        canonicalize_urls,
    )
    from distributed_crawl_spark.functions.redirects import (
        resolve_redirects,
    )

    rows = [
        ("http://h.test/old?utm=x", "moved"),
        ("http://h.test/old?utm=y", "moved"),
        ("http://h.test/new?utm=z", "target"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    canon = canonicalize_urls(df, strippable_params(df))
    edges = spark.createDataFrame(
        [("http://h.test/old", "http://h.test/new")], "src string, dst string"
    )
    resolved = {r["src"]: r["final"]
                for r in resolve_redirects(edges, max_hops=4).collect()}
    finals = {resolved.get(c, c) for c in
              (r["canonical_url"] for r in canon.collect())}
    assert finals == {"http://h.test/new"}
