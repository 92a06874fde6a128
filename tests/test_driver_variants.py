"""Driver with the cuckoo seen-filter must produce the identical crawl to
the bloom driver; per-partition lineage table sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.config import CrawlConfig
from distributed_crawl_spark.streaming.driver import CrawlDriver


def _run(spark, tmp_path, **cfg_kw):
    drv = CrawlDriver(
        spark,
        corpus.tiny_pages(spark),
        None,
        CrawlConfig(max_levels=3, max_rounds=5, **cfg_kw),
        str(tmp_path / f"ckpt_{cfg_kw.get('seen_filter', 'bloom')}"),
    )
    drv.run(corpus.tiny_seeds(spark))
    return drv


def test_cuckoo_driver_equals_bloom_driver(spark, tmp_path):
    bloom = _run(spark, tmp_path, seen_filter="bloom")
    cuckoo = _run(spark, tmp_path, seen_filter="cuckoo", cuckoo_buckets=1 << 10)
    assert (
        {r.url for r in bloom.seen_set().collect()}
        == {r.url for r in cuckoo.seen_set().collect()}
    )
    b = {(r.url, r.md_hash) for r in bloom.results().collect()}
    c = {(r.url, r.md_hash) for r in cuckoo.results().collect()}
    assert b == c
    assert [m.fetched for m in bloom.metrics().collect()] == [
        m.fetched for m in cuckoo.metrics().collect()
    ]


def test_partition_metrics_lineage(spark, tmp_path):
    drv = _run(spark, tmp_path)
    pm = drv.partition_metrics()
    assert set(pm.columns) == {"bucket", "kind", "n", "round"}
    fetched_total = (
        pm.filter(F.col("kind") == "fetched").agg(F.sum("n")).collect()[0][0]
    )
    assert fetched_total == sum(m.fetched for m in drv.metrics().collect())
    # buckets must be within the configured url-hash space
    mx = pm.agg(F.max("bucket"), F.min("bucket")).collect()[0]
    assert 0 <= mx[1] and mx[0] < 64


def test_auto_strategy_guard_and_equivalence(spark, tmp_path):
    """'broadcast' with an unbounded slice is rejected; 'auto' picks the
    shuffle path when the observed slice exceeds broadcast_row_limit and
    produces the identical crawl either way."""
    import pytest

    from distributed_crawl_spark.config import CrawlConfig as CC

    with pytest.raises(ValueError, match="broadcast"):
        CC(fetch_join_strategy="broadcast", host_budget=None).validate()
    CC(fetch_join_strategy="auto", host_budget=None).validate()  # ok

    small = _run(spark, tmp_path, host_budget=2,
                 fetch_join_strategy="broadcast")
    forced = _run(spark, tmp_path, host_budget=2,
                  fetch_join_strategy="auto", broadcast_row_limit=1,
                  seen_filter="cuckoo", cuckoo_buckets=1 << 10)
    assert (
        {(r.url, r.md_hash) for r in small.results().collect()}
        == {(r.url, r.md_hash) for r in forced.results().collect()}
    )


def test_content_dedup_storage_parity(spark, tmp_path):
    """D3 completion (hybrid_crawler.py:539-544 semantics): with
    content_dedup=True the crawl_results store holds ONE row per distinct
    md_hash — within-round (min-url pick) and cross-round (anti-join) —
    while crawl FLOW is untouched: same seen set, same children followed,
    same fetched counters as the log-every-fetch default."""
    from distributed_crawl_spark.schema import PAGES_SCHEMA, SEEDS_SCHEMA

    def page(url, body, link=None):
        a = f'<a href="{link}">x</a>' if link else ""
        return {
            "url": url,
            "warc_ts": None,
            "html": f"<html><body><p>{body}</p>{a}</body></html>".encode(),
            "text": None,
            "lang": "en",
        }

    pages = spark.createDataFrame(
        [
            # three identical-content seeds + one more dup of the same
            page("https://d.test/a", "same words here",
                 link="https://d.test/g"),  # link changes a's text
            page("https://d.test/b", "same words here"),
            page("https://d.test/c", "same words here"),
            page("https://d.test/f", "same words here"),
            page("https://d.test/d", "unique one"),
            page("https://d.test/e", "unique two"),
            # child discovered in round 1 whose content equals d's —
            # must be withheld by the CROSS-round anti-join
            page("https://d.test/g", "unique one"),
        ],
        schema=PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [{"url": f"https://d.test/{x}", "seq": i, "unique_id": None}
         for i, x in enumerate("abcfde")],
        schema=SEEDS_SCHEMA,
    )

    def run(flag):
        drv = CrawlDriver(
            spark, pages, None,
            CrawlConfig(max_levels=2, max_rounds=4, content_dedup=flag),
            str(tmp_path / f"ck_cd_{flag}"),
        )
        drv.run(seeds)
        return drv

    plain, dedup = run(False), run(True)

    # flow parity: identical seen set and per-round fetched counts
    assert (
        {(r.url, r.status) for r in plain.current_status().collect()}
        == {(r.url, r.status) for r in dedup.current_status().collect()}
    )
    pm = [(m.round, m.fetched) for m in plain.metrics().collect()]
    dm = [(m.round, m.fetched) for m in dedup.metrics().collect()]
    assert pm == dm

    # storage: plain logs all 7 fetches; dedup holds one row per hash
    assert plain.results().count() == 7
    got = {(r.url, r.md_hash) for r in dedup.results().collect()}
    hashes = [h for _, h in got]
    assert len(hashes) == len(set(hashes)), f"dup hashes stored: {got}"
    urls = {u for u, _ in got}
    # min-url pick within the identical b/c/f group; g withheld cross-round
    assert "https://d.test/b" in urls
    assert {"https://d.test/c", "https://d.test/f"}.isdisjoint(urls)
    assert "https://d.test/g" not in urls

    # metric: b/c/f round-0 group drops 2, g drops 1 in its round
    per_round = {m.round: m.content_deduped for m in dedup.metrics().collect()}
    assert sum(per_round.values()) == 3, per_round
    assert all(m.content_deduped == 0 for m in plain.metrics().collect())


def test_markdown_extract_mode_crawl(spark, tmp_path):
    """extract_mode='markdown': stored text is the structure-preserving
    markdown of each page while the crawl GRAPH (seen set, ordering,
    children, counters) is identical to basic mode — links don't depend
    on the text mode."""
    from distributed_crawl_spark.functions.text import html_to_markdown

    def run(mode):
        drv = CrawlDriver(
            spark, corpus.tiny_pages(spark), None,
            CrawlConfig(max_levels=3, max_rounds=5, extract_mode=mode),
            str(tmp_path / f"ck_em_{mode}"),
        )
        drv.run(corpus.tiny_seeds(spark))
        return drv

    basic, md = run("basic"), run("markdown")
    assert (
        {(r.url, r.status) for r in basic.current_status().collect()}
        == {(r.url, r.status) for r in md.current_status().collect()}
    )
    assert [m.fetched for m in basic.metrics().collect()] == [
        m.fetched for m in md.metrics().collect()
    ]

    pages = {r.url: bytes(r.html) for r in corpus.tiny_pages(spark).collect()
             if r.html is not None}
    md_rows = {r.url: r.text for r in md.results().collect()}
    checked = 0
    for url, text in md_rows.items():
        if url in pages:
            assert text == html_to_markdown(pages[url], base_url=url)
            checked += 1
    assert checked >= 7
    # and it's genuinely the structured shape, not the basic pipeline
    basic_rows = {r.url: r.text for r in basic.results().collect()}
    assert any(md_rows[u] != basic_rows[u] for u in md_rows)
    assert any("[" in t and "](" in t for t in md_rows.values())


def test_strip_tracking_collapses_campaign_variants(spark, tmp_path):
    """strip_tracking=True: a page linked via two utm variants costs ONE
    fetch of the canonical url; off (default, reference parity) the raw
    variant strings enqueue separately."""
    import datetime

    from distributed_crawl_spark.schema import PAGES_SCHEMA, SEEDS_SCHEMA

    ts = datetime.datetime(2026, 1, 1)
    target = "https://st.test/article"
    seed = "https://st.test/"
    html = (
        f'<html><body><a href="{target}?utm_source=mail">a</a>'
        f'<a href="{target}?utm_source=feed">b</a></body></html>'
    )
    pages = spark.createDataFrame(
        [
            {"url": seed, "warc_ts": ts, "html": html.encode(),
             "text": None, "lang": "en"},
            {"url": target, "warc_ts": ts,
             "html": b"<html><body>dest</body></html>",
             "text": None, "lang": "en"},
        ],
        schema=PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [{"url": seed, "seq": 0, "unique_id": None}], schema=SEEDS_SCHEMA
    )

    def crawl(strip):
        drv = CrawlDriver(
            spark, pages, None,
            CrawlConfig(max_levels=2, max_rounds=3, strip_tracking=strip),
            str(tmp_path / f"ckpt_strip_{strip}"),
        )
        drv.run(seeds)
        return {r.url for r in drv.seen_set().collect()}

    stripped = crawl(True)
    raw = crawl(False)
    assert target in stripped                      # canonical form fetched
    assert not any("utm_" in u for u in stripped)  # no variant enqueued
    # parity mode keeps the reference's raw-string behaviour: both
    # variants enqueue (and 404 against the pages table independently)
    assert {u for u in raw if "utm_" in u} == {
        f"{target}?utm_source=mail", f"{target}?utm_source=feed"
    }


def test_capture_anchors_census_parity(spark, tmp_path):
    """capture_anchors=True stores each fetched page's (target_url, anchor)
    pairs as a crawl_results column (harvested in the SAME Arrow pass as
    text/links), and the export-time census over the stored pairs equals
    anchor_census() recomputed from the fetched pages' raw html. The crawl
    graph itself is unaffected, and the default schema stays anchor-free."""
    from distributed_crawl_spark.functions.graph import (
        anchor_census,
        anchor_census_from_pairs,
    )

    plain = _run(spark, tmp_path)
    cap = _run(spark, tmp_path, seen_filter="cuckoo",
               cuckoo_buckets=1 << 10, capture_anchors=True)

    assert "anchors" not in plain.results().columns
    results = cap.results()
    assert "anchors" in results.columns

    # crawl-graph parity: anchor capture is a pure extra output column
    assert (
        {(r.url, r.md_hash) for r in plain.results().collect()}
        == {(r.url, r.md_hash) for r in results.select("url", "md_hash").collect()}
    )

    # census parity: stored-pairs census == html-recomputed census over
    # exactly the fetched pages
    fetched_pages = corpus.tiny_pages(spark).join(
        results.select("url"), "url", "left_semi"
    )
    from_html = {
        (r.target_url, r.anchor, r.n, r.rank)
        for r in anchor_census(fetched_pages, k=3).collect()
    }
    from_pairs = {
        (r.target_url, r.anchor, r.n, r.rank)
        for r in anchor_census_from_pairs(results, k=3).collect()
    }
    assert from_pairs == from_html
    assert from_pairs, "corpus produced no anchors — fixture regression"


def test_drop_traps_frontier_hygiene(spark, tmp_path):
    """drop_traps=True: a trap-shaped child link never reaches the
    frontier/seen set (and so never spends politeness budget); default
    parity mode enqueues it like the reference would."""
    from distributed_crawl_spark.schema import PAGES_SCHEMA, SEEDS_SCHEMA

    trap = "https://t.test/cal/2024/cal/2024/cal/2024/p"
    good = "https://t.test/article"
    html = (
        f'<html><body><a href="{trap}">c</a>'
        f'<a href="{good}">g</a></body></html>'
    )
    pages = spark.createDataFrame(
        [
            {"url": "https://t.test/", "warc_ts": None, "html": html.encode(),
             "text": None, "lang": "en"},
            {"url": good, "warc_ts": None,
             "html": b"<html><body>ok</body></html>", "text": None,
             "lang": "en"},
        ],
        schema=PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [{"url": "https://t.test/", "seq": 0, "unique_id": None}],
        schema=SEEDS_SCHEMA,
    )

    def crawl(flag):
        drv = CrawlDriver(
            spark, pages, None,
            CrawlConfig(max_levels=2, max_rounds=3, drop_traps=flag),
            str(tmp_path / f"ckpt_traps_{flag}"),
        )
        drv.run(seeds)
        return {r.url for r in drv.seen_set().collect()}

    hygienic = crawl(True)
    parity = crawl(False)
    assert good in hygienic and trap not in hygienic
    assert trap in parity and good in parity


def test_honor_noindex_storage_policy(spark, tmp_path):
    """honor_noindex: a meta-robots-noindex page is crawled — status
    completed, its links followed — but its content never reaches
    crawl_results; withheld count lands in RoundStats.noindex_skipped.
    Default mode stores it like the reference would."""
    from distributed_crawl_spark.schema import PAGES_SCHEMA, SEEDS_SCHEMA

    child = "https://ni.test/child"
    seed = "https://ni.test/"
    html = (
        '<meta name="robots" content="noindex, follow">'
        f'<a href="{child}">c</a>indexable? no'
    ).encode()
    pages = spark.createDataFrame(
        [
            {"url": seed, "warc_ts": None, "html": html,
             "text": None, "lang": "en"},
            {"url": child, "warc_ts": None,
             "html": b"<html><body>plain child</body></html>",
             "text": None, "lang": "en"},
        ],
        schema=PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [{"url": seed, "seq": 0, "unique_id": None}], schema=SEEDS_SCHEMA
    )

    def crawl(flag):
        drv = CrawlDriver(
            spark, pages, None,
            CrawlConfig(max_levels=2, max_rounds=3, honor_noindex=flag),
            str(tmp_path / f"ckpt_ni_{flag}"),
        )
        drv.run(seeds)
        return drv

    plain, honoring = crawl(False), crawl(True)

    stored = {r.url for r in honoring.results().collect()}
    assert stored == {child}                      # noindex page withheld
    assert {r.url for r in plain.results().collect()} == {seed, child}

    # crawl flow identical: same statuses, child still discovered
    assert (
        {(r.url, r.status) for r in plain.current_status().collect()}
        == {(r.url, r.status) for r in honoring.current_status().collect()}
    )
    assert sum(m.noindex_skipped for m in honoring.metrics().collect()) == 1
    assert all(m.noindex_skipped == 0 for m in plain.metrics().collect())
    # parity schema: no meta_robots column leaks into the results shape
    assert "meta_robots" not in honoring.results().columns


def test_block_domains_frontier_hygiene(spark, tmp_path):
    """block_domains: child links on (subdomains of) a listed domain
    never reach the frontier/seen set; default parity mode enqueues
    them."""
    from distributed_crawl_spark.schema import PAGES_SCHEMA, SEEDS_SCHEMA

    blocked = "https://ads.bad.example/track"
    exact = "https://bad.example/page"
    good = "https://t.test/article"
    html = (
        f'<html><body><a href="{blocked}">b</a><a href="{exact}">e</a>'
        f'<a href="{good}">g</a></body></html>'
    )
    pages = spark.createDataFrame(
        [
            {"url": "https://t.test/", "warc_ts": None, "html": html.encode(),
             "text": None, "lang": "en"},
            {"url": good, "warc_ts": None,
             "html": b"<html><body>ok</body></html>", "text": None,
             "lang": "en"},
        ],
        schema=PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [{"url": "https://t.test/", "seq": 0, "unique_id": None}],
        schema=SEEDS_SCHEMA,
    )

    def crawl(domains):
        drv = CrawlDriver(
            spark, pages, None,
            CrawlConfig(max_levels=2, max_rounds=3, block_domains=domains),
            str(tmp_path / f"ckpt_bl_{len(domains)}"),
        )
        drv.run(seeds)
        return {r.url for r in drv.seen_set().collect()}

    hygienic = crawl(("bad.example",))
    parity = crawl(())
    assert good in hygienic
    assert blocked not in hygienic and exact not in hygienic
    assert {blocked, exact, good} <= parity


def test_concurrent_commits_equal_serial(spark, tmp_path):
    """concurrent_commits=True only overlaps job submission for writes
    into DISJOINT tables — every durable table (results, url_seen log,
    errors, partition lineage) and every per-round counter must be
    byte-for-byte the serial driver's. Config exercises every member of
    both fork-join groups: politeness (ranked scratch), retries/failures
    (miss_log + errors write), bloom (probe scratch + state replace)."""

    from distributed_crawl_spark.schema import SEEDS_SCHEMA

    dead = spark.createDataFrame(
        [{"url": "http://sitea.test/missing", "seq": 999, "unique_id": None}],
        schema=SEEDS_SCHEMA,
    )

    def crawl(name, concurrent):
        drv = CrawlDriver(
            spark,
            corpus.tiny_pages(spark),
            None,
            CrawlConfig(
                max_levels=3,
                max_rounds=5,
                host_budget=2,
                retry_attempts=1,
                concurrent_commits=concurrent,
            ),
            str(tmp_path / name),
        )
        drv.run(corpus.tiny_seeds(spark).unionByName(dead))
        return drv

    conc = crawl("ckpt_conc", True)
    ser = crawl("ckpt_serial", False)

    assert (
        {(r.url, r.status) for r in conc.current_status().collect()}
        == {(r.url, r.status) for r in ser.current_status().collect()}
    )
    assert (
        {(r.url, r.md_hash) for r in conc.results().collect()}
        == {(r.url, r.md_hash) for r in ser.results().collect()}
    )
    ignore = {"seconds"}
    c_rounds = [
        {k: v for k, v in m.asDict().items() if k not in ignore}
        for m in conc.metrics().collect()
    ]
    s_rounds = [
        {k: v for k, v in m.asDict().items() if k not in ignore}
        for m in ser.metrics().collect()
    ]
    assert c_rounds == s_rounds
    assert sorted(
        tuple(r) for r in conc.partition_metrics().collect()
    ) == sorted(tuple(r) for r in ser.partition_metrics().collect())

    def errs(drv):
        try:
            return sorted(
                (r.url, r.round, r.reason)
                for r in drv.store.read(spark, "errors").collect()
            )
        except FileNotFoundError:
            return []

    assert errs(conc) == errs(ser)
    # the error path actually ran (retry_attempts=1 + dead links in the
    # tiny corpus), so the errors member of the fork-join group was tested
    assert errs(conc)


def test_focused_topic_reorders_children(spark, tmp_path):
    """focused_topic: the parent's capped link list is re-ranked by
    inbound-anchor topic relevance before link_pos/seq assignment — the
    topic-endorsed child gets the smallest child seq while the crawl
    GRAPH (seen set, fetched pages) is identical to the unfocused run;
    ties keep document order; the flag refuses to run without
    capture_anchors."""
    from distributed_crawl_spark.schema import PAGES_SCHEMA, SEEDS_SCHEMA

    root = "https://f.test/"
    a, b, c = (f"https://f.test/{p}" for p in ("alpha", "sparkdoc", "zeta"))
    html = (
        f'<html><body><a href="{a}">boring page</a>'
        f'<a href="{b}">spark tuning deep dive</a>'
        f'<a href="{c}">unrelated words</a></body></html>'
    )
    leaf = "<html><body><p>leaf</p></body></html>"
    pages = spark.createDataFrame(
        [{"url": root, "warc_ts": None, "html": html.encode(),
          "text": None, "lang": "en"}]
        + [{"url": u, "warc_ts": None, "html": leaf.encode(),
            "text": None, "lang": "en"} for u in (a, b, c)],
        schema=PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [{"url": root, "seq": 0, "unique_id": None}], schema=SEEDS_SCHEMA
    )

    def run(tag, **kw):
        drv = CrawlDriver(
            spark, pages, None,
            CrawlConfig(max_levels=2, max_rounds=4,
                        capture_anchors=True, **kw),
            str(tmp_path / f"ckpt_focus_{tag}"),
        )
        drv.run(seeds)
        return drv

    plain = run("off")
    focused = run("on", focused_topic=("spark", "tuning"))

    assert ({r.url for r in plain.seen_set().collect()}
            == {r.url for r in focused.seen_set().collect()})

    def seqs(drv):
        return {r.url: r.seq for r in drv.current_status().collect()}

    sp, sf = seqs(plain), seqs(focused)
    # unfocused: document order a < b < c
    assert sp[a] < sp[b] < sp[c]
    # focused: the 2-hit anchor wins; a and c tie at 0 hits -> doc order
    assert sf[b] < sf[a] < sf[c]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="capture_anchors"):
        CrawlConfig(focused_topic=("spark",)).validate()


def test_strip_params_path_learned_dust(spark, tmp_path):
    """strip_params_path: a host with a LEARNED strippable param (sid)
    collapses its variants to one canonical fetch with members sorted;
    an unlearned host on the same crawl keeps raw-string parity; a
    learned-but-not-strippable param survives the rewrite."""
    import datetime

    import pandas as pd

    from distributed_crawl_spark.schema import PAGES_SCHEMA, SEEDS_SCHEMA

    ts = datetime.datetime(2026, 1, 1)
    seed = "https://lp.test/"
    tgt = "https://lp.test/item"
    other = "https://raw.test/page"
    html = (
        f'<html><body><a href="{tgt}?sid=1&page=2">a</a>'
        f'<a href="{tgt}?page=2&sid=9">b</a>'
        f'<a href="{other}?sid=1">c</a>'
        f'<a href="{other}?sid=2">d</a></body></html>'
    )
    pages = spark.createDataFrame(
        [
            {"url": seed, "warc_ts": ts, "html": html.encode(),
             "text": None, "lang": "en"},
            {"url": f"{tgt}?page=2", "warc_ts": ts,
             "html": b"<html><body>dest</body></html>",
             "text": None, "lang": "en"},
        ],
        schema=PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame(
        [{"url": seed, "seq": 0, "unique_id": None}], schema=SEEDS_SCHEMA
    )
    learned = tmp_path / "strippable.parquet"
    pd.DataFrame({
        "host": ["lp.test", "lp.test"],
        "param": ["sid", "page"],
        "strippable": [True, False],
    }).to_parquet(learned)

    drv = CrawlDriver(
        spark, pages, None,
        CrawlConfig(max_levels=2, max_rounds=3,
                    strip_params_path=str(learned)),
        str(tmp_path / "ckpt_lp"),
    )
    drv.run(seeds)
    seen = {r.url for r in drv.seen_set().collect()}
    # learned host: both sid variants collapse to the sorted canonical
    assert f"{tgt}?page=2" in seen
    assert not any("sid=" in u and "lp.test" in u for u in seen)
    # page param was NOT strippable -> it survives
    assert tgt not in seen
    # unlearned host: raw-string parity, both variants enqueue
    assert {u for u in seen if "raw.test" in u} == {
        f"{other}?sid=1", f"{other}?sid=2"
    }
