"""Robots Crawl-delay → per-host politeness budgets: parse, cap, window
override, and the driver's multi-round throttling behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.config import CrawlConfig
from distributed_crawl_spark.operators.politeness import rank_frontier, split_ranked
from distributed_crawl_spark.operators.robots import crawl_delay_budgets
from distributed_crawl_spark.streaming.driver import CrawlDriver


def test_crawl_delay_budgets_parse_and_cap(spark):
    robots = corpus.tiny_robots(spark)
    got = {r.host: r.budget for r in crawl_delay_budgets(robots, 60).collect()}
    # only the Crawl-delay host appears; 60 s window / 5 s delay = 12
    assert got == {"slow.test": 12}
    capped = {
        r.host: r.budget
        for r in crawl_delay_budgets(robots, 60, default_budget=8).collect()
    }
    assert capped == {"slow.test": 8}
    # a brutal delay still gets 1 slot (progress guaranteed)
    floor1 = {
        r.host: r.budget
        for r in crawl_delay_budgets(robots, 1).collect()
    }
    assert floor1 == {"slow.test": 1}


def test_rank_frontier_per_host_budget_override(spark):
    rows = [
        (f"https://{h}/p{i}", h, 0, 0, None, 0, 0, i, 0)
        for h in ("slow.test", "fast.test")
        for i in range(20)
    ]
    frontier = spark.createDataFrame(
        rows,
        "url STRING, host STRING, level INT, attempt INT, parent_url STRING,"
        "parent_seq LONG, link_pos INT, seq LONG, discovered_round INT",
    )
    budgets = spark.createDataFrame([("slow.test", 2)], "host STRING, budget LONG")
    selected, deferred = split_ranked(
        rank_frontier(frontier, host_budget=10, host_budgets=budgets)
    )
    per_host = {
        r.host: r.n
        for r in selected.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host == {"slow.test": 2, "fast.test": 10}
    assert deferred.count() == 18 + 10


def test_driver_throttles_crawl_delay_host(spark, tmp_path):
    """4 seeds on a Crawl-delay:5 host with a 5 s round window → budget 1
    per round → the crawl stretches over 4 rounds, rest deferred."""
    urls = [f"https://slow.test/p{i}" for i in range(4)]
    html = "<html><body><p>hello world</p></body></html>".encode()
    pages = spark.createDataFrame(
        [(u, None, html, None, "en") for u in urls], corpus.PAGES_SCHEMA
    )
    seeds = spark.createDataFrame(
        [(u, i, None) for i, u in enumerate(urls)], corpus.SEEDS_SCHEMA
    )
    cfg = CrawlConfig(
        max_levels=1, host_budget=10, honor_crawl_delay=True,
        crawl_delay_round_seconds=5.0, max_rounds=10,
    )
    drv = CrawlDriver(
        spark, pages, corpus.tiny_robots(spark), cfg, str(tmp_path / "ck")
    )
    stats = drv.run(seeds)
    assert len(stats) == 4
    assert [s.fetched for s in stats] == [1, 1, 1, 1]
    assert [s.deferred_by_politeness for s in stats] == [3, 2, 1, 0]


def test_config_rejects_crawl_delay_without_budget():
    import pytest

    with pytest.raises(ValueError):
        CrawlConfig(honor_crawl_delay=True, host_budget=None).validate()


def test_crawl_delay_longer_than_window_spreads_across_rounds(spark):
    """Delay > round window: exactly one in-budget round per period
    (ceil(D/window)), budget 0 on off-rounds — the fix for the
    once-per-round floor overshooting robots by D/window."""
    robots = corpus.tiny_robots(spark)  # slow.test: Crawl-delay 5

    def budget_at(round_no):
        rows = crawl_delay_budgets(robots, 1.0, round_no=round_no).collect()
        return {r.host: r.budget for r in rows}["slow.test"]

    period = 5  # ceil(5 / 1.0)
    seq = [budget_at(r) for r in range(2 * period)]
    assert sum(seq) == 2                      # one slot per period
    assert set(seq) == {0, 1}
    on = [i for i, b in enumerate(seq) if b == 1]
    assert on[1] - on[0] == period            # evenly spaced


def test_driver_spreads_long_crawl_delay(spark, tmp_path):
    """Driver end-to-end: Crawl-delay 5 with a 2.5 s window → period 2 →
    the host is fetched at most every other round."""
    urls = [f"https://slow.test/p{i}" for i in range(3)]
    html = "<html><body><p>hello world</p></body></html>".encode()
    pages = spark.createDataFrame(
        [(u, None, html, None, "en") for u in urls], corpus.PAGES_SCHEMA
    )
    seeds = spark.createDataFrame(
        [(u, i, None) for i, u in enumerate(urls)], corpus.SEEDS_SCHEMA
    )
    cfg = CrawlConfig(
        max_levels=1, host_budget=10, honor_crawl_delay=True,
        crawl_delay_round_seconds=2.5, max_rounds=12,
    )
    drv = CrawlDriver(
        spark, pages, corpus.tiny_robots(spark), cfg, str(tmp_path / "ck")
    )
    stats = drv.run(seeds)
    fetched = [s.fetched for s in stats]
    assert sum(fetched) == 3
    on = [i for i, n in enumerate(fetched) if n > 0]
    assert all(n in (0, 1) for n in fetched)
    assert all(b - a >= 2 for a, b in zip(on, on[1:])), fetched


def test_sitemap_seeds_discovery(spark):
    """Sitemap: directives become distinct (host, url) seed rows;
    relative/ftp entries and robots without directives drop out."""
    from distributed_crawl_spark.operators.robots import sitemap_seeds

    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: *\nDisallow: /private\n"
             "Sitemap: https://a.com/sitemap.xml\n"
             "Sitemap: https://cdn.a.com/s2.xml\n"
             "Sitemap: https://a.com/sitemap.xml\n"),   # dup collapses
            ("b.com", "User-agent: *\nAllow: /\n"),      # none
            ("c.com", "Sitemap: ftp://c.com/s.xml\n"),   # non-http
            ("d.com", None),
        ],
        ["host", "robots_txt"],
    )
    got = {
        (r["host"], r["sitemap_url"])
        for r in sitemap_seeds(robots).collect()
    }
    assert got == {
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://cdn.a.com/s2.xml"),
    }


def test_sitemap_entries_parsing(spark):
    """sitemap_entries: urlset vs sitemapindex kinds, whitespace-trimmed
    locs in document order, non-sitemap bodies parse to zero entries."""
    from pyspark.sql import functions as F

    from distributed_crawl_spark.operators.robots import sitemap_entries

    urlset = (b"<?xml version='1.0'?><urlset>"
              b"<loc>  https://s.test/a  </loc>"
              b"<loc>https://s.test/b</loc></urlset>")
    index = (b"<sitemapindex><loc>https://s.test/sm-1.xml</loc>"
             b"</sitemapindex>")
    plain = b"<html><body>not a sitemap</body></html>"
    pages = spark.createDataFrame(
        [("https://s.test/sitemap.xml", urlset),
         ("https://s.test/sitemap-index.xml", index),
         ("https://s.test/page", plain)],
        "url STRING, html BINARY",
    )
    rows = sitemap_entries(pages).orderBy("sitemap_url", "pos").collect()
    assert [(r.sitemap_url, r.kind, r.url, r.pos) for r in rows] == [
        ("https://s.test/sitemap-index.xml", "sitemap",
         "https://s.test/sm-1.xml", 0),
        ("https://s.test/sitemap.xml", "url", "https://s.test/a", 0),
        ("https://s.test/sitemap.xml", "url", "https://s.test/b", 1),
    ]
    # pure projection: zero exchanges in the plan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        sitemap_entries(pages).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_sitemap_url_entries_hints(spark):
    """Full <url>-block parse: lastmod/priority hints, absence -> NULL,
    whitespace trim, loc-less blocks dropped, '0.7' survives the double
    round-trip as exactly 700."""
    from distributed_crawl_spark.operators.robots import sitemap_url_entries

    xml = b"""<urlset>
    <url><loc> https://a.com/1 </loc>
         <lastmod>2024-03-05T10:00:00+00:00</lastmod>
         <priority>0.7</priority></url>
    <url><loc>https://a.com/2</loc></url>
    <url><loc>https://a.com/3</loc><priority>1.0</priority></url>
    <url><lastmod>2024-01-01</lastmod></url>
    </urlset>"""
    pages = spark.createDataFrame(
        [("https://a.com/sitemap.xml", xml)], "url STRING, html BINARY"
    )
    rows = {r.url: r for r in sitemap_url_entries(pages).collect()}
    assert set(rows) == {f"https://a.com/{i}" for i in (1, 2, 3)}
    r1 = rows["https://a.com/1"]
    assert str(r1.lastmod) == "2024-03-05" and r1.priority_milli == 700
    r2 = rows["https://a.com/2"]
    assert r2.lastmod is None and r2.priority_milli is None
    assert rows["https://a.com/3"].priority_milli == 1000
    assert [rows[f"https://a.com/{i}"].pos for i in (1, 2, 3)] == [0, 1, 2]


def test_driver_consumes_offline_rank_budgets(spark, tmp_path):
    """host_budgets_path: an offline rank_budgets table throttles the
    low-trust host to 1 slot/round while the trusted host drains at its
    table budget — the rank job runs out of band, the crawler consumes
    its verdict."""
    urls = [f"https://{h}/p{i}"
            for h in ("trusted.test", "farm.test") for i in range(4)]
    html = "<html><body><p>hello world</p></body></html>".encode()
    pages = spark.createDataFrame(
        [(u, None, html, None, "en") for u in urls], corpus.PAGES_SCHEMA
    )
    seeds = spark.createDataFrame(
        [(u, i, None) for i, u in enumerate(urls)], corpus.SEEDS_SCHEMA
    )
    budgets_path = str(tmp_path / "budgets.parquet")
    spark.createDataFrame(
        [("trusted.test", 4), ("farm.test", 1)], "host STRING, budget LONG"
    ).write.parquet(budgets_path)
    cfg = CrawlConfig(
        max_levels=1, host_budget=10, max_rounds=10,
        host_budgets_path=budgets_path,
    )
    drv = CrawlDriver(spark, pages, None, cfg, str(tmp_path / "ck"))
    stats = drv.run(seeds)
    # trusted drains in round 0; the farm host takes 4 rounds at 1/round
    assert [s.fetched for s in stats] == [5, 1, 1, 1]
    assert [s.deferred_by_politeness for s in stats] == [3, 2, 1, 0]


def test_driver_merges_rank_and_crawl_delay_budgets(spark, tmp_path):
    """Both tables present: LEAST wins per host — slow.test is bound by
    Crawl-delay (1 < table's 10), fast.test by the rank table (2 < the
    scalar 10)."""
    urls = [f"https://{h}/p{i}"
            for h in ("slow.test", "fast.test") for i in range(2)]
    html = "<html><body><p>hello world</p></body></html>".encode()
    pages = spark.createDataFrame(
        [(u, None, html, None, "en") for u in urls], corpus.PAGES_SCHEMA
    )
    seeds = spark.createDataFrame(
        [(u, i, None) for i, u in enumerate(urls)], corpus.SEEDS_SCHEMA
    )
    budgets_path = str(tmp_path / "budgets.parquet")
    spark.createDataFrame(
        [("slow.test", 10), ("fast.test", 2)], "host STRING, budget LONG"
    ).write.parquet(budgets_path)
    cfg = CrawlConfig(
        max_levels=1, host_budget=10, honor_crawl_delay=True,
        crawl_delay_round_seconds=5.0, max_rounds=10,
        host_budgets_path=budgets_path,
    )
    drv = CrawlDriver(
        spark, pages, corpus.tiny_robots(spark), cfg, str(tmp_path / "ck")
    )
    stats = drv.run(seeds)
    # round 0: fast.test fetches 2 (rank table), slow.test 1 (delay);
    # round 1: slow.test's last page
    assert [s.fetched for s in stats] == [3, 1]


def test_config_rejects_rank_budgets_without_host_budget():
    import pytest

    with pytest.raises(ValueError):
        CrawlConfig(host_budgets_path="/x", host_budget=None).validate()
