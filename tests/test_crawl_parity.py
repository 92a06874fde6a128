"""E2E parity: engine vs the pure-Python reference-loop oracle
(SURVEY.md §5.1) over the 7-page mock-site graph.

Contract (SURVEY.md §2.10): with no failures the engine's crawl order —
fetch_log sorted by (round, level, attempt, seq) — equals the reference's
single-worker FIFO order exactly. With failures/retries, the reference's
tail-re-append makes order depend on failure timing, so the assertion
drops to: identical seen set, identical final status (incl. attempt
counts), identical results (url, md_hash, text byte-identical).
"""

from __future__ import annotations

import pytest

from distributed_crawl_spark import corpus
from distributed_crawl_spark.config import CrawlConfig
from distributed_crawl_spark.streaming.driver import CrawlDriver
from tests.ref_loop import reference_crawl


def _pages_dict():
    return {r["url"]: bytes(r["html"]) for r in corpus.mock_site_rows()}


def _run_engine(spark, tmp_path, cfg, seeds=None, pages=None, robots=None):
    pages_df = (
        corpus.tiny_pages(spark)
        if pages is None
        else spark.createDataFrame(pages, corpus.PAGES_SCHEMA)
    )
    seeds_df = corpus.tiny_seeds(spark) if seeds is None else seeds
    driver = CrawlDriver(spark, pages_df, robots, cfg, str(tmp_path / "ckpt"))
    driver.run(seeds_df)
    return driver


def _engine_order(driver):
    rows = (
        driver.fetch_log()
        .orderBy("round", "level", "attempt", "seq")
        .collect()
    )
    return [(r.url, r.level, r.attempt) for r in rows]


@pytest.fixture(scope="module")
def no_failure_run(spark, tmp_path_factory):
    """Mock graph where every referenced URL exists → no retries."""
    cfg = CrawlConfig(max_levels=3, use_bloom=True, bloom_buckets=8)
    driver = _run_engine(spark, tmp_path_factory.mktemp("nf"), cfg)
    oracle = reference_crawl(_pages_dict(), corpus.MOCK_SEEDS, max_levels=3)
    return driver, oracle


def test_order_parity_no_failures(no_failure_run):
    driver, oracle = no_failure_run
    assert _engine_order(driver) == oracle.order


def test_seen_set_parity(no_failure_run):
    driver, oracle = no_failure_run
    engine_seen = {r.url for r in driver.seen_set().collect()}
    assert engine_seen == oracle.seen


def test_status_parity(no_failure_run):
    driver, oracle = no_failure_run
    engine = {
        r.url: (r.status, r.level) for r in driver.current_status().collect()
    }
    want = {
        u: (st.status, st.level) for u, st in oracle.status.items()
    }
    assert engine == want


def test_text_and_hash_byte_identical(no_failure_run):
    driver, oracle = no_failure_run
    engine = {
        r.url: (r.text, r.md_hash) for r in driver.results().collect()
    }
    want = {
        u: (st.text, st.md_hash)
        for u, st in oracle.status.items()
        if st.status == "completed"
    }
    assert engine == want


def test_metrics_lineage_counters(no_failure_run):
    driver, oracle = no_failure_run
    m = {r.round: r.asDict() for r in driver.metrics().collect()}
    # round 0 fetches the 7 seeds; every mock link is a seed too, so all
    # 12 link candidates dedup away and nothing new is enqueued.
    assert m[0]["fetched"] == 7
    assert m[0]["deduped"] == m[0]["urls_seen"] + m[0]["deduped"] - m[0]["new_frontier"]
    assert m[0]["new_frontier"] == 0
    total_fetched = sum(r["fetched"] for r in m.values())
    assert total_fetched == len([s for s in oracle.status.values() if s.status == "completed"])


def test_retry_and_failure_parity(spark, tmp_path):
    """Dead seed + dead links: statuses, attempt counts, seen set match;
    failed URL is attempted exactly retry_attempts times."""
    dead = "http://sitea.test/missing"
    seeds = spark.createDataFrame(
        [(dead, 0, None)] + [(u, i + 1, None) for i, u in enumerate(corpus.MOCK_SEEDS)],
        corpus.SEEDS_SCHEMA,
    )
    cfg = CrawlConfig(max_levels=2, retry_attempts=3, use_bloom=True, bloom_buckets=8)
    driver = _run_engine(spark, tmp_path, cfg, seeds=seeds)
    oracle = reference_crawl(
        _pages_dict(), [dead] + corpus.MOCK_SEEDS, max_levels=2, retry_attempts=3
    )

    assert {r.url for r in driver.seen_set().collect()} == oracle.seen
    engine_status = {
        r.url: r.status for r in driver.current_status().collect()
    }
    assert engine_status == {u: s.status for u, s in oracle.status.items()}

    log = driver.fetch_log().filter(f"url = '{dead}'").collect()
    assert sorted(r.attempt for r in log) == [1, 2, 3]
    # multiset of attempts matches the oracle even though tail-re-append
    # order may differ
    engine_attempts = sorted(
        (r.url, r.attempt)
        for r in driver.fetch_log().collect()
    )
    assert engine_attempts == sorted((u, a) for u, _, a in oracle.order)


def test_resume_equivalence(spark, tmp_path):
    """Run 1 round, resume from checkpoint, final state == uninterrupted."""
    cfg = CrawlConfig(max_levels=3, use_bloom=True, bloom_buckets=8)
    pages_df = corpus.tiny_pages(spark)

    full = CrawlDriver(spark, pages_df, None, cfg, str(tmp_path / "full"))
    full.run(corpus.tiny_seeds(spark))

    part = CrawlDriver(spark, pages_df, None, cfg, str(tmp_path / "part"))
    part.start(corpus.tiny_seeds(spark))
    part.run_round(0)  # crash after round 0

    resumed = CrawlDriver(spark, pages_df, None, cfg, str(tmp_path / "part"))
    resumed.resume()

    a = {(r.url, r.status) for r in full.current_status().collect()}
    b = {(r.url, r.status) for r in resumed.current_status().collect()}
    assert a == b
    assert _engine_order(full) == _engine_order(resumed)


def test_robots_gate(spark, tmp_path):
    """siteb.test disallows /premium → it is never fetched, lands in the
    errors table as robots_denied, and counters record it."""
    cfg = CrawlConfig(max_levels=3, use_bloom=False)
    robots = corpus.tiny_robots(spark)
    driver = _run_engine(spark, tmp_path, cfg, robots=robots)

    fetched_urls = {r.url for r in driver.results().collect()}
    assert f"{corpus.SITE_B}/premium" not in fetched_urls
    status = {r.url: r.status for r in driver.current_status().collect()}
    assert status[f"{corpus.SITE_B}/premium"] == "robots_denied"
    errs = driver.store.read(spark, "errors").collect()
    assert any(e.url.endswith("/premium") and e.reason == "robots_denied" for e in errs)
    assert sum(m.robots_denied for m in driver.metrics().collect()) >= 1


def test_parity_larger_zipf_graph(spark, tmp_path):
    """The mock-7 parity invariants hold beyond the toy graph: seen set,
    final statuses, attempt multiset, and byte-identical text/hash vs the
    reference-loop oracle on a 300-page Zipf-host graph with dead links
    (retries) and a geo-blocked host."""
    n = 300
    cdf = corpus._zipf_cdf(max(16, n // 200))
    recs = [corpus._page_record(i, n, cdf) for i in range(n)]
    pages, dedup = [], set()
    for r in recs:  # first occurrence wins on (host, path) collisions
        if r["url"] not in dedup:
            dedup.add(r["url"])
            pages.append(r)
    seed_urls = [r["url"] for r in pages[:20]]
    seeds = spark.createDataFrame(
        [(u, i, None) for i, u in enumerate(seed_urls)], corpus.SEEDS_SCHEMA
    )
    cfg = CrawlConfig(max_levels=3, retry_attempts=3, use_bloom=True)
    pages_df = spark.createDataFrame(pages, corpus.PAGES_SCHEMA)
    driver = CrawlDriver(spark, pages_df, None, cfg, str(tmp_path / "big"))
    driver.run(seeds)
    oracle = reference_crawl(
        {r["url"]: bytes(r["html"]) for r in pages}, seed_urls,
        max_levels=3, retry_attempts=3,
    )

    assert {r.url for r in driver.seen_set().collect()} == oracle.seen
    assert {
        r.url: r.status for r in driver.current_status().collect()
    } == {u: s.status for u, s in oracle.status.items()}
    engine_attempts = sorted(
        (r.url, r.attempt) for r in driver.fetch_log().collect()
    )
    assert engine_attempts == sorted((u, a) for u, _, a in oracle.order)
    engine_text = {
        r.url: (r.text, r.md_hash) for r in driver.results().collect()
    }
    assert engine_text == {
        u: (s.text, s.md_hash)
        for u, s in oracle.status.items()
        if s.status == "completed"
    }
