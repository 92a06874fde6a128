"""Recrawl-TTL expiry (the flow the deletable cuckoo filter exists for):
``requeue`` re-injects stale completed URLs into the frontier for an
immediate refetch; ``forget`` drops them from the url_seen log (rewrite
commit) and deletes their cuckoo fingerprints so organic link rediscovery
re-enqueues them — with bloom the stale bit only costs the exact-confirm
join, never correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.config import CrawlConfig
from distributed_crawl_spark.operators.seen import filter_unseen
from distributed_crawl_spark.streaming.driver import CrawlDriver


def _crawl(spark, tmp_path, **cfg_kw):
    cfg = CrawlConfig(max_levels=3, max_rounds=8, host_budget=None, **cfg_kw)
    drv = CrawlDriver(
        spark, corpus.tiny_pages(spark), None, cfg, str(tmp_path / "ck")
    )
    drv.run(corpus.tiny_seeds(spark))
    return drv


def test_expire_requeue_refetches(spark, tmp_path):
    drv = _crawl(spark, tmp_path)
    n_results = drv.results().count()
    completed = {
        r.url for r in drv.current_status().filter(F.col("status") == "completed").collect()
    }
    assert completed

    n = drv.expire(ttl_rounds=0, requeue=True)
    assert n == len(completed)
    # requeued rows are pending again, original seq kept (FIFO order stable)
    frontier = drv.store.read(spark, "frontier")
    assert {r.url for r in frontier.collect()} == completed
    assert frontier.filter(F.col("attempt") != 0).count() == 0

    stats = drv.resume()
    assert sum(s.fetched for s in stats[-2:]) >= len(completed)
    # refetch appended newer rows; history never rewritten
    assert drv.results().count() == n_results + len(completed)
    # every requeued URL is completed again at a later round
    last = drv.current_status().filter(F.col("status") == "completed")
    assert {r.url for r in last.collect()} >= completed


def test_expire_forget_drops_seen_and_cuckoo_fast_path(spark, tmp_path):
    drv = _crawl(spark, tmp_path, seen_filter="cuckoo")
    completed = {
        r.url for r in drv.current_status().filter(F.col("status") == "completed").collect()
    }
    seen_before = {r.url for r in drv.seen_set().collect()}

    n = drv.expire(ttl_rounds=0, requeue=False)
    assert n == len(completed)
    # url_seen rewrite dropped exactly the expired URLs
    assert {r.url for r in drv.seen_set().collect()} == seen_before - completed
    # cuckoo fingerprints deleted → definite-new fast path restored
    state = drv.store.read(spark, "bloom_state")
    urls = spark.createDataFrame([(u,) for u in sorted(completed)], ["url"])
    probed = drv.bloom.probe(state, urls)
    assert probed.filter(F.col("maybe_seen")).count() == 0
    # the filter-level gate now re-admits them as candidates
    cand = urls.select(
        "url", F.lit(1).alias("level"), F.lit(0).alias("attempt"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).cast("long").alias("seq"),
    )
    out = filter_unseen(cand, drv.store.read(spark, "url_seen"),
                        drv.bloom, state)
    assert {r.url for r in out.collect()} == completed


def test_expire_forget_with_bloom_is_still_correct(spark, tmp_path):
    """Bloom can't delete — stale bits route expired URLs through the
    exact confirm join, which must still re-admit them."""
    drv = _crawl(spark, tmp_path)  # default bloom filter
    completed = {
        r.url for r in drv.current_status().filter(F.col("status") == "completed").collect()
    }
    drv.expire(ttl_rounds=0, requeue=False)
    state = drv.store.read(spark, "bloom_state")
    urls = spark.createDataFrame([(u,) for u in sorted(completed)], ["url"])
    cand = urls.select(
        "url", F.lit(1).alias("level"), F.lit(0).alias("attempt"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).cast("long").alias("seq"),
    )
    out = filter_unseen(cand, drv.store.read(spark, "url_seen"),
                        drv.bloom, state)
    assert {r.url for r in out.collect()} == completed


def test_expire_respects_ttl_and_noop(spark, tmp_path):
    drv = _crawl(spark, tmp_path)
    version_before = drv.store.latest_version()
    # everything completed within the last 100 rounds → nothing due;
    # pointer must not move on a no-op
    assert drv.expire(ttl_rounds=100, requeue=True) == 0
    assert drv.store.latest_version() == version_before
    meta = drv.store.latest_meta()
    assert "last_expire" not in meta
