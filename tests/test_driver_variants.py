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
