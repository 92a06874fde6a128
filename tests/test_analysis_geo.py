"""§2.12 analysis stub stage + F8 geo-block routing policy."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.config import CrawlConfig
from distributed_crawl_spark.functions.analysis import (
    analyze_documents,
    heuristic_analyze,
)
from distributed_crawl_spark.streaming.driver import CrawlDriver


def test_analyze_documents_matches_local(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {
        r.doc_id: (r.main_topic, r.content_type, r.summary, r.relevance_score)
        for r in analyze_documents(docs).collect()
    }
    for row in docs.collect():
        want = heuristic_analyze(row.text)
        assert got[row.doc_id] == (
            want["main_topic"], want["content_type"],
            want["summary"], want["relevance_score"],
        )


def test_analyze_passthrough_columns(spark):
    docs = spark.createDataFrame([(1, "# T\nhello world", "x")], ["id", "text", "extra"])
    out = analyze_documents(docs).collect()[0]
    assert (out.id, out.extra) == (1, "x")
    assert out.main_topic == "T"
    assert out.content_type == "snippet"


def test_geo_policy_routing(spark, tmp_path):
    """A geo-blocked page: 'keep' tags method local_geo_blocked and follows
    links; 'skip' marks geo_blocked_skipped, logs an error with preview,
    and does NOT follow its links."""
    geo_url = "http://sitea.test/geo"
    html = (
        "<html><body><p>Your location not permitted</p>"
        '<a href="http://sitea.test/geo-child">x</a></body></html>'
    ).encode()
    pages = spark.createDataFrame(
        [
            (geo_url, None, html, None, "en"),
            ("http://sitea.test/geo-child", None, b"<p>child</p>", None, "en"),
        ],
        corpus.PAGES_SCHEMA,
    )
    seeds = spark.createDataFrame([(geo_url, 0, None)], corpus.SEEDS_SCHEMA)

    for policy in ("keep", "skip"):
        drv = CrawlDriver(
            spark, pages, None,
            CrawlConfig(max_levels=2, max_rounds=3, geo_block_policy=policy),
            str(tmp_path / f"ck_{policy}"),
        )
        stats = drv.run(seeds)
        status = {r.url: r.status for r in drv.current_status().collect()}
        if policy == "keep":
            assert status[geo_url] == "completed"
            assert "http://sitea.test/geo-child" in status  # link followed
            meth = drv.results().filter(F.col("url") == geo_url).collect()[0].method
            assert meth == "local_geo_blocked"
            assert sum(s.geo_blocked_skipped for s in stats) == 0
        else:
            assert status[geo_url] == "geo_blocked_skipped"
            assert "http://sitea.test/geo-child" not in status  # not followed
            assert sum(s.geo_blocked_skipped for s in stats) == 1
            errs = drv.store.read(spark, "errors").collect()
            assert any(
                e.reason == "geo_blocked" and "location not permitted" in e.preview
                for e in errs
            )
            # disable_lambda parity: the skipped page's content must never
            # reach the durable results log (only errors/url_seen)
            assert drv.results().filter(F.col("url") == geo_url).count() == 0
            stored = drv.store.read(spark, "crawl_results")
            assert stored.filter(F.col("geo_blocked")).count() == 0
