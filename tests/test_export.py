"""K5/K6 sinks over a tiny completed crawl (SURVEY.md §2.2)."""

from __future__ import annotations

import csv

from distributed_crawl_spark import corpus
from distributed_crawl_spark.config import CrawlConfig
from distributed_crawl_spark.sinks.export import export_status_csv, session_summary
from distributed_crawl_spark.streaming.driver import CrawlDriver


def _run(spark, tmp_path):
    drv = CrawlDriver(
        spark,
        corpus.tiny_pages(spark),
        None,
        CrawlConfig(max_levels=3, max_rounds=5),
        str(tmp_path / "ckpt"),
    )
    drv.run(corpus.tiny_seeds(spark))
    return drv


def test_session_summary_and_csv_export(spark, tmp_path):
    drv = _run(spark, tmp_path)
    out = session_summary(drv, str(tmp_path / "summary.json"))
    assert out["total_urls"] == out["completed"] + out["failed"] + out["pending"]
    assert out["completed"] >= 7  # the 7-page mock site all fetch
    assert 0 < out["success_rate_pct"] <= 100
    assert sum(r["fetched"] for r in out["rounds"]) == out["completed"]
    assert (tmp_path / "summary.json").exists()

    csv_dir = tmp_path / "status_csv"
    export_status_csv(drv.current_status(), str(csv_dir))
    rows = []
    for f in csv_dir.glob("*.csv"):
        with open(f, newline="") as fh:
            rows.extend(csv.DictReader(fh))
    assert len(rows) == out["total_urls"]
    assert {"url", "status", "level", "attempt", "parent_url", "seq"} <= set(rows[0])
