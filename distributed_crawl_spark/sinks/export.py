"""Report sinks (SURVEY.md §2.2 K5/K6 and §2.7 A1-A5).

K6 — CSV status export (utils.py:758-787): flatten the per-URL status map
to CSV with a header.

K5 — session summary (hybrid_crawler.py:744-771, utils.py:677-756): nested
counters — totals, per-level stats (A3), error histogram (A4), content
stats (A5) — computed as DataFrame aggregations and collected (the summary
is a small driver-side artifact by definition).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_status_csv(status: DataFrame, path: str) -> None:
    """K6: write the current per-URL status (driver.current_status() shape:
    url, status, level, attempt, parent_url, seq) as headered CSV."""
    (
        status.select("url", "status", "level", "attempt", "parent_url", "seq")
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def level_stats(status: DataFrame) -> DataFrame:
    """A3 (utils.py:694-704): per-level total/completed/failed."""
    return (
        status.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("status") == "completed").cast("long")).alias("n_completed"),
            F.sum((F.col("status") == "failed").cast("long")).alias("n_failed"),
        )
        .orderBy("level")
    )


def error_histogram(errors: DataFrame) -> DataFrame:
    """A4 (utils.py:687-692): failures grouped by reason/error prefix."""
    return (
        errors.groupBy(
            "reason", F.substring(F.coalesce("error", F.lit("")), 1, 50).alias("error_prefix")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
    )


def content_stats(results: DataFrame) -> DataFrame:
    """A5 (utils.py:706-726): content_length sum/avg/min/max."""
    return results.agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("content_length").alias("total_chars"),
        F.avg("content_length").alias("avg_chars"),
        F.min("content_length").alias("min_chars"),
        F.max("content_length").alias("max_chars"),
    )


def session_summary(driver, path: str | None = None,
                    detail: bool = False,
                    detail_row_limit: int = 100_000,
                    detail_dir: str | None = None) -> dict:
    """K5: the reference's crawl_summary JSON, from the checkpoint state.

    Mirrors hybrid_crawler.py:749-771 keys: totals + success rate (A1/A2),
    per-level stats, error histogram, content stats, per-round lineage,
    plus the A6 rate/ETA block (utils.py:819-833).

    ``detail=True`` also embeds the reference's ``detailed_results``
    (utils.py:741-756): per-URL status rows and the successful-crawl
    result rows — minus the extracted ``text`` itself, which lives in the
    results table / K7 mirror (embedding page bodies in a JSON summary
    does not survive scale; every other reference field is present).

    Driver-safety guard: the detail block collects per-URL rows onto the
    driver, which is only sane for small crawls. Above
    ``detail_row_limit`` total URLs the call refuses — unless
    ``detail_dir`` is set, in which case the detail rows are written as
    parquet (a distributed write, no collect) and the summary carries
    their paths instead of inline dicts.
    """
    status = driver.current_status()
    by_status = {
        r["status"]: r["n"]
        for r in status.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(by_status.values())
    completed = by_status.get("completed", 0)
    summary = {
        "total_urls": total,
        "completed": completed,
        "failed": by_status.get("failed", 0),
        "pending": by_status.get("pending", 0),
        "robots_denied": by_status.get("robots_denied", 0),
        "geo_blocked_skipped": by_status.get("geo_blocked_skipped", 0),
        "success_rate_pct": round(completed / total * 100, 2) if total else 0.0,
        "per_level": [r.asDict() for r in level_stats(status).collect()],
        "content": [r.asDict() for r in content_stats(driver.results()).collect()],
        "rounds": [r.asDict() for r in driver.metrics().collect()],
    }
    summary["progress"] = driver.progress()
    try:
        errs = driver.store.read(driver.spark, "errors")
        summary["errors"] = [r.asDict() for r in error_histogram(errs).collect()]
    except FileNotFoundError:
        summary["errors"] = []
    if detail and total > detail_row_limit and detail_dir is None:
        raise ValueError(
            f"detail=True would collect {total} per-URL rows onto the "
            f"driver (limit {detail_row_limit}); pass detail_dir= to "
            "spill the detail block to parquet instead"
        )
    if detail and total > detail_row_limit:
        status_path = str(Path(detail_dir) / "status_by_url")
        results_path = str(Path(detail_dir) / "successful_crawls")
        status.write.mode("overwrite").parquet(status_path)
        driver.results().drop("text", "extracted_links").write.mode(
            "overwrite"
        ).parquet(results_path)
        summary["detailed_results"] = {
            "status_by_url_path": status_path,
            "successful_crawls_path": results_path,
        }
    elif detail:
        summary["detailed_results"] = {
            "status_by_url": {
                r["url"]: {
                    "status": r["status"],
                    "level": r["level"],
                    "attempts": r["attempt"],
                    "parent_url": r["parent_url"],
                }
                for r in status.collect()
            },
            "successful_crawls": {
                r["url"]: {
                    k: v for k, v in r.asDict().items()
                    if k not in ("url", "text", "extracted_links")
                }
                for r in driver.results().collect()
            },
        }
    if path is not None:
        Path(path).write_text(json.dumps(summary, indent=2, default=str))
    return summary
