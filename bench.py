"""Benchmark harness — prints ONE JSON line.

Two workloads:

1. **Crawl engine** (the north-star metric): generate a Zipf-host page
   corpus sized to the SF, run the full round driver (politeness window →
   fetch join → pandas-UDF extract → link explode → seen anti-join →
   checkpoint commit) and report URLs fetched+deduped per second.
2. **Headline queries** from ``__spark_entry__.queries()`` at
   ``$SPARK_GRAFT_SF_DIR`` — per-query wall seconds (noop sink, so the
   number is plan execution, not driver collect).

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  SPARK_GRAFT_BENCH    'all' (default) | 'crawl' | 'queries'

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {...}, "sf": ..., "crawl": {...}, "cpus": N}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def run_crawl(spark, sf: float, cpus: int) -> dict:
    from distributed_crawl_spark import corpus
    from distributed_crawl_spark.config import CrawlConfig
    from distributed_crawl_spark.streaming.driver import CrawlDriver

    n_pages = max(2000, int(200_000 * sf))
    n_seeds = max(50, n_pages // 100)
    pages = corpus.scaled_pages(spark, n_pages)
    # materialize the corpus first so generation cost stays out of the
    # crawl measurement (on a real cluster pages are a pre-existing table)
    pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
    pages.write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    seeds = corpus.scaled_seeds(spark, n_pages, n_seeds)

    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    cfg = CrawlConfig(
        max_levels=3,
        host_budget=64,
        salt_threshold=5000,
        max_rounds=4,
        use_bloom=True,
    )
    drv = CrawlDriver(spark, pages, None, cfg, ckpt)
    t0 = time.monotonic()
    stats = drv.run(seeds)
    crawl_s = time.monotonic() - t0
    fetched = sum(s.fetched for s in stats)
    deduped = sum(s.deduped for s in stats)
    failed = sum(s.failed for s in stats)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(pages_dir, ignore_errors=True)
    processed = fetched + deduped + failed
    return {
        "n_pages": n_pages,
        "n_seeds": n_seeds,
        "rounds": len(stats),
        "fetched": fetched,
        "deduped": deduped,
        "failed": failed,
        "seconds": round(crawl_s, 3),
        "urls_per_sec": round(processed / crawl_s, 2),
        "urls_per_sec_per_core": round(processed / crawl_s / cpus, 3),
    }


HEADLINE = [
    "url_slug", "content_hash", "link_dedup_cap", "politeness_window",
    "seen_anti_join", "level_stats", "seed_join", "pricing_summary",
    "hourly_events", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "ann_topk", "ann_lsh",
    "lang_id", "quality_score", "token_count", "doc_fingerprint",
    "multimodal_meta",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = os.environ.get("SPARK_GRAFT_BENCH", "all")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from distributed_crawl_spark.session import build_session

    spark = build_session(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    crawl = run_crawl(spark, sf, cpus) if mode in ("all", "crawl") else {}
    queries = run_queries(spark, sf_dir) if mode in ("all", "queries") else {}
    total = time.monotonic() - t0

    print(json.dumps({
        "metric": "urls_fetched_deduped_per_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "crawl": crawl,
    }))


if __name__ == "__main__":
    main()
