"""Per-round wall-time flatness under auto-compaction (VERDICT r1 item #2).

Runs the same many-round crawl twice — compact_every=8 vs None — on one
cached corpus and reports per-round seconds plus a first-half/second-half
mean comparison. Without compaction, round N unions O(N) parquet deltas
for url_seen/crawl_results, so per-round time grows linearly; with the
periodic maintenance commit it should stay flat.

Usage: python tools/compact_flatness.py [--pages 100000] [--seeds 40000]
       [--budget 2] [--rounds 40] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(spark, pages, seeds, compact_every, budget, max_rounds):
    from distributed_crawl_spark.config import CrawlConfig
    from distributed_crawl_spark.streaming.driver import CrawlDriver

    ckpt = tempfile.mkdtemp(prefix="flatness_ckpt_")
    cfg = CrawlConfig(
        max_levels=1,  # no frontier expansion: round count is seed-driven
        host_budget=budget,
        salt_threshold=2000,
        max_rounds=max_rounds,
        use_bloom=True,
        fetch_join_strategy="shuffle",
        compact_every=compact_every,
    )
    drv = CrawlDriver(spark, pages, None, cfg, ckpt)
    drv.start(seeds)
    stats = drv.resume()
    shutil.rmtree(ckpt, ignore_errors=True)
    return [round(s.seconds, 3) for s in stats]


def halves(times):
    mid = len(times) // 2
    a = sum(times[:mid]) / max(1, mid)
    b = sum(times[mid:]) / max(1, len(times) - mid)
    return round(a, 3), round(b, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--seeds", type=int, default=40_000)
    ap.add_argument("--budget", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from distributed_crawl_spark import corpus
    from distributed_crawl_spark.session import build_session

    spark = build_session(cores=args.cpus, shuffle_partitions=args.cpus)
    pages = corpus.scaled_pages(spark, args.pages)
    pages_dir = tempfile.mkdtemp(prefix="flatness_pages_")
    pages.write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    seeds = corpus.scaled_seeds(spark, args.pages, args.seeds)
    seeds_dir = tempfile.mkdtemp(prefix="flatness_seeds_")
    seeds.write.mode("overwrite").parquet(seeds_dir)
    seeds = spark.read.parquet(seeds_dir)

    out = {}
    for label, k in (("no_compact", None), ("compact_8", 8)):
        times = run_once(spark, pages, seeds, k, args.budget, args.rounds)
        h1, h2 = halves(times)
        out[label] = {
            "rounds": len(times),
            "per_round_s": times,
            "first_half_mean_s": h1,
            "second_half_mean_s": h2,
            "growth": round(h2 / h1, 3) if h1 else None,
        }
        print(json.dumps({label: out[label]}), flush=True)

    shutil.rmtree(pages_dir, ignore_errors=True)
    shutil.rmtree(seeds_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
