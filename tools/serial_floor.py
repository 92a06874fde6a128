"""Per-round serial-floor profile: where does a round's wall time go,
and which part refuses to shrink with more cores?

The N→4N scaling legs (tools/bench_scaling.py) cap at ~0.69-0.76 on the
2→8 leg; this tool attributes the residual per-round floor. It runs the
IDENTICAL crawl (same corpus cache, same seeds/config) at two core
counts in separate JVMs with CRAWL_TIMING=1, then splits each round's
wall into:

- ``writes``  — staged-write wall (Spark job submit + execute + parquet
  commit, the parallelizable part),
- ``pointer`` — checkpoint pointer JSON IO (pure driver),
- ``residue`` — everything else on the driver: plan construction /
  analysis, checkpoint pointer reads, Observation bookkeeping, Py4J
  round-trips.

The serial floor = pointer + residue + the non-scaling share of writes
(each write pays a fixed job-submit cost before any task runs).

Usage: python tools/serial_floor.py [--cpus 2,8] [--pages 200000]
       python tools/serial_floor.py --leg --cores 8 --pages 200000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_leg(cores: int, pages: int, rounds: int) -> dict:
    """In-process leg: run the bench crawl, aggregate TIMINGS per round."""
    import shutil

    import bench
    from distributed_crawl_spark import corpus
    from distributed_crawl_spark.config import CrawlConfig
    from distributed_crawl_spark.session import build_session
    from distributed_crawl_spark.streaming import checkpoint as CK
    from distributed_crawl_spark.streaming.driver import CrawlDriver

    spark = build_session("serial-floor", cores=cores, shuffle_partitions=cores)
    pages_df, scratch = bench._bucketed_pages(spark, pages)
    seeds = corpus.scaled_seeds(spark, pages, max(1000, pages // 5))
    ckpt = tempfile.mkdtemp(prefix="serial_floor_ckpt_")
    cfg = CrawlConfig(
        max_levels=3, host_budget=1024, salt_threshold=2000,
        max_rounds=rounds, use_bloom=True, fetch_join_strategy="shuffle",
    )
    drv = CrawlDriver(spark, pages_df, None, cfg, ckpt)
    drv.start(seeds)
    CK.TIMINGS.clear()  # bootstrap writes are corpus setup, not rounds
    drv.resume()
    per_round: list[dict] = []
    acc = {"writes": 0.0, "pointer": 0.0, "n_writes": 0}
    for row in CK.TIMINGS:
        if row["kind"] == "write":
            acc["writes"] += row["sec"]
            acc["n_writes"] += 1
        elif row["kind"] == "pointer":
            acc["pointer"] += row["sec"]
        elif row["kind"] == "round":
            wall = row["sec"]
            per_round.append({
                "round": int(row["name"]),
                "wall": round(wall, 3),
                "writes": round(acc["writes"], 3),
                "pointer": round(acc["pointer"], 4),
                "residue": round(wall - acc["writes"] - acc["pointer"], 3),
                "n_writes": acc["n_writes"],
            })
            acc = {"writes": 0.0, "pointer": 0.0, "n_writes": 0}
    shutil.rmtree(ckpt, ignore_errors=True)
    if scratch:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return {"cores": cores, "pages": pages, "rounds": per_round}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--cpus", default="2,8")
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    if args.leg:
        print(json.dumps(run_leg(args.cores, args.pages, args.rounds)))
        return

    cache = tempfile.mkdtemp(prefix="serial_floor_pages_")
    legs = []
    for cores in (int(c) for c in args.cpus.split(",")):
        env = dict(os.environ, CRAWL_TIMING="1", SPARK_GRAFT_PAGES_CACHE=cache)
        out = subprocess.run(
            [sys.executable, __file__, "--leg", "--cores", str(cores),
             "--pages", str(args.pages), "--rounds", str(args.rounds)],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        legs.append(json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        ))
        print(f"done cores={cores}", file=sys.stderr)

    print(f"pages={args.pages} rounds={args.rounds}")
    print("| cores | round | wall s | writes s | pointer s | residue s |")
    print("|---|---|---|---|---|---|")
    for leg in legs:
        for r in leg["rounds"]:
            print(f"| {leg['cores']} | {r['round']} | {r['wall']} "
                  f"| {r['writes']} | {r['pointer']} | {r['residue']} |")
    for leg in legs:
        tot = {k: sum(r[k] for r in leg["rounds"]) for k in
               ("wall", "writes", "pointer", "residue")}
        print(f"cores={leg['cores']} totals: wall={tot['wall']:.1f} "
              f"writes={tot['writes']:.1f} pointer={tot['pointer']:.2f} "
              f"residue={tot['residue']:.1f}")


if __name__ == "__main__":
    main()
