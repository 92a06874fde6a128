"""sf1-scale headline evidence (VERDICT r4 #6): run the crawl loop at
sf1 (20M pages — 10x the sf0.1 bench) and the five most expensive
contract queries on an sf1-shaped documents table (50k docs — 10x
sf0.1's 5,000), and report walls, sf0.1→sf1 ratios, and the JVM's peak
RSS. The documents twin comes from tools/dedup_scaling.build_corpus —
the same generator the 10x dedup probes use (sf0.1's own vocabulary,
length band, source/lang cardinalities, ~10% planted near-dups), so
only N differs from the driver testdata.

Usage:
  python tools/sf1_bench.py queries   # 5-query walls at sf0.1 vs sf1
  python tools/sf1_bench.py crawl     # 20M-page crawl (generates the
                                      # bucketed cache on first run)
One JSON line per phase.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
QUERIES = [
    "train_corpus_full",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "top_ngrams",
    "incremental_dedup",
]


def jvm_peak_rss_gb() -> float | None:
    """VmHWM of the local[32] executor JVM (the only java child)."""
    try:
        pids = subprocess.run(
            ["pgrep", "-f", "java"], capture_output=True, text=True
        ).stdout.split()
        peak = 0
        for pid in pids:
            for line in open(f"/proc/{pid}/status"):
                if line.startswith("VmHWM"):
                    peak = max(peak, int(line.split()[1]))
        return round(peak / 1024 / 1024, 2) if peak else None
    except Exception:
        return None


def phase_queries() -> None:
    from distributed_crawl_spark.session import build_session
    from dedup_scaling import build_corpus  # same dir

    spark = build_session(app_name="sf1-bench", cores=32,
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{SF1}/documents.parquet"):
        build_corpus(spark, 50_000, SF1)

    import __spark_entry__ as entry

    qs = entry.queries()
    walls: dict[str, dict[str, list[float]]] = {
        q: {"sf01": [], "sf1": []} for q in QUERIES
    }
    rows: dict[str, dict[str, int]] = {q: {} for q in QUERIES}
    for q in QUERIES:  # warmup, and row counts once
        rows[q]["sf01"] = qs[q](spark, SF01).count()
    for _ in range(3):
        for q in QUERIES:
            t0 = time.monotonic()
            qs[q](spark, SF01).write.format("noop").mode("overwrite").save()
            walls[q]["sf01"].append(time.monotonic() - t0)
            t0 = time.monotonic()
            rows[q]["sf1"] = qs[q](spark, SF1).count()
            walls[q]["sf1"].append(time.monotonic() - t0)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {"metric": "sf1_queries", "n_docs": 50_000, "queries": {}}
    for q in QUERIES:
        w1, w10 = med(walls[q]["sf01"]), med(walls[q]["sf1"])
        out["queries"][q] = {
            "sf01_sec": round(w1, 2),
            "sf1_sec": round(w10, 2),
            "ratio": round(w10 / w1, 2),
            "rows_sf01": rows[q]["sf01"],
            "rows_sf1": rows[q]["sf1"],
        }
    out["jvm_peak_rss_gb"] = jvm_peak_rss_gb()
    print(json.dumps(out), flush=True)
    spark.stop()


def phase_crawl() -> None:
    from distributed_crawl_spark.session import build_session
    import bench

    spark = build_session(app_name="sf1-crawl", cores=32,
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    crawl = bench.run_crawl(spark, sf=1.0, cpus=32)
    crawl["jvm_peak_rss_gb"] = jvm_peak_rss_gb()
    print(json.dumps({"metric": "sf1_crawl", **crawl}), flush=True)
    spark.stop()


if __name__ == "__main__":
    {"queries": phase_queries, "crawl": phase_crawl}[sys.argv[1]]()
