"""O(increment) evidence for incremental_dedup: probe wall vs corpus size.

The continual-crawl claim (functions/dedup.py:dedup_index /
incremental_dedup) is that deduplicating a fixed daily increment against
an existing corpus costs O(|increment| + index partitions touched) — the
corpus is probed through its membership index, never re-read or
re-shuffled. This tool measures exactly that: the SAME 500-doc increment
probed against the index of a 5k-doc corpus and a 50k-doc corpus (both
from tools/dedup_scaling.build_corpus, so only N varies). The index is
built and WRITTEN once per corpus (the once-per-snapshot cost, untimed —
that step is O(corpus) by design); the timed region is reading the index
parquet + the two left-semi probes, the operation that recurs daily.

A flat-ish wall at 10x corpus is the pass; linear growth would mean the
probe secretly re-shuffles the corpus.

Usage: python tools/incr_dedup_scaling.py [n_docs_big] — one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributed_crawl_spark.functions import dedup as DD
from distributed_crawl_spark.session import build_session
from dedup_scaling import build_corpus


def main() -> None:
    n_big = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = build_session(app_name="incr-dedup-scaling")

    dirs = {
        "small": build_corpus(spark, n_big // 10, "/tmp/incr_corpus_1x"),
        "big": build_corpus(spark, n_big, "/tmp/incr_corpus_10x"),
    }
    # the fixed increment: 250 novel docs (disjoint id range) + 250
    # exact re-crawls of corpus docs (ids 0..249, present in BOTH corpus
    # sizes) — so the probe exercises hits and misses alike and the
    # kept count has a known expectation (~250)
    nov_dir = build_corpus(spark, 250, "/tmp/incr_inc_novel",
                           id_offset=10_000_000)
    dup_dir = build_corpus(spark, 250, "/tmp/incr_inc_dup")
    inc = (
        spark.read.parquet(f"{nov_dir}/documents.parquet")
        .unionByName(spark.read.parquet(f"{dup_dir}/documents.parquet"))
    )

    idx_paths = {}
    index_rows = {}
    for k, d in dirs.items():  # snapshot cost, untimed: once per corpus
        corpus = spark.read.parquet(f"{d}/documents.parquet")
        p = f"/tmp/incr_index_{k}.parquet"
        DD.dedup_index(corpus).write.mode("overwrite").parquet(p)
        idx_paths[k] = p
        index_rows[k] = spark.read.parquet(p).count()

    walls: dict[str, list[float]] = {k: [] for k in dirs}
    flags: dict[str, dict] = {}
    for k in dirs:  # warmup
        flags[k] = (
            DD.incremental_dedup(inc, spark.read.parquet(idx_paths[k]))
            .groupBy("exact_dup", "near_dup").count().count()
        )
    for _ in range(3):
        for k in dirs:
            t0 = time.monotonic()
            n = DD.incremental_dedup(
                inc, spark.read.parquet(idx_paths[k])
            ).filter("keep").count()
            walls[k].append(time.monotonic() - t0)
            flags[k] = n

    med = lambda xs: sorted(xs)[len(xs) // 2]
    w1, w10 = med(walls["small"]), med(walls["big"])
    print(json.dumps({
        "metric": "incremental_dedup_corpus_scaling",
        "n_increment": 500,
        "corpus_small": n_big // 10,
        "corpus_big": n_big,
        "index_rows": index_rows,
        "kept_small": flags["small"],
        "kept_big": flags["big"],
        "probe_sec_small": round(w1, 3),
        "probe_sec_big": round(w10, 3),
        "ratio_at_10x_corpus": round(w10 / w1, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
