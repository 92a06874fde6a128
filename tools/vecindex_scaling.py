"""O(increment) evidence for the persisted vector index (mirror of
tools/incr_dedup_scaling.py): add a FIXED 1k-vector increment to an
index of 2k vs 20k clustered vectors — the add wall must be flat in
index size (the increment encodes against broadcast quantizers and
appends its own partitions; corpus codes are never read). Also times
the nprobe=4 search for 50 queries at both index sizes (candidate
volume grows with cell occupancy, so search scales ~linearly in
corpus/K — reported for honesty, the FLAT claim is the add path).
Interleaved medians of 3. One JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.functions import vecindex as VX
from distributed_crawl_spark.session import build_session


def main() -> None:
    spark = build_session(app_name="vecindex-scaling")
    small = corpus.clustered_embeddings(spark, 2_000).localCheckpoint()
    big = corpus.clustered_embeddings(spark, 20_000).localCheckpoint()
    # the increment: 1k fresh ids beyond both corpora
    inc = (
        corpus.clustered_embeddings(spark, 21_000)
        .filter(F.col("vec_id") >= 20_000)
        .localCheckpoint()
    )

    paths = {"small": "/tmp/vecidx_scale_small", "big": "/tmp/vecidx_scale_big"}
    build_s, n_codes = {}, {}
    for name, src in [("small", small), ("big", big)]:
        shutil.rmtree(paths[name], ignore_errors=True)
        t0 = time.monotonic()
        VX.write_vector_index(src, paths[name], n_cells=32, m=8, n_codes=16)
        build_s[name] = round(time.monotonic() - t0, 2)

    idx = {n: VX.read_vector_index(spark, p) for n, p in paths.items()}
    queries = small.filter(F.col("vec_id") < 50)
    add_s: dict[str, list[float]] = {"small": [], "big": []}
    search_s: dict[str, list[float]] = {"small": [], "big": []}
    for _ in range(3):
        for name in ("small", "big"):
            t0 = time.monotonic()
            VX.add_to_vector_index(spark, paths[name], inc)
            add_s[name].append(time.monotonic() - t0)
            t0 = time.monotonic()
            VX.vector_index_topk(idx[name], queries, k=5, nprobe=4).write \
                .format("noop").mode("overwrite").save()
            search_s[name].append(time.monotonic() - t0)
        # drop the appended increment so every round adds to the same base
        for name in ("small", "big"):
            shutil.rmtree(paths[name], ignore_errors=True)
        for name, src in [("small", small), ("big", big)]:
            VX.write_vector_index(src, paths[name], n_cells=32, m=8,
                                  n_codes=16)
        idx = {n: VX.read_vector_index(spark, p) for n, p in paths.items()}
        n_codes[name] = idx["big"].codes.count()

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {
        "metric": "vecindex_scaling_10x",
        "build_s": build_s,
        "add_1k_s": {n: round(med(v), 2) for n, v in add_s.items()},
        "add_ratio": round(med(add_s["big"]) / med(add_s["small"]), 2),
        "search_s": {n: round(med(v), 2) for n, v in search_s.items()},
        "search_ratio": round(
            med(search_s["big"]) / med(search_s["small"]), 2
        ),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
