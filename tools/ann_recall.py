"""Measure recall@k of the LSH ANN tiers vs the exact brute-force baseline
on the real embeddings table (documents the planes/tables tradeoff in
BENCH.md).

Usage: python tools/ann_recall.py [sf_dir|clustered] [k]

``clustered`` swaps the i.i.d.-gaussian testdata for the planted-cluster
corpus (corpus.clustered_embeddings — neighbors at cos ≈ 0.77), the
regime real document embeddings live in. Preset guidance in
similarity.LSH_PRESETS is validated against BOTH.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from distributed_crawl_spark.functions import similarity as SIM  # noqa: E402
from distributed_crawl_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_queries = 50

    spark = build_session("ann-recall", cores=8, shuffle_partitions=8)
    if sf_dir == "clustered":
        from distributed_crawl_spark import corpus

        path = "/tmp/clustered_embeddings.parquet"
        corpus.clustered_embeddings(spark, 500).write.mode(
            "overwrite"
        ).parquet(path)
        emb = spark.read.parquet(path)
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < n_queries)

    def truth():
        got: dict[int, set[int]] = {}
        for r in SIM.brute_force_topk(emb, queries, k=k).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return got

    exact = truth()
    denom = sum(len(v) for v in exact.values())
    print(f"sf_dir={sf_dir} n_vectors={emb.count()} queries={len(exact)} k={k}")

    for n_planes in (8, 6, 4):
        for n_tables in (1, 2, 4, 8):
            got: dict[int, set[int]] = {q: set() for q in exact}
            n_cand = 0
            rows = SIM.lsh_topk(
                emb, queries, k=k, n_planes=n_planes, n_tables=n_tables
            ).collect()
            for r in rows:
                got[r.query_id].add(r.vec_id)
                n_cand += 1
            hit = sum(len(got[q] & exact[q]) for q in exact)
            print(
                f"planes={n_planes} tables={n_tables} "
                f"recall@{k}={hit / denom:.3f} returned={n_cand}"
            )

    # IVF: seeded-sample codebook vs k-means-trained, equal nprobe
    trained = SIM.kmeans_codebook(emb, n_cells=32, n_iters=5)
    seeded = SIM.seed_centroids(emb, 32)
    for cb_name, cb in (("seeded", seeded), ("kmeans", trained)):
        for nprobe in (1, 2, 4, 8):
            got = {q: set() for q in exact}
            rows = SIM.ivf_topk(
                emb, queries, k=k, n_cells=32, nprobe=nprobe, centroids=cb
            ).collect()
            for r in rows:
                got[r.query_id].add(r.vec_id)
            hit = sum(len(got[q] & exact[q]) for q in exact)
            print(
                f"ivf codebook={cb_name} nprobe={nprobe} "
                f"recall@{k}={hit / denom:.3f}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
