"""Scaling + recall evidence for the semantic-embedding family.

Two questions the plan claims imply, measured on planted-cluster
embeddings (corpus.clustered_embeddings — intra-cluster cos ≈ 0.77,
the regime real document embeddings live in):

1. **Wall growth at 10× vectors** for `semdedup` (IVF assign →
   within-cell pairs → components) and `pq_encode`/`pq_topk` — the
   cluster-then-compare and broadcast-LUT designs predict near-linear.
2. **SemDeDup recall**: within-cell pairing misses pairs whose members
   quantize into different cells. Reported = fraction of brute-force
   cos≥thr pairs the within-cell join finds, at the contract's seeded
   codebook and at a k-means codebook (the production path) — the
   cluster-boundary loss is the documented trade for never going N².

Usage: python tools/semdedup_scaling.py [n_big] — one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.functions import similarity as SIM
from distributed_crawl_spark.session import build_session


def pair_set(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def main() -> None:
    n_big = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    thr = 0.7
    spark = build_session(app_name="semdedup-scaling")

    sizes = {"small": n_big // 10, "big": n_big}
    dirs = {}
    for name, n in sizes.items():
        d = f"/tmp/emb_scale_{n}"
        corpus.clustered_embeddings(
            spark, n_vectors=n, n_clusters=max(20, n // 250)
        ).write.mode("overwrite").parquet(d)
        dirs[name] = d

    def run(fn):
        out = {}
        for name, d in dirs.items():
            emb = spark.read.parquet(d)
            fn(emb).write.format("noop").mode("overwrite").save()  # warm
            walls = []
            for _ in range(3):
                t0 = time.monotonic()
                fn(emb).write.format("noop").mode("overwrite").save()
                walls.append(time.monotonic() - t0)
            out[name] = round(sorted(walls)[1], 2)
        return out

    n_cells_for = {name: max(32, n // 100) for name, n in sizes.items()}
    walls = {
        "semdedup": run(lambda e: SIM.semdedup(
            e, n_cells=max(32, e.count() // 100), threshold=thr)),
        "pq_encode": run(lambda e: SIM.pq_encode(e)),
        "pq_topk": run(lambda e: SIM.pq_topk(
            e, e.filter(F.col("vec_id") < 10), k=5)),
    }

    # recall on the SMALL corpus (brute force is O(n^2) — evidence tier)
    emb = spark.read.parquet(dirs["small"])
    truth = pair_set(
        SIM.embedding_near_dup_pairs(emb, threshold=thr).select(
            "id_a", "id_b")
    )
    recall = {}
    for cb_name, cb in (
        ("seeded", SIM.seed_centroids(emb, n_cells_for["small"])),
        ("kmeans", SIM.kmeans_codebook(
            emb, n_cells=32, n_iters=4, dim=64)),
    ):
        sd = SIM.semdedup(emb, threshold=thr, centroids=cb)
        # pairs found = non-keep rows grouped to components; recount via
        # the same within-cell pair join semdedup uses
        assigned = SIM.ivf_assign(emb, cb, nprobe=1)
        a = assigned.select(F.col("vec_id").alias("id_a"),
                            F.col("v").alias("va"), "cell_id")
        b = assigned.select(F.col("vec_id").alias("id_b"),
                            F.col("v").alias("vb"), "cell_id")
        found = pair_set(
            a.join(b, "cell_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", SIM.cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= thr)
            .select("id_a", "id_b")
        )
        recall[cb_name] = {
            "truth_pairs": len(truth),
            "found_pairs": len(found & truth),
            "recall": round(len(found & truth) / max(len(truth), 1), 3),
            "dropped_docs": sd.filter(~F.col("keep")).count(),
        }

    out = {
        "metric": "semdedup_scaling_and_recall",
        "n_big": n_big,
        "threshold": thr,
        "walls": {
            q: {**w, "ratio": round(w["big"] / w["small"], 2)}
            for q, w in walls.items()
        },
        "recall_small": recall,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
