"""Scaling evidence for the two bitext miners: the exact broadcast
miner is quadratic BY DEFINITION (every margin scores the whole other
shard), the IVF-shortlist miner is the scale path — with the coarse
quantizer sized to the corpus (n_cells ∝ N, the standard IVF sizing,
so per-query candidate volume stays flat), its wall grows ~linearly in
the shard size. Probes: exact at 1k vs 2k total vectors (4x pairs),
IVF at 1k vs 10k (10x rows, n_cells 32 -> 320). Interleaved medians
of 3. One JSON line.
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


def _halves(df):
    return (df.filter(F.col("vec_id") % 2 == 0),
            df.filter(F.col("vec_id") % 2 == 1))


def main() -> None:
    spark = build_session(app_name="bitext-scaling")
    vecs = {
        "1k": corpus.clustered_embeddings(spark, 1_000).localCheckpoint(),
        "2k": corpus.clustered_embeddings(spark, 2_000).localCheckpoint(),
        "10k": corpus.clustered_embeddings(spark, 10_000).localCheckpoint(),
    }
    cells = {"1k": 32, "2k": 64, "10k": 320}
    walls: dict[str, list[float]] = {
        "exact_1k": [], "exact_2k": [], "ivf_1k": [], "ivf_10k": [],
    }
    mined: dict[str, int] = {}
    for _ in range(3):
        for name, size in [("exact_1k", "1k"), ("exact_2k", "2k")]:
            s, t = _halves(vecs[size])
            t0 = time.monotonic()
            out = SIM.bitext_mine(s, t, k=4)
            mined[name] = out.filter("mined").count()
            walls[name].append(time.monotonic() - t0)
        for name, size in [("ivf_1k", "1k"), ("ivf_10k", "10k")]:
            s, t = _halves(vecs[size])
            t0 = time.monotonic()
            out = SIM.bitext_mine_ivf(s, t, k=4, shortlist=16,
                                      n_cells=cells[size], nprobe=4)
            mined[name] = out.filter("mined").count()
            walls[name].append(time.monotonic() - t0)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {
        "metric": "bitext_scaling",
        "walls_s": {n: round(med(v), 2) for n, v in walls.items()},
        "mined": mined,
        "exact_ratio_4x_pairs": round(
            med(walls["exact_2k"]) / med(walls["exact_1k"]), 2),
        "ivf_ratio_10x_rows": round(
            med(walls["ivf_10k"]) / med(walls["ivf_1k"]), 2),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
