"""Zipf-head evidence for the two-stage per_source_cap.

Generates a deterministic skewed corpus — ONE head source holding ~50%
of all documents, the rest spread uniformly over 1000 tail sources —
then times ``per_source_cap`` with lanes=1 (the old single-window plan:
the head source is one straggler sort task) against the default
two-stage plan (head source sorts as ``lanes`` parallel lane tasks).
Asserts the two plans produce identical output before timing.

Usage: python tools/zipf_cap_bench.py [n_docs] [lanes]
Prints one JSON line consumed into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from distributed_crawl_spark.functions import curation as CU
from distributed_crawl_spark.session import build_session


def make_corpus(spark, n_docs: int, scratch: str):
    """doc_id | source | quality: even ids -> the 'head' source (50% of
    the corpus), odd ids -> 1000 uniform tail sources. Quality is
    PRE-SCORED (a deterministic hash int) and persisted, and the timed
    plans pass ``quality_col='quality'`` — so the measured block is the
    census + window stage(s) alone, not the text-scoring projection
    that used to dominate wall and dilute the stage contrast."""
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("head"))
        .otherwise(F.concat(F.lit("tail-"), F.pmod(F.xxhash64("id"), F.lit(1000))))
        .alias("source"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(10_000))
        .cast("long").alias("quality"),
    )
    docs.write.mode("overwrite").parquet(scratch)
    return spark.read.parquet(scratch)


class StageProbe:
    """Max task duration among stages completed during a measured block,
    via the Spark UI REST API — the direct 'no single straggler task'
    evidence a wall clock can't give when upstream scoring dominates."""

    def __init__(self, spark):
        self.base = spark.sparkContext.uiWebUrl + "/api/v1"
        self.app = self._get("/applications")[0]["id"]

    def _get(self, path):
        with urllib.request.urlopen(self.base + path) as r:
            return json.load(r)

    def stage_ids(self):
        return {s["stageId"] for s in
                self._get(f"/applications/{self.app}/stages?status=complete")}

    def max_task_ms(self, before: set) -> float:
        worst = 0.0
        for sid in self.stage_ids() - before:
            try:
                q = self._get(
                    f"/applications/{self.app}/stages/{sid}/0/taskSummary?quantiles=1.0")
                worst = max(worst, q["duration"][0])
            except Exception:
                pass
        return worst


def time_plan(docs, lane_threshold: int | None, probe: StageProbe,
              k: int = 100) -> tuple[float, float, int]:
    before = probe.stage_ids()
    t0 = time.monotonic()
    n = CU.per_source_cap(docs, k=k, lane_threshold=lane_threshold,
                          quality_col="quality").count()
    wall = time.monotonic() - t0
    return wall, probe.max_task_ms(before), n

SINGLE = None  # default plan: one window, no census (round-5 default)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = build_session(app_name="zipf-cap-bench",
                          extra_conf={"spark.ui.enabled": "true"})
    probe = StageProbe(spark)
    scratch = "/tmp/zipf_cap_corpus"
    docs = make_corpus(spark, n_docs, scratch)

    threshold = max(n_docs // (2 * lanes), 1)

    # Output equivalence first: the two-stage plan must be exact.
    a = CU.per_source_cap(docs, k=100, lane_threshold=SINGLE,
                          quality_col="quality")
    b = CU.per_source_cap(docs, k=100, lane_threshold=threshold,
                          quality_col="quality")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"two-stage output diverged: {diff} rows"

    # Warmup then interleave to cancel VM drift.
    time_plan(docs, threshold, probe)
    results = {"single": [], "staged": []}
    tasks = {"single": [], "staged": []}
    for _ in range(3):
        w1, t1, n1 = time_plan(docs, SINGLE, probe)
        w2, t2, n2 = time_plan(docs, threshold, probe)
        assert n1 == n2
        results["single"].append(w1)
        results["staged"].append(w2)
        tasks["single"].append(t1)
        tasks["staged"].append(t2)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {
        "metric": "zipf_head_source_cap",
        "n_docs": n_docs,
        "head_share": 0.5,
        "k": 100,
        "lanes": lanes,
        "single_window_sec": round(med(results["single"]), 2),
        "two_stage_sec": round(med(results["staged"]), 2),
        "speedup": round(med(results["single"]) / med(results["staged"]), 2),
        "max_task_ms_single": round(med(tasks["single"])),
        "max_task_ms_staged": round(med(tasks["staged"])),
        "rows_identical": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
