"""Median-of-3 noop-write walls for named contract queries — the
per-operator wall protocol of BENCH.md's session tables (one JVM, one
untimed warmup pass per query, then three timed noop writes, median).

Usage: python tools/walls.py SF_DIR CORES Q1 [Q2 ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir, cores, *names = sys.argv[1:]

    from distributed_crawl_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(app_name="walls", cores=int(cores),
                          shuffle_partitions=int(cores))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for q in names:
        qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            qs[q](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        rows = qs[q](spark, sf_dir).count()
        out[q] = {"wall_s": round(statistics.median(walls), 3),
                  "rows": rows,
                  "all": [round(w, 3) for w in walls]}
    print(json.dumps({"sf_dir": sf_dir, "cores": int(cores),
                      "walls": out}))
    spark.stop()


if __name__ == "__main__":
    main()
