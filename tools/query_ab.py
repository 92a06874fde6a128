"""One leg of an r{N}-commit-vs-HEAD query A/B: run the named contract
queries once each from the GIVEN checkout in a fresh JVM and print one
JSON line of walls. The caller interleaves legs (checkoutA, checkoutB,
checkoutA, ...) within one session so both sides sample the same VM
phase — the protocol BENCH.md's crawl-wall control used, applied at
query granularity (VERDICT r4 "What's wrong #2").

Usage: python tools/query_ab.py CHECKOUT_DIR SF_DIR Q1 [Q2 ...]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    checkout, sf_dir, *names = sys.argv[1:]
    sys.path.insert(0, checkout)

    from distributed_crawl_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(app_name="query-ab")
    qs = entry.queries()
    walls = {}
    for q in names:  # warmup pass amortizes scan/codegen caches equally
        qs[q](spark, sf_dir).count()
    for q in names:
        t0 = time.monotonic()
        qs[q](spark, sf_dir).count()
        walls[q] = round(time.monotonic() - t0, 3)
    print(json.dumps({"checkout": checkout, "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
