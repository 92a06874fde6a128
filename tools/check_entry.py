"""Local twin of the driver's correctness gate: runs every __spark_entry__
query on Spark AND its DuckDB oracle at the given sf dir, compares
row-count, column names, and order-insensitive values.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = dict(zip(cols, row))
        norm = []
        for c in sorted(cols):
            v = vals[c]
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            elif v is not None and type(v).__name__ in ("datetime", "Timestamp", "date"):
                v = str(v)
            norm.append(v)
        out.append(tuple(norm))
    out.sort(key=repr)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", __import__("os").environ.get("CHECK_TZ", "UTC"))
        .config("spark.driver.memory", "8g")
        .appName("check_entry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} spark rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        if ns != nd:
            diffs = [(a, b) for a, b in zip(ns, nd) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(ns)} rows differ; first: "
                  f"\n  spark={diffs[0][0]}\n  duck ={diffs[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
