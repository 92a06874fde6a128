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


# Spark simpleString dtype -> DuckDB type names that hash identically on the
# driver side.  The driver stringifies values after a pandas round-trip, so
# the whole int64-and-under family collapses to the same hash — but DuckDB
# HUGEINT (int128, what an uncast integer sum() returns) converts to float64
# and hashes differently even when numerically equal.  This gate must reject
# exactly what the driver rejects: HUGEINT against any Spark integer type.
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
         "UTINYINT", "USMALLINT", "UINTEGER"}
_DTYPE_OK = {
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "binary": {"BLOB"},
}


def dtype_mismatches(scols, sdtypes, dcols, dtypes_duck):
    """Return [(col, spark_type, duck_type)] where the oracle's DuckDB column
    type would hash differently from the Spark column type."""
    sm = {c.lower(): t for c, t in zip(scols, sdtypes)}
    dm = {c.lower(): str(t) for c, t in zip(dcols, dtypes_duck)}
    bad = []
    for c, st in sm.items():
        dt = dm.get(c)
        if dt is None:
            continue
        ok = _DTYPE_OK.get(st)
        if st.startswith(("array", "struct", "map", "decimal")):
            continue  # nested/decimal: values-only compare (driver stringifies)
        if ok is not None and dt.upper() not in ok:
            bad.append((c, st, dt))
    return bad


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
        bad = dtype_mismatches(scols, [t for _, t in sdf.dtypes], dcols, rel.types)
        if bad:
            print(f"FAIL {name}: dtype mismatch {bad}")
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
