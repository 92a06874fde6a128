"""Isolated per-query probe (guide §1.4): same session/build as bench.py,
noop sink, N reps per named query. Usage:
  python bench_extra.py q1 q2 ... [--reps N] [--sf DIR]
Prints one JSON line {query: [sec, ...]}.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=")[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from distributed_crawl_spark.session import build_session
    import __spark_entry__ as entry_mod

    spark = build_session(app_name="bench_extra", cores=cpus,
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # warmup
    qs["url_slug"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for name in args:
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = walls
    print(json.dumps(out))


if __name__ == "__main__":
    main()
