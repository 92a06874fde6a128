"""SparkSession builders tuned for this engine.

Local testing runs a single JVM (``local[N]``); production is
``spark-submit --py-files`` on a multi-executor cluster — every setting
here is chosen to survive that transition (AQE on, explicit shuffle
partitioning, Arrow for every pandas UDF exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "distributed_crawl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``.  Shuffle partitions default to the core
    count: at 100 TB on a real cluster the round driver overrides this per
    stage via AQE coalescing, so the static value only matters locally.
    """
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning — coalesce post-shuffle partitions,
        # convert to broadcast joins late, split skewed partitions. This is
        # the backstop behind our explicit host-salting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow is the only sanctioned Python boundary (vectorized UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # UTC so parquet timestamps round-trip identically with DuckDB.
        .config("spark.sql.session.timeZone", "UTC")
        # Quieter local runs.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # keep catalog artifacts out of the repo/cwd (bucketed bench tables
        # are external — only metadata lives in the in-memory catalog)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark_graft_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
