"""K3 — partitioned results layout with reference-compatible object keys.

The reference uploads one markdown object per page at
``markdown/{page_slug}/{md_hash}_{page_slug}_{timestamp}.md`` with
url/hash/slug metadata (webcrawleranalyzer.py:462-491). One object per
page does not survive 100 TB (10^10 PUTs, unreadable listings), so the
engine's durable layout is a *partitioned parquet export*:

    {path}/host_bucket=<pmod(xxhash64(url), n_buckets)>/round=<n>/...

Downstream consumers prune by host bucket and crawl round at the storage
layer (partition pruning — no scan), and every row carries ``s3_key``,
the exact key the reference would have used, plus the reference's object
metadata as columns — so a consumer of the reference's bucket layout can
switch addressing without re-deriving anything.

``export_markdown_tree`` writes the literal reference file tree (one .md
per row) for small/debug exports — driver-side by definition; the
partitioned parquet export is the scale path.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def s3_key(page_slug: Column, md_hash: Column, ts: str) -> Column:
    """markdown/{slug}/{hash}_{slug}_{ts}.md (webcrawleranalyzer.py:469)."""
    return F.concat(
        F.lit("markdown/"), page_slug, F.lit("/"),
        md_hash, F.lit("_"), page_slug, F.lit("_"), F.lit(ts), F.lit(".md"),
    )


def with_layout_columns(results: DataFrame, ts: str,
                        n_buckets: int = 64) -> DataFrame:
    """Attach host_bucket, s3_key and the reference's object-metadata
    columns (original_url / md_hash / page_slug / crawled_at) to a
    ``driver.results()`` frame. All derivations are codegen projections."""
    return (
        results.withColumn(
            "host_bucket",
            F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"),
        )
        .withColumn("s3_key", s3_key(F.col("page_slug"), F.col("md_hash"), ts))
        .withColumn("original_url", F.col("url"))
        .withColumn("crawled_at", F.lit(ts))
    )


def export_results_layout(results: DataFrame, path: str, ts: str,
                          n_buckets: int = 64) -> None:
    """Write the (host_bucket, round)-partitioned parquet layout. Appends —
    re-export of a later round adds its partitions without rewriting
    earlier ones (the Iceberg-append analog)."""
    (
        with_layout_columns(results, ts, n_buckets)
        .write.mode("append")
        .partitionBy("host_bucket", "round")
        .parquet(path)
    )


def export_markdown_tree(results: DataFrame, root: str, ts: str) -> int:
    """Debug/small-export parity: materialize the reference's literal file
    tree, one ``.md`` per completed page. Collects — use only for bounded
    result sets (the partitioned parquet export is the scale path).
    Returns the number of files written."""
    rows = (
        with_layout_columns(results, ts)
        .filter(F.col("md_hash").isNotNull())
        .select("s3_key", "text")
        .collect()
    )
    rootp = Path(root)
    for r in rows:
        p = rootp / r.s3_key
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(r.text or "")
    return len(rows)
