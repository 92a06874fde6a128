"""Seed-list sources (SURVEY.md §2.1 S1/S2).

S1 — URL-list scan (hybrid_crawler.py:839-841): one URL per line,
blank lines dropped.

S2 — CSV seed import (hybrid_crawler.py:204-293): dialect-sniffed CSV,
case-insensitive column-alias resolution with whitespace-cleaned headers,
per-cell trim, empty-URL rows skipped, ``https://`` scheme defaulted, and
a per-row ``unique_id``:

    given id column value            if present and non-empty
    sha1(trim(lat)+trim(long))[:12]  elif lat AND long non-empty
    sha1(url)[:12]                   otherwise (url AFTER scheme default)

All derivations are native Spark SQL expressions (sha1/concat/when);
only dialect sniffing is driver-side (over the first line, mirroring the
reference's ``csv.Sniffer`` over the file head).

File-order ``seq`` is assigned DISTRIBUTED (a 10^10-seed bootstrap must
not funnel through one task): every row is keyed by its file chunk
(``_metadata.file_path``, ``_metadata.file_block_start``) plus an
in-scan-partition id; chunk row-counts — one row per ~128 MB input
split, metadata-sized — are cumulated into per-chunk offsets, and
``seq = chunk_offset + rank_within_chunk``. The only global ordering
happens over the chunk-count aggregate, never over the seed rows
themselves.
"""

from __future__ import annotations

import csv as _csv

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import url as U

URL_ALIASES = ("site", "url", "website")
LAT_ALIASES = ("lat", "latitude")
LONG_ALIASES = ("long", "lng", "longitude")
ID_ALIASES = ("uniqueid", "unique_id", "id")


_ORDER_COLS = ["_fp", "_bs", "_mid"]


def _with_order_cols(scan: DataFrame) -> DataFrame:
    """Attach file-order key columns to a file-source scan: the row's input
    chunk identity (file path + block start) and an id that increases with
    read order inside a scan partition (each chunk lives wholly inside one
    scan partition, so it also increases within the chunk)."""
    return scan.select(
        "*",
        F.col("_metadata.file_path").alias("_fp"),
        F.col("_metadata.file_block_start").alias("_bs"),
        F.monotonically_increasing_id().alias("_mid"),
    )


def _attach_file_order_seq(df: DataFrame) -> DataFrame:
    """Distributed zipWithIndex in file order.

    Per-chunk row counts are cumulated into starting offsets (the global
    window here runs over ONE ROW PER INPUT CHUNK — metadata-sized, ~800k
    rows for a 100 TB seed list — never over the seeds), broadcast back,
    and each row's seq = its chunk offset + its rank within the chunk.
    The rank window is partitioned by chunk, so the seed rows themselves
    never pass through a single-task exchange."""
    chunks = df.groupBy("_fp", "_bs").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_fp", "_bs").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = chunks.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).drop("_n")
    w_rn = Window.partitionBy("_fp", "_bs").orderBy("_mid")
    return (
        df.join(F.broadcast(offsets), ["_fp", "_bs"])
        .withColumn(
            "seq", (F.col("_off") + F.row_number().over(w_rn) - 1).cast("long")
        )
        .drop(*_ORDER_COLS, "_off")
    )


def load_url_list(spark: SparkSession, path: str) -> DataFrame:
    """S1: one URL per line → (url, seq). seq = file order."""
    lines = _with_order_cols(spark.read.text(path)).select(
        F.trim("value").alias("url"), *_ORDER_COLS
    )
    return _attach_file_order_seq(lines.filter(F.length("url") > 0))


def _resolve(fieldnames: list[str]) -> dict[str, str | None]:
    """Case-insensitive alias resolution over whitespace-cleaned headers
    (hybrid_crawler.py:218-237). Last alias match wins, like the
    reference's for-loop."""
    out: dict[str, str | None] = {"url": None, "lat": None, "long": None, "id": None}
    for field in fieldnames:
        fl = field.strip().lower()
        if fl in URL_ALIASES:
            out["url"] = field
        elif fl in LAT_ALIASES:
            out["lat"] = field
        elif fl in LONG_ALIASES:
            out["long"] = field
        elif fl in ID_ALIASES:
            out["id"] = field
    return out


def _sniff_delimiter(spark: SparkSession, path: str) -> str:
    head = spark.read.text(path).limit(1).collect()
    if not head:
        raise ValueError(f"empty CSV: {path}")
    try:
        return _csv.Sniffer().sniff(head[0].value).delimiter
    except _csv.Error:
        return ","


def load_seed_csv(
    spark: SparkSession, path: str, delimiter: str | None = None
) -> DataFrame:
    """S2: CSV → (url, unique_id, lat, long, seq, + original columns).

    ``url`` is scheme-defaulted; ``unique_id`` follows the reference's
    three-way precedence; every original column survives (the reference's
    ``csv_data`` row dict becomes plain columns, joined back to the
    frontier later as J1).
    """
    sep = delimiter or _sniff_delimiter(spark, path)
    raw0 = spark.read.option("header", True).option("sep", sep).csv(path)
    orig_cols = raw0.columns
    raw = _with_order_cols(raw0)
    cols = _resolve(orig_cols)
    if cols["url"] is None:
        raise ValueError("CSV must contain a 'site' or 'url' column")

    # per-cell trim of every string column (reference cleans the whole row)
    df = raw.select(
        *[F.trim(F.col(f"`{c}`")).alias(c.strip()) for c in orig_cols],
        *_ORDER_COLS,
    )
    urlc = F.col(f"`{cols['url'].strip()}`")
    df = df.filter(urlc.isNotNull() & (urlc != "")).withColumn(
        "url", U.ensure_scheme(urlc)
    )

    given = (
        F.trim(F.col(f"`{cols['id'].strip()}`")) if cols["id"] else F.lit("")
    )
    if cols["lat"] and cols["long"]:
        lat = F.coalesce(F.trim(F.col(f"`{cols['lat'].strip()}`")), F.lit(""))
        long = F.coalesce(F.trim(F.col(f"`{cols['long'].strip()}`")), F.lit(""))
        from_coords = F.when(
            (lat != "") & (long != ""), U.unique_id_from_latlong(lat, long)
        )
    else:
        from_coords = F.lit(None).cast("string")

    uid = F.when(given != "", given).otherwise(
        F.coalesce(from_coords, U.unique_id_from_url(F.col("url")))
    )
    return _attach_file_order_seq(df.withColumn("unique_id", uid))
