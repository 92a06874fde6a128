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


def load_url_list(spark: SparkSession, path: str) -> DataFrame:
    """S1: one URL per line → (url, seq). seq = file order."""
    lines = spark.read.text(path).select(F.trim("value").alias("url"))
    w = Window.orderBy(F.monotonically_increasing_id())
    return (
        lines.filter(F.length("url") > 0)
        .withColumn("seq", F.row_number().over(w).cast("long") - 1)
    )


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
    raw = spark.read.option("header", True).option("sep", sep).csv(path)
    cols = _resolve(raw.columns)
    if cols["url"] is None:
        raise ValueError("CSV must contain a 'site' or 'url' column")

    # per-cell trim of every string column (reference cleans the whole row)
    df = raw.select(
        *[F.trim(F.col(f"`{c}`")).alias(c.strip()) for c in raw.columns]
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
    w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn("unique_id", uid).withColumn(
        "seq", F.row_number().over(w).cast("long") - 1
    )
