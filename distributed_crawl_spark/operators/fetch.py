"""Fetch = join against the pages table, then extract.

The reference's network fetch (hybrid_crawler.py:322-392 local,
webcrawleranalyzer.py:68-153 Lambda) is reified as an equi join of the
round's selected frontier slice against the Common-Crawl-style pages
table on ``url`` (SURVEY.md §2.1 S4/S5, §2.6 J3): a hit is an HTTP 200
with (html, text, warc_ts); a miss is a 404 that flows into the retry
path (run_crawl_local.py:240-250 semantics).

Column pruning matters here more than anywhere: ``html`` is the fat
column and is read ONLY for selected rows, never during frontier
maintenance — the join projects exactly (url, warc_ts, html) and the
binary bytes go straight into the one Arrow exchange of the extract UDF.

Extraction result columns follow the Lambda response contract
(webcrawleranalyzer.py:667-685): md_hash, last_modified, content_length,
status_code, extracted_links, plus slug/filename (hybrid_crawler.py:295-311)
and the geo-block tag (hybrid_crawler.py:317-320).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import url as U
from ..functions.text import make_extract_udf


def fetch_and_extract(
    selected: DataFrame,
    pages: DataFrame,
    max_links: int | None = 10,
    extract_links: bool = True,
) -> DataFrame:
    """Returns the selected frontier rows with fetch+extract columns:
    ok, status_code, text, md_hash, page_slug, filename, content_length,
    last_modified, extracted_links, geo_blocked, method.
    """
    page_side = pages.select(
        "url",
        F.col("warc_ts").alias("last_modified"),
        "html",
        F.lit(True).alias("page_hit"),
    )
    joined = selected.join(page_side, "url", "left")

    extract = make_extract_udf(max_links=max_links if extract_links else 0)
    ex = (
        joined.withColumn(
            "ex",
            F.when(F.col("html").isNotNull(), extract(F.col("url"), F.col("html"))),
        )
        .drop("html")
        .withColumn("ok", F.coalesce(F.col("page_hit"), F.lit(False)))
        .drop("page_hit")
    )

    text = F.col("ex.text")
    return (
        ex.withColumn("status_code", F.when(F.col("ok"), 200).otherwise(404))
        .withColumn("text", text)
        .withColumn("md_hash", F.when(F.col("ok"), U.content_hash(text)))
        .withColumn("page_slug", U.page_slug(F.col("url")))
        .withColumn(
            "filename",
            U.enhanced_filename(F.lit(None).cast("string"),
                                F.col("md_hash"), F.col("page_slug")),
        )
        .withColumn("content_length", F.length(text).cast("long"))
        .withColumn(
            "extracted_links",
            F.when(F.lit(extract_links), F.col("ex.links")).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .withColumn("geo_blocked", U.is_geo_blocked(text))
        .withColumn("method", F.lit("pages_table_join"))
        .drop("ex")
    )
