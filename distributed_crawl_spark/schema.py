"""Explicit StructTypes for every table in the engine.

The reference is schemaless Python dicts (SURVEY.md §1); here every table
is a fixed-schema columnar relation. The ``pages`` schema is the driver's
input contract (BASELINE.json ``input_hint``): Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``.

Reference shapes these formalize:
- frontier   ← ``pending_urls`` FIFO + ``CrawlStatus`` (run_crawl_local.py:27-39,68)
- url_seen   ← ``crawl_status`` dict keys, the dedup set (run_crawl_local.py:69,165)
- crawl_results ← ``crawl_results`` dict (run_crawl_local.py:70,225)
- round_metrics ← session counters (hybrid_crawler.py:71-78)
- errors     ← ``error_urls.txt`` sink (hybrid_crawler.py:688-709)
- seeds      ← CSV import (hybrid_crawler.py:204-293)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- input contract -------------------------------------------------------

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# --- frontier state -------------------------------------------------------
# Priority contract (SURVEY.md §2.10): deterministic crawl order is the
# lexicographic sort (level, attempt, parent_seq, link_pos). ``seq`` is a
# sparse monotone key derived from (parent_seq, link_pos) — dense global
# ordering is never materialized at scale (that would be a single-partition
# sort); it is only an ORDER BY inside per-host windows.

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),  # raw form = dedup key (F6/D2)
        StructField("host", StringType(), True),
        StructField("level", IntegerType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("parent_url", StringType(), True),
        StructField("parent_seq", LongType(), False),
        StructField("link_pos", IntegerType(), False),
        StructField("seq", LongType(), False),
        StructField("discovered_round", IntegerType(), False),
    ]
)

URL_SEEN_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),  # raw string — equality key
        StructField("url_hash", LongType(), False),  # xxhash64(url) for bucketing
        StructField("status", StringType(), False),  # pending|completed|failed
        StructField("level", IntegerType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("parent_url", StringType(), True),
        StructField("discovered_round", IntegerType(), False),
        StructField("seq", LongType(), False),
    ]
)

CRAWL_RESULTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("level", IntegerType(), False),
        StructField("round", IntegerType(), False),
        StructField("text", StringType(), True),
        StructField("md_hash", StringType(), True),  # sha256(text)[:16]
        StructField("page_slug", StringType(), True),
        StructField("filename", StringType(), True),
        StructField("method", StringType(), True),
        StructField("status_code", IntegerType(), True),
        StructField("content_length", LongType(), True),
        StructField("last_modified", TimestampType(), True),
        StructField("extracted_links", ArrayType(StringType()), True),
        StructField("geo_blocked", StringType(), True),  # 'true'/'false' tag
    ]
)

ROUND_METRICS_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("urls_seen", LongType(), False),
        StructField("fetched", LongType(), False),
        StructField("failed", LongType(), False),
        StructField("deduped", LongType(), False),
        StructField("deferred_by_politeness", LongType(), False),
        StructField("robots_denied", LongType(), False),
        StructField("geo_blocked_skipped", LongType(), False),
        StructField("new_frontier", LongType(), False),
        # dup-content rows withheld from the crawl_results append (D3
        # storage parity; 0 unless CrawlConfig.content_dedup and in
        # histories written before round 4)
        StructField("content_deduped", LongType(), False),
        # noindex pages withheld from storage (0 unless honor_noindex and
        # in histories written before round 4)
        StructField("noindex_skipped", LongType(), False),
        StructField("seconds", DoubleType(), False),  # round wall time (A6)
        # next-frontier size from the same Observations (drain check runs
        # no count job); 0 in histories written before round 3
        StructField("frontier_size", LongType(), False),
    ]
)

ERRORS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("round", IntegerType(), False),
        StructField("reason", StringType(), True),
        StructField("error", StringType(), True),
        StructField("preview", StringType(), True),  # first 200 chars (R2)
    ]
)

SEEDS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("unique_id", StringType(), True),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("robots_txt", StringType(), True),
        StructField("crawl_delay", StringType(), True),
    ]
)
