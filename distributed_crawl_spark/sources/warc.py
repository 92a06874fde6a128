"""WARC ingestion — the real-world path that populates the pages table.

The reference fetches live HTTP (hybrid_crawler.py:322-392); at 100-TB
scale the equivalent corpus arrives as Common Crawl WARC segments
(ISO 28500), so the engine reads those directly into the exact
``PAGES_SCHEMA`` shape the fetch join consumes.

Scale design — parallelism is PER FILE, by format necessity:
``.warc.gz`` files are concatenations of independently-gzipped records,
which cannot be split at arbitrary byte offsets; the industry-standard
plan (and Common Crawl's own layout: ~1 GB segments, tens of thousands
per crawl) is one task per segment file. ``spark.read.format
("binaryFile")`` gives exactly that: each file's bytes land in one task,
``mapInPandas`` parses records there, and nothing ever reshuffles —
downstream partitioning comes from whatever the caller writes/buckets.
Files stream through Arrow once; a 1 GB segment peaks at ~2× its size
in one executor thread (decompress + parse), the same envelope every
WARC toolchain needs.

Record grammar handled (warc-specs/ISO 28500 §4): version line,
CRLF-terminated named fields, one blank line, ``Content-Length`` payload
bytes, two CRLFs between records. ``response`` records carry an HTTP
message as payload: status line + headers, blank line, body. Multi-
member gzip is detected by magic bytes and inflated member-by-member.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_PAGE_COLUMNS = "url string, warc_ts timestamp, status int, " \
    "content_type string, html binary, warc_file string"


def _inflate(blob: bytes) -> bytes:
    """Concatenated-member gzip → plain bytes (identity for plain warc)."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = io.BytesIO()
    with gzip.open(io.BytesIO(blob), "rb") as fh:
        # gzip module transparently reads across members
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def _parse_warc_ts(value: str) -> datetime | None:
    """WARC-Date (ISO 8601 'YYYY-MM-DDThh:mm:ssZ') → naive UTC datetime
    (TimestampType stores wall-clock; the testdata parquet convention)."""
    try:
        dt = datetime.fromisoformat(value.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def _iter_raw_records(blob: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk one (decompressed) WARC stream: yield (named-fields, payload)
    per record. A malformed tail stops iteration rather than raising —
    truncated segment files are a fact of life at crawl scale; callers
    count rows, not exceptions."""
    data = _inflate(blob)
    pos = 0
    n = len(data)
    while pos < n:
        # --- record header block: up to the first CRLFCRLF ---
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        payload = data[body_start:body_start + length]
        # records are separated by CRLF CRLF after the payload
        pos = body_start + length
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        yield fields, payload


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield dicts for the ``response`` records of one (decompressed)
    WARC stream: url, warc_ts, status, content_type, html (body bytes).

    Pure-bytes parser over the record grammar — no third-party WARC lib
    (none ships in the runtime), and the subset needed for page
    ingestion is ~40 lines. Records that are not ``response`` type, or
    whose payload is not an HTTP message, are skipped.
    """
    for fields, payload in _iter_raw_records(blob):
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri")
        if not url:
            continue
        # --- HTTP message payload: status line, headers, blank, body ---
        http_end = payload.find(b"\r\n\r\n")
        if http_end < 0:
            continue
        http_head = payload[:http_end].decode("utf-8", errors="replace")
        http_lines = http_head.split("\r\n")
        status = None
        parts = http_lines[0].split()
        if len(parts) >= 2 and parts[0].startswith("HTTP/"):
            try:
                status = int(parts[1])
            except ValueError:
                status = None
        content_type = None
        for line in http_lines[1:]:
            k, sep, v = line.partition(":")
            if sep and k.strip().lower() == "content-type":
                content_type = v.strip()
                break
        yield {
            "url": url,
            "warc_ts": _parse_warc_ts(fields.get("warc-date", "")),
            "status": status,
            "content_type": content_type,
            "html": payload[http_end + 4:],
        }


def _parse_warc_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """binaryFile (path, content) batches → page rows; shared by the
    batch and streaming readers."""
    for pdf in batches:
        rows = []
        for fpath, blob in zip(pdf["path"], pdf["content"]):
            for rec in iter_warc_records(bytes(blob)):
                rec["warc_file"] = fpath
                rows.append(rec)
        yield pd.DataFrame(
            rows,
            columns=["url", "warc_ts", "status", "content_type",
                     "html", "warc_file"],
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC segment files → (url, warc_ts, status, content_type, html,
    warc_file), one row per ``response`` record.

    ``path`` is anything binaryFile accepts (dir, glob, single file);
    ``.warc`` and ``.warc.gz`` both work. One task per file (see module
    docstring); records cross into Python once via Arrow and are
    emitted in file order.
    """
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(_parse_warc_batches, WARC_PAGE_COLUMNS)


def stream_warc(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """CONTINUOUS WARC ingestion: segment files landing in ``path``
    become a pages STREAM — the §2.13 twin of :func:`read_warc`, for
    the drop-dir a fetch fleet (or a Common Crawl mirror sync) feeds.
    Parallelism is identical to the batch reader (one task per
    segment; the file is the unit of both gzip decompression and
    micro-batch progress tracking), so a segment is processed exactly
    once across restarts via the streaming checkpoint. Compose with
    ``stream_extract_pages``-style projections or ``foreachBatch`` into
    the crawl driver; ``max_files_per_trigger=1`` gives deterministic
    one-segment batches under ``Trigger.AvailableNow`` for tests."""
    reader = spark.readStream.format("binaryFile")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.schema(
        "path string, modificationTime timestamp, length long, content binary"
    ).load(path).select("path", "content")
    return files.mapInPandas(_parse_warc_batches, WARC_PAGE_COLUMNS)


def warc_pages(warc_df: DataFrame) -> DataFrame:
    """Adapter to the crawl engine's pages-table contract
    (schema.PAGES_SCHEMA): HTTP-200 HTML responses only, columns
    (url, warc_ts, html, text, lang). Feed the result straight to
    ``CrawlDriver(spark, pages=...)`` or write it as the bucketed
    pages table."""
    from pyspark.sql import functions as F

    return (
        warc_df.filter(
            (F.col("status") == 200)
            & F.col("content_type").startswith("text/html")
        )
        .select(
            "url",
            "warc_ts",
            "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


def iter_wet_records(blob: bytes) -> Iterator[dict]:
    """Yield dicts for the ``conversion`` records of one WET stream
    (Common Crawl's pre-extracted text sidecar): url, warc_ts, text.
    WET payloads are plain UTF-8 text — no HTTP envelope."""
    for fields, payload in _iter_raw_records(blob):
        if fields.get("warc-type") != "conversion":
            continue
        url = fields.get("warc-target-uri")
        if not url:
            continue
        yield {
            "url": url,
            "warc_ts": _parse_warc_ts(fields.get("warc-date", "")),
            "text": payload.decode("utf-8", errors="replace"),
        }


WET_COLUMNS = "url string, warc_ts timestamp, text string, warc_file string"


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET segment files → (url, warc_ts, text, warc_file) — the direct
    documents-table feed when the pipeline starts from Common Crawl's
    pre-extracted text instead of raw html. Same one-task-per-file
    parallelism as :func:`read_warc` (same unsplittable-gzip format)."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                for rec in iter_wet_records(bytes(blob)):
                    rec["warc_file"] = fpath
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "text", "warc_file"]
            )

    return files.mapInPandas(parse, WET_COLUMNS)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl CDXJ index files → one row per capture:
    (surt, capture_ts, url, status, mime, digest, warc_filename,
    warc_offset, warc_length).

    CDXJ line grammar: ``<SURT key> <14-digit ts> <JSON>``. The parse is
    ENTIRELY JVM-side — ``spark.read.text`` + regexp split +
    ``from_json`` — so index scans (the "which segments hold my URLs"
    planning join that makes selective WARC fetch possible at 100 TB)
    never touch Python. ``.gz`` text is one task per file (unsplittable),
    matching the index's own sharding (300 shards/crawl).
    """
    from pyspark.sql import functions as F

    meta = (
        "url string, status string, mime string, digest string, "
        "filename string, offset string, length string"
    )
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", r"^(\S+) (\d{14}) ", 1).alias("surt"),
        F.regexp_extract("value", r"^(\S+) (\d{14}) ", 2).alias("ts_raw"),
        F.from_json(
            F.regexp_extract("value", r"^\S+ \d{14} (.*)$", 1), meta
        ).alias("m"),
    ).filter(F.col("surt") != "")
    return parsed.select(
        "surt",
        F.to_timestamp(F.col("ts_raw"), "yyyyMMddHHmmss").alias("capture_ts"),
        F.col("m.url").alias("url"),
        F.col("m.status").cast("int").alias("status"),
        F.col("m.mime").alias("mime"),
        F.col("m.digest").alias("digest"),
        F.col("m.filename").alias("warc_filename"),
        F.col("m.offset").cast("long").alias("warc_offset"),
        F.col("m.length").cast("long").alias("warc_length"),
    )


def cdx_fetch_plan(cdx: DataFrame, wanted: DataFrame,
                   url_col: str = "url",
                   merge_gap: int = 0) -> DataFrame:
    """Selective re-fetch planner — the join that makes a 100-TB archive
    randomly accessible: given a CDX index (:func:`read_cdx` shape) and
    a ``wanted`` URL list, emit per-record byte coordinates PLUS merged
    contiguous byte ranges per segment file, so a fetcher issues one
    ranged GET per run of adjacent members instead of one per record
    (members written by :func:`~distributed_crawl_spark.sinks.warc.
    write_warc` are back-to-back; ``merge_gap`` > 0 also bridges small
    holes — cheaper to over-read a few KB than to open a new request).

    Plan shape: one hash join on url (uniform), a per-url latest-capture
    pick (map-combinable max_by), then ONE window per (file) ordered by
    offset — bounded by a segment's own record count (~10^4-10^5 for a
    1 GB segment), never by corpus size; files are the parallelism.

    Returns (warc_filename, warc_offset, warc_length, url, range_id,
    range_offset, range_length) — group by (warc_filename, range_id)
    for the GET list; rows within a range are the members to parse out
    of that one read.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    latest = (
        cdx.join(wanted.select(F.col(url_col).alias("url")).distinct(),
                 "url")
        .groupBy("url")
        .agg(
            F.max_by(
                F.struct("warc_filename", "warc_offset", "warc_length"),
                "capture_ts",
            ).alias("w")
        )
        .select("url", "w.warc_filename", "w.warc_offset", "w.warc_length")
    )
    by_off = Window.partitionBy("warc_filename").orderBy("warc_offset")
    gap = F.col("warc_offset") - (
        F.lag(F.col("warc_offset") + F.col("warc_length")).over(by_off)
    )
    marked = latest.withColumn(
        "__new_range",
        F.when(gap.isNull() | (gap > merge_gap), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "range_id", F.sum("__new_range").over(
            by_off.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    rng = Window.partitionBy("warc_filename", "range_id")
    return marked.select(
        "warc_filename", "warc_offset", "warc_length", "url", "range_id",
        F.min("warc_offset").over(rng).alias("range_offset"),
        (F.max(F.col("warc_offset") + F.col("warc_length")).over(rng)
         - F.min("warc_offset").over(rng)).alias("range_length"),
    )


def wet_documents(wet_df: DataFrame) -> DataFrame:
    """Adapter to the curation pipeline's documents contract:
    (doc_id, text, source) with doc_id = the capture URL (string ids work
    through every id-generic stage: digest dedup, minhash/simhash pairs,
    component min-pick, hash splits/lanes) and source = the URL's host —
    the per-domain key the cap/mix/rollup stages balance on. Feed
    ``curate.py --docs-format wet`` or any functions.* operator
    directly."""
    from pyspark.sql import functions as F

    from ..functions.url import url_host

    return wet_df.select(
        F.col("url").alias("doc_id"),
        "text",
        url_host(F.col("url")).alias("source"),
    )
