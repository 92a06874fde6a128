"""WARC export + CDX index generation — the write half of the Common
Crawl interchange trio (``sources/warc.py`` is the read half).

A crawl engine that only *reads* WARC is a dead end in an archive
pipeline: re-crawls, mirrors, and downstream tools (wayback replay,
selective re-fetch planners) consume ``.warc.gz`` segments plus a CDX
index with byte-accurate member offsets. This module writes both from a
pages-shaped DataFrame, and the result round-trips through
:func:`~distributed_crawl_spark.sources.warc.read_warc` /
:func:`~distributed_crawl_spark.sources.warc.read_cdx` bit-for-bit
(pytest-verified, including random access by (offset, length)).

Scale design — mirrors the read path's one-task-per-segment model:
one uniform hash shuffle routes each record to one of ``n_shards``
writer lanes (lane = xxhash64(url) % shards — no skew possible), each
lane writes ONE ``.warc.gz`` segment sequentially (records sorted by
(url, ts) inside the lane, so output is independent of input layout),
and — because every record is its own gzip member, the Common Crawl
convention — the writer knows each member's exact (offset, length) as
it goes. Those become the CDX rows, so the index is a free by-product
of the write, not a second pass over the corpus. Choose ``n_shards`` ≈
corpus_bytes / 1 GB (Common Crawl's own segment size). ``out_dir``
must be storage every executor can reach (a shared mount / object-store
fuse at cluster scale; a local dir on local[N]).

Determinism: gzip members are written with ``mtime=0``, record ids are
UUIDs derived from md5(url, ts), and lane contents are sorted — two
runs over the same rows produce byte-identical segments and indexes.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url import surt_key

MANIFEST_COLUMNS = (
    "url string, warc_ts timestamp, status int, mime string, "
    "digest string, warc_filename string, warc_offset long, "
    "warc_length long"
)

_WARCINFO_FIELDS = b"software: distributed-crawl-spark/warc-sink\r\n"
_WARCINFO = (
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n"
    b"Content-Type: application/warc-fields\r\n"
    + f"Content-Length: {len(_WARCINFO_FIELDS)}\r\n\r\n".encode("ascii")
    + _WARCINFO_FIELDS
    + b"\r\n\r\n"
)


def _ts_iso(ts) -> str | None:
    """pandas Timestamp (naive UTC, the testdata convention) → WARC-Date."""
    if ts is None or pd.isna(ts):
        return None
    return ts.isoformat() + "Z"


def _record_bytes(url: str, ts, status, mime, body: bytes) -> tuple[bytes, str]:
    """One ``response`` record (ISO 28500 §4: named fields, blank line,
    HTTP message payload, double-CRLF terminator) → (bytes, payload
    sha1-base32 digest, the Common Crawl ``WARC-Payload-Digest`` form)."""
    digest = base64.b32encode(hashlib.sha1(body).digest()).decode("ascii")
    http = (
        f"HTTP/1.1 {int(status) if status is not None else 200} OK\r\n"
        + (f"Content-Type: {mime}\r\n" if mime else "")
        + f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8") + body
    iso = _ts_iso(ts)
    rid = uuid.UUID(
        bytes=hashlib.md5(f"{url}|{iso}".encode("utf-8")).digest()
    )
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        + (f"WARC-Date: {iso}\r\n" if iso else "")
        + f"WARC-Target-URI: {url}\r\n"
        f"WARC-Payload-Digest: sha1:{digest}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")
    return head + http + b"\r\n\r\n", digest


def write_warc(pages: DataFrame, out_dir: str, n_shards: int = 8) -> DataFrame:
    """Write ``pages`` (url, warc_ts, and optionally status /
    content_type / html — exactly :func:`read_warc`'s shape; missing
    status defaults to 200, string html is utf-8 encoded) as
    ``out_dir/part-NNNNN.warc.gz`` segments, one gzip member per record.

    Returns the capture manifest — (url, warc_ts, status, mime, digest,
    warc_filename, warc_offset, warc_length) with TRUE byte offsets —
    ready for :func:`cdx_lines`. The plan is one hash shuffle + an
    ``applyInPandas`` writer per lane; nothing funnels through the
    driver. NOTE: the manifest is lazy like any DataFrame — the files
    appear when it is acted on; write it (or count it) exactly once.
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = {c: True for c in pages.columns}
    df = pages.select(
        "url",
        F.col("warc_ts") if "warc_ts" in cols
        else F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("status") if "status" in cols
        else F.lit(200).alias("status"),
        F.col("content_type") if "content_type" in cols
        else F.lit("text/html").alias("content_type"),
        F.col("html"),
        F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int").alias("shard"),
    )

    def write_lane(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["url", "warc_ts"], kind="mergesort")
        fname = f"part-{shard:05d}.warc.gz"
        rows = []
        with open(os.path.join(out_dir, fname), "wb") as fh:
            off = fh.write(gzip.compress(_WARCINFO, mtime=0))
            for r in pdf.itertuples(index=False):
                body = (
                    r.html.encode("utf-8")
                    if isinstance(r.html, str)
                    else bytes(r.html)
                )
                rec, digest = _record_bytes(
                    r.url, r.warc_ts, r.status, r.content_type, body
                )
                blob = gzip.compress(rec, mtime=0)
                fh.write(blob)
                rows.append(
                    (r.url, r.warc_ts, r.status, r.content_type, digest,
                     fname, off, len(blob))
                )
                off += len(blob)
        return pd.DataFrame(
            rows,
            columns=["url", "warc_ts", "status", "mime", "digest",
                     "warc_filename", "warc_offset", "warc_length"],
        )

    return df.groupBy("shard").applyInPandas(write_lane, MANIFEST_COLUMNS)


def cdx_lines(manifest: DataFrame) -> DataFrame:
    """Capture manifest → CDXJ index lines (``<SURT> <14-digit ts>
    <JSON>``), the exact grammar :func:`read_cdx` parses. Entirely
    JVM-side (surt + date_format + to_json); write with
    ``.sort("line").write.text(...)`` — CDX files are sorted by SURT so
    range scans work, and the sort key is the line's own prefix."""
    return manifest.select(
        F.concat_ws(
            " ",
            surt_key(F.col("url")),
            F.date_format("warc_ts", "yyyyMMddHHmmss"),
            F.to_json(
                F.struct(
                    F.col("url"),
                    F.col("status").cast("string").alias("status"),
                    F.col("mime"),
                    F.col("digest"),
                    F.col("warc_filename").alias("filename"),
                    F.col("warc_offset").cast("string").alias("offset"),
                    F.col("warc_length").cast("string").alias("length"),
                )
            ),
        ).alias("line")
    )


def _wet_record_bytes(url: str, ts, text: str) -> tuple[bytes, str]:
    """One ``conversion`` record (the WET sidecar shape
    ``sources/warc.iter_wet_records`` parses): plain UTF-8 payload, no
    HTTP envelope."""
    body = text.encode("utf-8")
    digest = base64.b32encode(hashlib.sha1(body).digest()).decode("ascii")
    iso = _ts_iso(ts)
    rid = uuid.UUID(
        bytes=hashlib.md5(f"wet|{url}|{iso}".encode("utf-8")).digest()
    )
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        + (f"WARC-Date: {iso}\r\n" if iso else "")
        + f"WARC-Target-URI: {url}\r\n"
        f"WARC-Payload-Digest: sha1:{digest}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8")
    return head + body + b"\r\n\r\n", digest


WET_MANIFEST_COLUMNS = (
    "url string, warc_ts timestamp, digest string, wet_filename string, "
    "wet_offset long, wet_length long"
)


def write_wet(docs: DataFrame, out_dir: str, n_shards: int = 8,
              url_col: str = "url", text_col: str = "text",
              ts_col: str = "warc_ts") -> DataFrame:
    """Write extracted text as ``out_dir/part-NNNNN.warc.wet.gz``
    segments — the Common Crawl WET sidecar (``conversion`` records,
    one gzip member each), the publishing format for a curated text
    corpus that other crawl toolchains ingest directly. Same
    deterministic lane model as :func:`write_warc` (uniform xxhash64
    shuffle → one sequential writer per segment, sorted lanes,
    mtime=0), and the result round-trips through
    :func:`~distributed_crawl_spark.sources.warc.read_wet`
    (pytest-verified). Returns the capture manifest with true member
    offsets for random access.
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = {c: True for c in docs.columns}
    df = docs.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts") if ts_col in cols
        else F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col(text_col).alias("text"),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_shards))
        .cast("int").alias("shard"),
    )

    def write_lane(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["url", "warc_ts"], kind="mergesort")
        fname = f"part-{shard:05d}.warc.wet.gz"
        rows = []
        with open(os.path.join(out_dir, fname), "wb") as fh:
            off = fh.write(gzip.compress(_WARCINFO, mtime=0))
            for r in pdf.itertuples(index=False):
                rec, digest = _wet_record_bytes(
                    r.url, r.warc_ts, r.text or ""
                )
                blob = gzip.compress(rec, mtime=0)
                fh.write(blob)
                rows.append(
                    (r.url, r.warc_ts, digest, fname, off, len(blob))
                )
                off += len(blob)
        return pd.DataFrame(
            rows,
            columns=["url", "warc_ts", "digest", "wet_filename",
                     "wet_offset", "wet_length"],
        )

    return df.groupBy("shard").applyInPandas(write_lane,
                                             WET_MANIFEST_COLUMNS)
