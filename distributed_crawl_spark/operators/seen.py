"""URL-seen layer: exact dedup with a partitioned Bloom pre-filter.

Reference semantics (the contract, SURVEY.md §2.10): "seen" means
*ever-enqueued*, keyed by RAW url string equality — no normalization
before dedup (run_crawl_local.py:165: ``url not in crawl_status``).

Exact layer: ``candidates LEFT ANTI JOIN url_seen ON url``. Spark hash-
partitions both sides on the join key; co-partitioning with the seen
table's storage bucketing makes this shuffle one-sided at scale.

Approximate pre-filter: at 10^10 seen URLs the anti-join's seen side is
~10 TB of strings per round. A partitioned Bloom filter — one bitmap per
``pmod(xxhash64(url), n_buckets)`` bucket, stored as binary rows in the
checkpoint — prunes candidates first:

    bloom says ABSENT  → definitely new → skip the exact join entirely
    bloom says PRESENT → maybe seen     → exact anti-join confirms

False positives only cost an exact lookup; false negatives are impossible
(every committed URL is inserted), so correctness never depends on the
filter (tests/test_seen.py property-checks this under adversarial
collisions). Build and probe are vectorized numpy over Arrow batches
(``applyInPandas`` per bucket) — no per-row Python.

Bitmap hashing is double hashing (Kirsch-Mitzenmacher): two independent
u64 seeds per URL computed JVM-side as ``xxhash64(url, 1)`` and
``xxhash64(url, 2)`` (inside whole-stage codegen, so the Python side never
touches the URL string), then k=7 probe positions ``(h1 + k*h2) mod m``
derived with pure-numpy uint64 arithmetic. Seeds 1/2 are distinct from the
bucket hash ``xxhash64(url)`` so positions are uncorrelated with bucket
assignment (both moduli are powers of two — reusing the bucket hash would
pin the low bits of every k=0 probe within a bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_STATE_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("bitmap", BinaryType(), False),
        StructField("n_inserted", LongType(), False),
    ]
)

_K_HASHES = 7
_HASH_COLS = ["__h1", "__h2"]


def _with_probe_hashes(df: DataFrame) -> DataFrame:
    """Attach the two u64 probe seeds, computed JVM-side (codegen)."""
    return df.withColumn("__h1", F.xxhash64(F.col("url"), F.lit(1))).withColumn(
        "__h2", F.xxhash64(F.col("url"), F.lit(2))
    )


def _probe_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K) bit positions via double hashing — fully vectorized; uint64
    wrap-around is the intended modular arithmetic."""
    h1 = h1.astype(np.uint64, copy=False)
    h2 = h2.astype(np.uint64, copy=False)
    k = np.arange(_K_HASHES, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + k[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


class BloomSeenFilter:
    """Partitioned, updatable Bloom filter over the seen-URL set."""

    def __init__(self, n_buckets: int = 64, m_bits: int = 1 << 20):
        assert m_bits % 8 == 0
        self.n_buckets = n_buckets
        self.m_bits = m_bits

    @property
    def format(self) -> str:
        """Identifies the hash scheme + geometry a persisted state was built
        with. Probing bitmaps with a different scheme yields false negatives
        (silent re-enqueue of crawled URLs), so the driver stamps this in the
        checkpoint pointer and rebuilds from url_seen on mismatch."""
        return f"bloom/xxhash64-km{_K_HASHES}/buckets={self.n_buckets}/bits={self.m_bits}"

    def empty_state(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame([], BLOOM_STATE_SCHEMA)

    def bucket_col(self, url_col):
        return F.pmod(F.xxhash64(url_col), F.lit(self.n_buckets)).cast("int")

    # -- build ----------------------------------------------------------------

    def insert(self, state: DataFrame, new_urls: DataFrame) -> DataFrame:
        """Merge new urls (column ``url``) into the bitmap state. Each
        bucket's prior bitmap rides along via the cogroup join; output is
        the full replacement state."""
        m_bits = self.m_bits

        tagged = _with_probe_hashes(
            new_urls.select(
                F.col("url"), self.bucket_col(F.col("url")).alias("bucket")
            )
        )

        def merge(key, urls_pdf, state_pdf) -> pd.DataFrame:
            (bucket,) = key
            if len(state_pdf):
                bitmap = np.frombuffer(
                    state_pdf["bitmap"].iloc[0], dtype=np.uint8
                ).copy()
                n = int(state_pdf["n_inserted"].iloc[0])
            else:
                bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
                n = 0
            if len(urls_pdf):
                pos = _probe_positions(
                    urls_pdf["__h1"].to_numpy(), urls_pdf["__h2"].to_numpy(), m_bits
                ).ravel()
                np.bitwise_or.at(bitmap, pos // 8, (1 << (pos % 8)).astype(np.uint8))
                n += len(urls_pdf)
            return pd.DataFrame(
                {"bucket": [bucket], "bitmap": [bitmap.tobytes()], "n_inserted": [n]}
            )

        return tagged.groupBy("bucket").cogroup(state.groupBy("bucket")).applyInPandas(
            merge, schema=BLOOM_STATE_SCHEMA
        )

    # -- probe ----------------------------------------------------------------

    def probe(self, state: DataFrame, candidates: DataFrame) -> DataFrame:
        """Adds boolean ``maybe_seen`` to candidates (column ``url``).
        Absent bucket state → bucket bitmap empty → definitely new."""
        m_bits = self.m_bits
        out_schema = StructType(
            candidates.schema.fields
            + [StructField("maybe_seen", BooleanType(), False)]
        )
        tagged = _with_probe_hashes(
            candidates.withColumn("bucket", self.bucket_col(F.col("url")))
        )

        def check(cand_pdf, state_pdf) -> pd.DataFrame:
            h1 = cand_pdf["__h1"].to_numpy()
            h2 = cand_pdf["__h2"].to_numpy()
            cand_pdf = cand_pdf.drop(columns=["bucket", *_HASH_COLS])
            if not len(cand_pdf):
                return cand_pdf.assign(maybe_seen=pd.Series([], dtype=bool))
            if not len(state_pdf):
                return cand_pdf.assign(maybe_seen=False)
            bitmap = np.frombuffer(state_pdf["bitmap"].iloc[0], dtype=np.uint8)
            pos = _probe_positions(h1, h2, m_bits)
            bits = (bitmap[pos // 8] >> (pos % 8)) & 1
            return cand_pdf.assign(maybe_seen=bits.all(axis=1).astype(bool))

        return (
            tagged.groupBy("bucket")
            .cogroup(state.groupBy("bucket"))
            .applyInPandas(check, schema=out_schema)
        )


def filter_unseen(
    candidates: DataFrame,
    url_seen: DataFrame,
    bloom: BloomSeenFilter | None = None,
    bloom_state: DataFrame | None = None,
    materialize=None,
) -> DataFrame:
    """Rows of ``candidates`` whose raw ``url`` is not in ``url_seen``.

    With a bloom state, only maybe-seen candidates pay the exact anti-join;
    definite-new rows bypass it. Without, plain left_anti.

    ``materialize``: optional ``(name, df) -> df`` callback (the driver's
    staged checkpoint write). The probed output forks into two branches
    (definite-new ∪ anti-join-confirmed); without materialization Catalyst
    duplicates the whole candidates+probe subtree under the union — the
    explode/dedup/probe pipeline would run twice per round.
    """
    if bloom is None or bloom_state is None:
        return candidates.join(url_seen.select("url"), "url", "left_anti")

    probed = bloom.probe(bloom_state, candidates)
    if materialize is not None:
        probed = materialize("_round_probed", probed)
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = suspects.join(url_seen.select("url"), "url", "left_anti")
    return definite_new.unionByName(confirmed_new)
