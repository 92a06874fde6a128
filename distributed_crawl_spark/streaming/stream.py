"""Structured Streaming surfaces (SURVEY.md §2.13).

The reference is batch-with-a-loop (scheduler tick run_crawl_local.py:269-313)
and the round driver mirrors that as micro-batches over checkpoint state.
These helpers are the true `readStream` path for the engine's *continuous*
inputs — a pages/events firehose landing as files:

- :func:`stream_events_hourly` — event-time tumbling window with a
  watermark for late data; the streaming twin of the batch
  ``hourly_events`` contract query (same results once the stream drains).
- :func:`stream_extract_pages` — pages files → politeness-agnostic
  extract-and-hash flow (the stateless inner stage of a crawl round),
  shaped for ``foreachBatch`` composition with the round driver.

Both run with ``Trigger.AvailableNow`` so a drained run is deterministic
and testable (process everything present, then stop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import url as U
from ..functions.text import make_extract_udf
from ..schema import PAGES_SCHEMA


def stream_events_hourly(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour event-time windows with late-data watermark.

    Returns a streaming DataFrame (window_start, event_type, n, sum_value);
    append-mode compatible (aggregation behind a watermark).
    """
    schema = spark.read.parquet(events_dir).schema  # infer once, batch-side
    events = spark.readStream.schema(schema).parquet(events_dir)
    # watermarks require TIMESTAMP (with zone); the testdata is NTZ —
    # session tz is UTC, so the cast preserves the wall-clock value
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour_str"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_sessions(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization via Spark's native ``session_window`` —
    the streaming twin of the batch
    :func:`~distributed_crawl_spark.functions.events.session_stats`:
    per-user sessions split at inactivity gaps, maintained as merging
    stateful windows with watermark-driven eviction (a closed session's
    state is dropped once the watermark passes its end — state is
    bounded by OPEN sessions, not history; this is the piece the batch
    operator cannot give a 24/7 event firehose).

    Boundary note: ``session_window`` merges events with gap strictly
    LESS than ``gap``; the batch twin keeps events with gap == gap_s in
    one session. Results agree except on exact-equality gaps.

    Returns a streaming (user_id, start_ts, end_ts, n_events) frame
    (``start_ts``/``end_ts`` are min/max event time, matching the batch
    rollup rather than session_window's gap-padded ``end``).
    """
    schema = spark.read.parquet(events_dir).schema  # infer once, batch-side
    events = spark.readStream.schema(schema).parquet(events_dir)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .select("user_id", "start_ts", "end_ts", "n_events")
    )


def stream_extract_pages(
    spark: SparkSession, pages_dir: str, max_links: int = 10
) -> DataFrame:
    """Streaming pages → (url, host, md_hash, page_slug, n_links,
    content_length): the stateless extract stage as a stream."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    extract = make_extract_udf(max_links=max_links)
    ex = pages.withColumn("ex", extract(F.col("url"), F.col("html")))
    return ex.select(
        "url",
        U.url_host(F.col("url")).alias("host"),
        U.content_hash(F.col("ex.text")).alias("md_hash"),
        U.page_slug(F.col("url")).alias("page_slug"),
        F.size("ex.links").alias("n_links"),
        F.length("ex.text").cast("long").alias("content_length"),
    )


def stream_curate(
    spark: SparkSession,
    docs_dir: str,
    min_quality: int | None = 50_000,
    langs: tuple[str, ...] | None = ("en",),
    gopher: bool = True,
    stopwords: list[str] | None = None,
    blocklist: DataFrame | None = None,
    url_col: str = "doc_id",
    c4: bool = False,
    classifier_weights: DataFrame | None = None,
    classifier_threshold_milli: int = 0,
) -> DataFrame:
    """Streaming quality gate — the 24/7 twin of the batch curation
    gates (``train_corpus_gopher`` / lang + quality filters): documents
    landing as files are scored and gated IN FLIGHT, so a continuous
    crawl can feed training shards without waiting for a nightly batch
    pass over the accumulated corpus.

    Entirely stateless — language ID, the integer quality score, and the
    full Gopher rule set (Rae et al. 2021) are closed-form column
    expressions, so the stream is a projection + filter: append mode, no
    watermark, no state store, and a drained ``Trigger.AvailableNow``
    run equals the batch gate on the same files (pytest parity). At
    scale each micro-batch gates independently with zero shuffle —
    throughput is bounded by the file source, and the operator composes
    downstream of :func:`stream_dedup_urls` (dedup first, score second)
    or upstream of a parquet shard sink.

    Any gate can be disabled (``min_quality=None`` / ``langs=None`` /
    ``gopher=False``). ``blocklist`` (a static (domain, category)
    table) adds the UT1/FineWeb URL gate as a STREAM-STATIC broadcast
    join over ``url_col`` (default ``doc_id`` — WET corpora carry the
    url there): still stateless, the blocklist is just a build side
    each micro-batch probes map-side. ``c4=True`` applies the C4
    cleaning rules in flight (offending lines REMOVED — downstream
    gates score the cleaned text — and the doc rules drop); a
    ``classifier_weights`` table adds the trained hashed-linear model
    gate (the model collapses to a map-literal closed-form aggregate —
    see the inline note — exact integer mean vs
    ``classifier_threshold_milli``) — so the full batch curation stack
    short of corpus-relative statistics runs as one stream. Returns
    the document columns plus ``lang`` and ``quality`` for the
    survivors.
    """
    from ..functions import textstats as TS

    schema = spark.read.parquet(docs_dir).schema  # infer once, batch-side
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    text = F.col("text")
    out = docs
    if c4:
        from ..functions.curation import c4_columns

        clean_text, c4_keep = c4_columns(text)
        # keep is judged on the ORIGINAL text (batch --c4 semantics),
        # then the surviving docs are rewritten to their kept lines
        out = out.filter(c4_keep).withColumn("text", clean_text)
    out = out.withColumn("lang", TS.lang_id(text)).withColumn(
        "quality", TS.quality_score_int(text)
    )
    if langs is not None:
        out = out.filter(F.col("lang").isin(*langs))
    if min_quality is not None:
        out = out.filter(F.col("quality") >= F.lit(min_quality))
    if gopher:
        out = out.filter(
            TS.gopher_keep(TS.gopher_features(text, stopwords=stopwords))
        )
    if blocklist is not None:
        from ..functions.url import blocklist_filter

        in_cols = out.columns
        out = blocklist_filter(
            out.withColumn("url", F.col(url_col)), blocklist
        ).filter(F.col("keep")).select(*in_cols)
    if classifier_weights is not None:
        # the batch gate's trained path (explode -> groupBy) is a
        # stateful aggregation a pure append stream cannot run, so the
        # model COLLAPSES TO A MAP LITERAL (it is model-sized — the
        # non-zero buckets of a pruned linear model, not data) and the
        # score becomes the same closed-form token aggregate the stub
        # path uses: exact integer mean, identical keep decisions
        # (pytest parity vs quality_classifier).
        from ..functions.dedup import tokens
        from ..functions.textstats import feature_bucket

        w = {int(r["bucket"]): int(r["w_milli"])
             for r in classifier_weights.collect()}
        toks = tokens(text)
        if w:
            pairs: list[Column] = []
            for bkt in sorted(w):
                pairs += [F.lit(bkt), F.lit(w[bkt])]
            wmap = F.create_map(*pairs)
            score = F.aggregate(
                toks, F.lit(0).cast("long"),
                lambda acc, t: acc + F.coalesce(
                    wmap[feature_bucket(t)], F.lit(0)),
            )
        else:
            score = F.lit(0).cast("long")
        out = out.filter(
            score >= F.lit(classifier_threshold_milli) * F.size(toks)
        )
    return out


def stream_dedup_urls(
    spark: SparkSession,
    pages_dir: str,
    n_buckets: int = 32,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator: first-occurrence URL dedup
    ACROSS micro-batches via ``applyInPandasWithState`` — the streaming
    twin of the batch seen-filter (operators/seen.py), with the same
    sharding: state lives per ``pmod(xxhash64(url), n_buckets)`` bucket,
    so the state store scales by adding buckets exactly like the batch
    filter's bitmap partitions, and the dedup key is the RAW url string
    (SURVEY.md §2.10 — never the canonical form).

    Each group sees only its bucket's urls; membership checks are
    vectorized (``np.isin`` against the state array — no per-row
    Python). Emits (bucket, url) for first occurrences only.

    State is BOUNDED FIXED-WIDTH: 8-byte fingerprints of the raw url
    (``pd.util.hash_array`` — siphash over a fixed key, deterministic
    across processes for the lifetime of a checkpoint), never the raw
    strings, so per-url state cost is 8 bytes regardless of url length
    — the streaming analog of the batch cuckoo filter
    (``operators/cuckoo.py``). And the state is rewritten ONLY on
    batches that actually add urls: an all-repeat micro-batch pays an
    O(|state|) read but zero serialization (``numRowsUpdated == 0`` in
    the progress metrics — asserted in tests).

    Approximation contract (same as any fingerprint filter): two
    distinct urls colliding in 64 bits drop the later one — expected
    collisions ≈ n²/2⁶⁵ per bucket (≪1 below ~10⁸ urls/bucket; add
    buckets to scale). Where exactness is required, run the emitted
    stream through the batch seen-filter's exact-confirm join against
    the committed url_seen table (``operators/seen.py``) — the same
    two-tier design the batch path uses for its cuckoo pre-filter.

    ``max_files_per_trigger=1`` turns a multi-file input dir into one
    micro-batch per file, which is how the cross-batch state carry is
    tested deterministically under ``Trigger.AvailableNow``.

    UPGRADE NOTE: the state schema changed in round 3 from
    ``seen: array<string>`` (exact raw urls) to ``seen_fp: array<long>``
    (fingerprints) — a streaming checkpoint written by the old schema
    fails state-schema validation on restart. Start a NEW checkpoint dir
    when upgrading; the emitted-first-occurrence semantics are the same
    up to the documented 64-bit collision odds.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)
    tagged = pages.select(
        "url",
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    out_schema = StructType(
        [StructField("bucket", IntegerType()), StructField("url", StringType())]
    )
    state_schema = StructType([StructField("seen_fp", ArrayType(LongType()))])

    def dedup(key, pdf_iter, state):
        # Invariant: stored state is sorted-unique (every write below is
        # an np.unique output), so membership is a binary-search probe —
        # O(batch · log state) instead of np.isin's O(state + batch)
        # re-sort of the full history on EVERY batch. The per-batch floor
        # that remains is the state store's own deserialize of the
        # bucket array, which sharding by bucket bounds.
        seen = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.empty(0, dtype=np.int64)
        )
        n0 = seen.size
        fresh_all = []
        fresh_fps: list = []
        for pdf in pdf_iter:
            u = pdf["url"].drop_duplicates()  # in-batch first occurrence
            fp = pd.util.hash_array(u.to_numpy(dtype=object)).view("int64")
            if n0:
                idx = np.searchsorted(seen, fp)
                in_seen = (idx < n0) & (seen[np.minimum(idx, n0 - 1)] == fp)
            else:
                in_seen = np.zeros(fp.size, dtype=bool)
            mask = ~in_seen
            if fresh_fps:  # exclude urls first seen earlier in THIS batch
                mask &= ~np.isin(fp, np.concatenate(fresh_fps))
            if mask.any():
                fresh_all.append(u[mask])
                fresh_fps.append(np.unique(fp[mask]))
        if fresh_fps:  # fresh urls → one sorted-merge state rewrite; else skip
            state.update(
                (np.unique(np.concatenate([seen, *fresh_fps])).tolist(),)
            )
        out = pd.concat(fresh_all) if fresh_all else pd.Series([], dtype=object)
        yield pd.DataFrame({"bucket": [key[0]] * len(out), "url": out.to_numpy()})

    return tagged.groupBy("bucket").applyInPandasWithState(
        dedup, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_crawl(
    spark: SparkSession,
    seeds_dir: str,
    pages: DataFrame,
    robots: DataFrame | None,
    cfg,
    checkpoint_dir: str,
    stream_checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """CONTINUOUS CRAWL INGESTION: a seed-file stream (one URL per line,
    files landing in ``seeds_dir``) drives the batch round driver through
    ``foreachBatch`` — the proof of the driver docstring's claim that a
    round is a ``foreachBatch`` body. Per micro-batch:

    1. the batch's lines become (url, seq) with seq ordered by
       (file, url) — deterministic within a batch; cross-batch FIFO
       order is total because :meth:`CrawlDriver.add_seeds` continues
       seq after the committed watermark;
    2. ``add_seeds`` commits the never-seen URLs into the frontier
       (seen-filter + bloom + pending events, one atomic snapshot);
    3. ``resume()`` runs rounds until the frontier drains (or
       cfg.max_rounds).

    Exactly-once across restarts: the streaming checkpoint
    (``stream_checkpoint_dir``) replays an unacknowledged batch, and
    both ``add_seeds`` (anti-join on url_seen) and the rounds
    (idempotent commits) absorb the replay. Returns the started
    StreamingQuery (``Trigger.AvailableNow`` — drains what's present,
    then stops; await it for the batch-parity mode).
    """
    from ..plans.round import FRONTIER_COLS  # noqa: F401  (doc anchor)
    from .driver import CrawlDriver

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(seeds_dir)

    def process(batch_df, batch_id: int) -> None:
        from pyspark.sql.window import Window

        # Distributed seq numbering, the seed-loader pattern at file
        # granularity (streaming batches expose input_file_name but not
        # _metadata chunk columns): the only GLOBAL window runs over one
        # row per FILE — metadata-sized — and the per-row rank window is
        # partitioned by file, so seed rows never funnel through a
        # single-task sort. Within a file the order is lexicographic
        # (line order is unrecoverable on a streaming batch); across
        # files, file-name order; across batches, arrival order via the
        # committed watermark.
        urls = (
            batch_df.select(
                F.trim("value").alias("url"),
                F.input_file_name().alias("_f"),
            )
            .filter(F.length("url") > 0)
        )
        per_file = urls.groupBy("_f").agg(F.count(F.lit(1)).alias("_n"))
        w_off = Window.orderBy("_f").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = per_file.withColumn(
            "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
        ).drop("_n")
        w_rn = Window.partitionBy("_f").orderBy("url")
        seeds = (
            urls.join(F.broadcast(offsets), "_f")
            .select(
                "url",
                (F.col("_off") + F.row_number().over(w_rn) - 1)
                .cast("long")
                .alias("seq"),
            )
        )
        driver = CrawlDriver(spark, pages, robots, cfg, checkpoint_dir)
        driver.add_seeds(seeds)
        driver.resume()

    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", stream_checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str = "drain"
) -> None:
    """Drain everything currently available into an in-memory table named
    ``query_name`` and stop — the deterministic test/batch-parity mode."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming and _has_agg(stream_df) else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan


def publish_wet_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n_shards: int = 4,
    url_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Continuous WET publisher — the sink half of the 24/7 pipeline
    (:func:`stream_curate` upstream): every micro-batch of curated docs
    is written as its own ``<out_dir>/batch-NNNNN/`` WET segment set via
    ``foreachBatch`` + :func:`~distributed_crawl_spark.sinks.warc.
    write_wet` (one sequential writer per shard, manifests alongside),
    so the corpus publishes itself as files land — and exactly once
    across restarts, because foreachBatch replays a failed batch id
    into the same directory (the write is an idempotent overwrite).
    ``read_wet(out_dir + '/batch-*/')`` ingests the whole history.

    Returns the started StreamingQuery (terminated already when
    ``available_now``).
    """
    import os

    from ..sinks.warc import write_wet

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        base = os.path.join(out_dir, f"batch-{batch_id:05d}")
        write_wet(
            batch_df, base, n_shards=n_shards,
            url_col=url_col, text_col=text_col,
        ).write.mode("overwrite").parquet(os.path.join(base, "manifest"))

    q = (
        stream_df.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        if available_now
        else stream_df.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if available_now:
        q.awaitTermination()
    return q


def run_available_now_to_dir(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available into ``out_dir`` as
    appended parquet (the file sink's ``_spark_metadata`` makes the
    directory exactly-once readable) and stop — the cron-able
    continuous-curation sink (``curate.py --watch``)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_neardup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_files_per_trigger: int | None = None,
):
    """CONTINUOUS NEAR-DUP DEDUP: documents landing as parquet files are
    deduplicated in flight against everything already accepted — exact
    (md5 digest) AND near (MinHash LSH band membership, the same
    signature family as the batch pair dedup) — then published, with
    the accepted docs' membership keys appended to a persistent
    :func:`~..functions.dedup.dedup_index`. The streaming twin of the
    batch ``dedup_index`` → ``incremental_dedup`` chain: a 24/7 crawl
    never re-reads or re-shuffles the accepted corpus, each micro-batch
    pays O(|batch| + index partitions probed), at any corpus size.

    Per micro-batch (``foreachBatch``):

    1. within-batch keep-one — exact keep-first (min id per digest),
       then MinHash LSH pairs → connected components → non-canonical
       members dropped (min id canonical, the batch semantics);
    2. survivors probe the accumulated index — two LEFT SEMI joins via
       :func:`~..functions.dedup.incremental_dedup`; docs whose digest
       or any band key is already present are dropped;
    3. the kept docs write to ``out_dir/batch-NNNNN/`` and their index
       keys (digests + distinct band buckets) to
       ``index_dir/batch-NNNNN/``.

    Exactly-once across restarts: a replayed batch id overwrites its own
    two ``batch-NNNNN`` directories (idempotent), and the probe reads
    every index batch dir EXCEPT its own — so a half-written failed
    attempt can never make the replay flag the batch as a duplicate of
    itself. Read the accepted corpus with
    ``spark.read.parquet(out_dir + "/batch-*")``.

    Returns the started StreamingQuery (``Trigger.AvailableNow``,
    already terminated — the drained run equals the batch chain applied
    file-batch by file-batch, pytest parity).
    """
    import os

    from ..functions import dedup as DD

    schema = spark.read.parquet(docs_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        me = f"batch-{batch_id:05d}"
        # 1. within-batch exact keep-first (min id per digest)
        dig = batch_df.select(
            F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("__d")
        )
        canon = dig.groupBy("__d").agg(F.min("__id").alias("__keep"))
        b = (
            batch_df.join(
                dig.join(canon, "__d")
                .filter(F.col("__id") == F.col("__keep"))
                .select(F.col("__id").alias(id_col)),
                id_col,
                "left_semi",
            )
        )
        # ... then within-batch near-dup keep-one (min-id canonical)
        pairs = DD.minhash_lsh_pairs(b, id_col=id_col, text_col=text_col, n=n)
        drop = (
            DD.near_dup_components(pairs)
            .filter(F.col("component_id") != F.col(id_col))
            .select(id_col)
        )
        b = b.join(drop, id_col, "left_anti")
        # 2. probe the accumulated index (every batch dir except our own
        #    possibly-half-written replay residue)
        prior = sorted(
            os.path.join(index_dir, d)
            for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
            if d.startswith("batch-") and d != me
        )
        if prior:
            flags = DD.incremental_dedup(
                b, spark.read.parquet(*prior),
                id_col=id_col, text_col=text_col, n=n,
            )
            b = b.join(
                flags.filter(F.col("keep")).select(id_col), id_col, "left_semi"
            )
        # 3. publish + index the accepted docs (one materialization
        #    feeds both writes; lineage cut so the index write can't
        #    recompute the probe against a directory we just extended)
        b = b.localCheckpoint()
        b.write.mode("overwrite").parquet(os.path.join(out_dir, me))
        DD.dedup_index(b, id_col=id_col, text_col=text_col, n=n).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, me))

    q = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
