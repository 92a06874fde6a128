"""Structured Streaming parity (SURVEY.md §2.13): a drained
Trigger.AvailableNow stream must equal its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark import corpus
from distributed_crawl_spark.streaming.stream import (
    run_available_now,
    stream_events_hourly,
    stream_extract_pages,
)

SF = "/root/testdata/sf0.001"


def test_stream_hourly_equals_batch(spark, tmp_path):
    # the streaming file source needs a DIRECTORY of files
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(events_dir)
    stream = stream_events_hourly(spark, events_dir)
    assert stream.isStreaming
    run_available_now(stream, str(tmp_path / "ck"), "hourly")
    got = {
        (r.hour_str, r.event_type): (r.n, r.sum_value)
        for r in spark.table("hourly").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour_str"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    want = {
        (r.hour_str, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert got == want


def test_stream_extract_pages(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    corpus.tiny_pages(spark).write.parquet(pages_dir)
    stream = stream_extract_pages(spark, pages_dir)
    assert stream.isStreaming
    run_available_now(stream, str(tmp_path / "ck2"), "extracted")
    rows = spark.table("extracted").collect()
    assert len(rows) == corpus.tiny_pages(spark).count()
    assert all(len(r.md_hash) == 16 for r in rows)


def test_stream_dedup_urls_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState seen-filter: urls repeated across files
    (= separate micro-batches with maxFilesPerTrigger=1) are emitted
    exactly once — the state set must survive the batch boundary."""
    from distributed_crawl_spark.streaming.stream import stream_dedup_urls

    pages_dir = tmp_path / "pages_waves"
    pages_dir.mkdir()
    wave1 = ["https://a.test/1", "https://a.test/2", "https://b.test/1"]
    wave2 = ["https://a.test/2", "https://b.test/1", "https://b.test/2",
             "https://c.test/1"]

    def write_wave(urls, name):
        df = spark.createDataFrame(
            [(u, None, None, None, None) for u in urls], corpus.PAGES_SCHEMA
        )
        df.coalesce(1).write.parquet(str(tmp_path / name))
        import shutil
        for f in (tmp_path / name).glob("*.parquet"):
            shutil.copy(f, pages_dir / f"{name}.parquet")

    write_wave(wave1, "w1")
    write_wave(wave2, "w2")

    stream = stream_dedup_urls(
        spark, str(pages_dir), n_buckets=4, max_files_per_trigger=1
    )
    assert stream.isStreaming
    run_available_now(stream, str(tmp_path / "ck_dedup"), "deduped")
    out = [r.url for r in spark.table("deduped").collect()]
    assert sorted(out) == sorted(set(wave1) | set(wave2))  # each url once


def test_stream_dedup_state_is_fingerprints_and_skips_noop_rewrites(spark, tmp_path):
    """Round-3 state bound: (a) an all-repeat micro-batch must NOT rewrite
    state (numRowsUpdated == 0 — the O(total-seen) per-batch
    re-serialization the 32-bit form paid is gone); (b) batches with fresh
    urls update exactly the touched buckets."""
    from distributed_crawl_spark.streaming.stream import stream_dedup_urls

    pages_dir = tmp_path / "pages_waves"
    pages_dir.mkdir()
    wave1 = [f"https://a.test/{i}" for i in range(20)]
    wave2 = wave1[:10] + ["https://b.test/new"]
    wave3 = list(wave1)  # pure repeats — must be a zero-update batch

    import shutil

    for name, urls in [("w1", wave1), ("w2", wave2), ("w3", wave3)]:
        df = spark.createDataFrame(
            [(u, None, None, None, None) for u in urls], corpus.PAGES_SCHEMA
        )
        df.coalesce(1).write.parquet(str(tmp_path / name))
        for f in (tmp_path / name).glob("*.parquet"):
            shutil.copy(f, pages_dir / f"{name}.parquet")

    stream = stream_dedup_urls(
        spark, str(pages_dir), n_buckets=4, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_fp")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = [r.url for r in spark.table("dedup_fp").collect()]
    assert sorted(out) == sorted(set(wave1) | set(wave2))

    updates = [
        (p["batchId"], p["stateOperators"][0]["numRowsUpdated"])
        for p in (q.recentProgress or [])
        if p.get("stateOperators") and p["numInputRows"] > 0
    ]
    by_batch = dict(updates)
    assert by_batch, "no progress captured"
    last_batch = max(by_batch)
    assert by_batch[last_batch] == 0, f"repeat batch rewrote state: {by_batch}"
    assert any(v > 0 for v in by_batch.values())  # fresh batches did update


def test_stream_dedup_per_batch_wall_flat_with_growing_state(spark, tmp_path):
    """Round-4 sorted-fingerprint probe: after a 50k-url batch seeds the
    state, ten further micro-batches (half repeats, half fresh) must (a)
    still dedup exactly and (b) keep per-batch wall flat — the probe is
    a binary search against the sorted state array, so batch cost tracks
    batch size, not crawl history. The wall assertion is a generous 5×
    guard: it exists to catch an accidental O(history) reintroduction,
    not to benchmark."""
    import shutil

    from distributed_crawl_spark.streaming.stream import stream_dedup_urls

    pages_dir = tmp_path / "pages_many"
    pages_dir.mkdir()

    def write_wave(name, lo, hi, repeat_lo=None, repeat_hi=None):
        expr = "concat('https://flat.test/', id) AS url"
        df = spark.range(lo, hi).selectExpr(
            expr, "NULL AS html", "CAST(NULL AS INT) AS status",
            "NULL AS fetched_at", "CAST(NULL AS INT) AS level",
        )
        if repeat_lo is not None:
            rep = spark.range(repeat_lo, repeat_hi).selectExpr(
                expr, "NULL AS html", "CAST(NULL AS INT) AS status",
                "NULL AS fetched_at", "CAST(NULL AS INT) AS level",
            )
            df = df.unionByName(rep)
        df.coalesce(1).write.parquet(str(tmp_path / name))
        for f in (tmp_path / name).glob("*.parquet"):
            shutil.copy(f, pages_dir / f"{name}.parquet")

    write_wave("w00", 0, 50_000)  # seeds a large state in batch 0
    n_small, fresh_per = 10, 100
    for i in range(n_small):
        lo = 50_000 + i * fresh_per
        write_wave(f"w{i + 1:02d}", lo, lo + fresh_per,
                   repeat_lo=i * 37, repeat_hi=i * 37 + fresh_per)

    stream = stream_dedup_urls(
        spark, str(pages_dir), n_buckets=4, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_flat")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_flat"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("dedup_flat").count() == 50_000 + n_small * fresh_per

    # availableNow with maxFilesPerTrigger=1 → one progress entry per file
    walls = [
        (p["batchId"], p["batchDuration"])
        for p in (q.recentProgress or [])
        if p["numInputRows"] > 0 and p["batchId"] > 0  # skip the seed batch
    ]
    assert len(walls) >= 8, f"expected >=8 small batches, got {walls}"
    walls = [w for _, w in sorted(walls)]
    early = sorted(walls[:3])[1]
    late = sorted(walls[-3:])[1]
    assert late <= 5 * early, f"per-batch wall grew with state: {walls}"


def test_stream_crawl_matches_batch_crawl(spark, tmp_path):
    """foreachBatch crawl ingestion: seed files arriving as two separate
    micro-batches produce the SAME final (url, status) set as one batch
    crawl over the union of seeds — and replayed/duplicate seeds across
    batches are absorbed by the seen contract."""
    from distributed_crawl_spark.config import CrawlConfig
    from distributed_crawl_spark.streaming.driver import CrawlDriver
    from distributed_crawl_spark.streaming.stream import stream_crawl

    pages = corpus.tiny_pages(spark)
    all_urls = sorted(r.url for r in pages.select("url").collect())
    seeds_dir = tmp_path / "seed_files"
    seeds_dir.mkdir()
    (seeds_dir / "w1.txt").write_text(all_urls[0] + "\n")
    # second wave repeats wave 1's seed (must not re-enqueue) + a new one
    (seeds_dir / "w2.txt").write_text(all_urls[0] + "\n" + all_urls[1] + "\n")

    cfg = CrawlConfig(max_levels=3, max_rounds=20, host_budget=4)
    q = stream_crawl(
        spark, str(seeds_dir), pages, None, cfg,
        str(tmp_path / "crawl_ck"), str(tmp_path / "stream_ck"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    streamed = CrawlDriver(spark, pages, None, cfg, str(tmp_path / "crawl_ck"))
    got = {(r.url, r.status) for r in streamed.current_status().collect()}

    batch = CrawlDriver(spark, pages, None, cfg, str(tmp_path / "batch_ck"))
    batch.run(spark.createDataFrame(
        [(all_urls[0], 0, None), (all_urls[1], 1, None)], corpus.SEEDS_SCHEMA
    ))
    want = {(r.url, r.status) for r in batch.current_status().collect()}
    assert got == want
    # the injected seed count landed in the progress denominator
    assert streamed.progress()["total_urls"] == batch.progress()["total_urls"]


def test_add_seeds_dedup_watermark_and_noop(spark, tmp_path):
    """add_seeds: (a) already-seen urls never re-enqueue; (b) injected
    seqs continue after the committed watermark so FIFO order stays
    total; (c) an all-duplicate batch commits nothing (pointer version
    unchanged, staging abandoned)."""
    from distributed_crawl_spark.config import CrawlConfig
    from distributed_crawl_spark.streaming.driver import CrawlDriver

    pages = corpus.tiny_pages(spark)
    urls = sorted(r.url for r in pages.select("url").collect())
    cfg = CrawlConfig(max_levels=1, max_rounds=1, host_budget=1)
    drv = CrawlDriver(spark, pages, None, cfg, str(tmp_path / "ck"))
    drv.start(spark.createDataFrame(
        [(urls[0], 0, None)], corpus.SEEDS_SCHEMA))
    wm0 = drv.store.latest_meta()["seq_watermark"]
    assert wm0 == 1

    n = drv.add_seeds(spark.createDataFrame(
        [(urls[0], 0), (urls[1], 1)], "url STRING, seq LONG"))
    assert n == 1                              # urls[0] already enqueued
    meta = drv.store.latest_meta()
    assert meta["n_seeds"] == 2
    assert meta["seq_watermark"] == wm0 + 2    # offset + batch seq 1 + 1
    seqs = {r.url: r.seq
            for r in drv.store.read(spark, "frontier").collect()}
    assert seqs[urls[1]] == wm0 + 1            # continued after watermark

    v = drv.store.latest_version()
    assert drv.add_seeds(spark.createDataFrame(
        [(urls[0], 0), (urls[1], 1)], "url STRING, seq LONG")) == 0
    assert drv.store.latest_version() == v     # no commit for a noop batch


def test_stream_sessions_equals_batch(spark, tmp_path):
    """Native session_window streaming twin drains to the same sessions
    as the batch lag/cumsum operator (same users, same start/end/count;
    exact-equality gaps — the one documented boundary difference — do
    not occur in the testdata at 30min)."""
    from distributed_crawl_spark.functions import events as EV
    from distributed_crawl_spark.streaming.stream import stream_sessions

    events_dir = str(tmp_path / "events_s")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(events_dir)
    stream = stream_sessions(spark, events_dir, gap="30 minutes")
    assert stream.isStreaming
    run_available_now(stream, str(tmp_path / "ck_s"), "sessions")
    got = {
        (r.user_id, r.start_ts): (r.end_ts, r.n_events)
        for r in spark.table("sessions").collect()
    }
    batch = EV.session_stats(
        spark.read.parquet(events_dir).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ),
        gap_minutes=30,
    )
    want = {
        (r.user_id, r.start_ts): (r.end_ts, r.n_events)
        for r in batch.collect()
    }
    assert got == want

def test_stream_curate_equals_batch_gate(spark, tmp_path):
    """The streaming quality gate (stateless lang/quality/Gopher
    projections) drains to exactly the batch gate's survivor set, with
    identical per-doc lang and quality values. Stopword lexicon adapted
    to the synthetic corpus exactly as the train_corpus_gopher contract
    query does (the paper's 8-word list is vacuous on SQL-word soup)."""
    from distributed_crawl_spark.functions import textstats as TS
    from distributed_crawl_spark.streaming.stream import stream_curate

    sw = sorted(["a", *TS.LANG_MARKERS["en"]])
    docs_dir = str(tmp_path / "docs_c")
    spark.read.parquet(f"{SF}/documents.parquet").write.parquet(docs_dir)
    stream = stream_curate(
        spark, docs_dir, min_quality=30_000, langs=("en",), stopwords=sw
    )
    assert stream.isStreaming
    run_available_now(stream, str(tmp_path / "ck_c"), "curated")
    got = {
        r.doc_id: (r.lang, r.quality) for r in spark.table("curated").collect()
    }
    batch_docs = spark.read.parquet(docs_dir)
    text = F.col("text")
    batch = (
        batch_docs.withColumn("lang", TS.lang_id(text))
        .withColumn("quality", TS.quality_score_int(text))
        .filter(F.col("lang") == "en")
        .filter(F.col("quality") >= 30_000)
        .filter(TS.gopher_keep(TS.gopher_features(text, stopwords=sw)))
    )
    want = {r.doc_id: (r.lang, r.quality) for r in batch.collect()}
    assert got == want
    # the gate must actually discriminate on this corpus
    assert 0 < len(got) < batch_docs.count()


def test_stream_curate_blocklist_stream_static(spark, tmp_path):
    """blocklist= adds a stream-static broadcast join gate: the drained
    stream equals the batch blocklist_filter survivor set on a WET-shaped
    corpus (doc_id = url)."""
    from distributed_crawl_spark.functions.url import blocklist_filter
    from distributed_crawl_spark.streaming.stream import stream_curate

    docs_dir = str(tmp_path / "docs_bl")
    spark.createDataFrame(
        [
            (f"https://{'bad.example' if i % 3 == 0 else f'ok{i}.test'}"
             f"/p{i}",
             "the and is of to in that it words " * 30,
             "s")
            for i in range(30)
        ],
        "doc_id STRING, text STRING, source STRING",
    ).write.parquet(docs_dir)
    bl = spark.createDataFrame([("bad.example", "adult")],
                               "domain STRING, category STRING")
    stream = stream_curate(
        spark, docs_dir, min_quality=None, langs=None, gopher=False,
        blocklist=bl,
    )
    run_available_now(stream, str(tmp_path / "ck_bl"), "curated_bl")
    got = {r.doc_id for r in spark.table("curated_bl").collect()}
    batch = blocklist_filter(
        spark.read.parquet(docs_dir).withColumn("url", F.col("doc_id")), bl
    ).filter("keep")
    want = {r.doc_id for r in batch.collect()}
    assert got == want
    assert 0 < len(got) < 30 and all("bad.example" not in u for u in got)


def test_stream_curate_c4_and_classifier_parity(spark, tmp_path):
    """The full in-flight stack: C4 line/doc rules rewrite+gate and the
    trained hashed-linear model (map-literal closed form) gate — drained
    stream equals the batch composition (c4_clean + quality_classifier)
    doc-for-doc, including the rewritten text."""
    from distributed_crawl_spark.functions import textstats as TS
    from distributed_crawl_spark.functions.curation import c4_clean
    from distributed_crawl_spark.streaming.stream import stream_curate

    good_words = ["insight", "method", "evidence", "theory", "result"]
    bad_words = ["spamword", "clickbait", "garbage", "noise", "junk"]

    def line(ws, i):
        return " ".join(ws[(i + j) % len(ws)] for j in range(8)) + "."

    def doc(ws, i, extra=""):
        return "\n".join([line(ws, i + k) for k in range(3)]) + extra

    rows = (
        [(i, doc(good_words, i)) for i in range(10)]            # kept
        + [(20 + i, doc(bad_words, i)) for i in range(10)]      # clf drop
        + [(40, doc(good_words, 1, "\nno punct line here"))]    # line scrub
        + [(41, doc(good_words, 2, "\ncall f() { x }."))]       # c4 doc drop
    )
    docs_dir = str(tmp_path / "docs_cc")
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(
        docs_dir)
    pos = spark.createDataFrame(
        [(i, doc(good_words, i)) for i in range(30)],
        "doc_id LONG, text STRING")
    neg = spark.createDataFrame(
        [(i, doc(bad_words, i)) for i in range(30)],
        "doc_id LONG, text STRING")
    w = TS.train_quality_classifier(pos, neg, iters=6)

    stream = stream_curate(
        spark, docs_dir, min_quality=None, langs=None, gopher=False,
        c4=True, classifier_weights=w,
    )
    run_available_now(stream, str(tmp_path / "ck_cc"), "curated_cc")
    got = {r.doc_id: r.text for r in spark.table("curated_cc").collect()}

    batch_docs = spark.read.parquet(docs_dir)
    c4d = c4_clean(batch_docs).filter("keep").select(
        "doc_id", F.col("clean_text").alias("text"))
    clf = TS.quality_classifier(c4d, weights=w, threshold_milli=0)
    keep_ids = {r.doc_id for r in clf.filter("keep").collect()}
    want = {r.doc_id: r.text for r in c4d.collect() if r.doc_id in keep_ids}
    assert got == want
    assert 40 in got and "no punct" not in got[40]   # line scrubbed
    assert 41 not in got                             # brace doc dropped
    assert all(i in got for i in range(10))
    assert all(20 + i not in got for i in range(10))


def test_publish_wet_stream_roundtrip(spark, tmp_path):
    """The continuous publisher: curated docs stream → per-batch WET
    segment sets; read_wet over the batch dirs recovers every doc, and
    a second drain with MORE files appends a new batch without touching
    the first (exactly-once via the stream checkpoint)."""
    from distributed_crawl_spark.sources.warc import read_wet
    from distributed_crawl_spark.streaming.stream import (publish_wet_stream,
                                                          stream_curate)

    docs_dir = tmp_path / "docs_pub"
    docs_dir.mkdir()
    mk = lambda i: (f"https://h.test/d{i}", f"doc {i} body text", "s")
    spark.createDataFrame(
        [mk(i) for i in range(8)], "doc_id STRING, text STRING, source STRING"
    ).write.parquet(str(docs_dir / "a"))
    out = tmp_path / "wet_pub"
    ck = str(tmp_path / "ck_pub")

    def drain():
        stream = spark.readStream.schema(
            "doc_id STRING, text STRING, source STRING"
        ).parquet(str(docs_dir / "*"))
        publish_wet_stream(stream, str(out), ck)

    drain()
    got = {
        (r.url, r.text)
        for r in read_wet(spark, f"{out}/batch-*/*.warc.wet.gz").collect()
    }
    assert got == {(f"https://h.test/d{i}", f"doc {i} body text")
                   for i in range(8)}
    # second landing: only the new docs publish (new batch dir)
    spark.createDataFrame(
        [mk(i) for i in range(8, 12)],
        "doc_id STRING, text STRING, source STRING",
    ).write.parquet(str(docs_dir / "b"))
    drain()
    got2 = {
        r.url for r in read_wet(spark, f"{out}/batch-*/*.warc.wet.gz").collect()
    }
    assert got2 == {f"https://h.test/d{i}" for i in range(12)}


def test_stream_neardup_cross_batch_and_exactly_once(spark, tmp_path):
    """Continuous incremental dedup: within-batch keep-one (exact + LSH
    components, min id), cross-batch drops via the accumulated index,
    and the drained stream equals the batch dedup_index/incremental_dedup
    chain applied file by file. A second drain with new files extends the
    output without re-emitting or re-flagging earlier batches."""
    from distributed_crawl_spark.functions import dedup as DD
    from distributed_crawl_spark.streaming.stream import stream_neardup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs_dir = tmp_path / "nd_docs"
    docs_dir.mkdir()
    out = str(tmp_path / "nd_out")
    idx = str(tmp_path / "nd_idx")
    ck = str(tmp_path / "nd_ck")
    sch = "doc_id LONG, text STRING"

    # file a: original + in-batch exact copy + unique (coalesce(1): ONE
    # part file per directory, so maxFilesPerTrigger=1 == one dir per batch)
    spark.createDataFrame(
        [(1, base), (2, base), (3, "completely unrelated words about ships")],
        sch,
    ).coalesce(1).write.parquet(str(docs_dir / "a"))
    # file b: cross-batch exact copy of 1, near copy of 1, fresh doc
    spark.createDataFrame(
        [(10, base), (11, base.replace("today", "tonight")),
         (12, "another disjoint document concerning volcanoes")],
        sch,
    ).coalesce(1).write.parquet(str(docs_dir / "b"))

    stream_neardup(spark, str(docs_dir / "*"), out, idx, ck,
                   max_files_per_trigger=1)

    kept = {r.doc_id for r in spark.read.parquet(f"{out}/batch-*").collect()}
    assert 1 in kept and 3 in kept and 12 in kept
    assert 2 not in kept          # in-batch exact copy
    assert 10 not in kept         # cross-batch exact copy
    # the near copy's fate must MATCH the batch operator's verdict
    b1 = spark.createDataFrame([(1, base), (3, "x")], sch)
    near11 = (
        DD.incremental_dedup(
            spark.createDataFrame([(11, base.replace("today", "tonight"))], sch),
            DD.dedup_index(b1),
        ).collect()[0]
    )
    assert (11 in kept) == bool(near11.keep)
    # second drain: one new file, one doc duplicating an accepted doc
    spark.createDataFrame(
        [(20, "completely unrelated words about ships"), (21, "brand new")],
        sch,
    ).coalesce(1).write.parquet(str(docs_dir / "c"))
    stream_neardup(spark, str(docs_dir / "*"), out, idx, ck,
                   max_files_per_trigger=1)
    kept2 = [r.doc_id for r in spark.read.parquet(f"{out}/batch-*").collect()]
    assert sorted(kept2) == sorted(kept | {21})   # 20 dropped, no re-emits
    assert len(kept2) == len(set(kept2))


def test_stream_chunk_documents_equals_batch(spark, tmp_path):
    """chunk_documents is a stateless projection+explode, so the SAME
    operator body applies to a streaming frame unchanged (no watermark,
    no state) and matches its batch twin row-for-row — the property
    that lets a continuous curation pipeline chunk in-flight."""
    from distributed_crawl_spark.functions import curation as CU

    docs_dir = str(tmp_path / "docs")
    spark.read.parquet(f"{SF}/documents.parquet").write.parquet(docs_dir)
    schema = spark.read.parquet(docs_dir).schema
    stream = CU.chunk_documents(
        spark.readStream.schema(schema).parquet(docs_dir), win=32, stride=24
    )
    assert stream.isStreaming
    run_available_now(stream, str(tmp_path / "ck_chunks"), "chunks")
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk)
        for r in spark.table("chunks").collect()
    }
    want = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk)
        for r in CU.chunk_documents(
            spark.read.parquet(docs_dir), win=32, stride=24
        ).collect()
    }
    assert got == want and got
