"""Benchmark harness — prints ONE JSON line.

Two workloads:

1. **Crawl engine** (the north-star metric): generate a Zipf-host page
   corpus sized to the SF, run the full round driver (politeness window →
   fetch join → pandas-UDF extract → link explode → seen anti-join →
   checkpoint commit) and report URLs fetched+deduped per second.
2. **Headline queries** from ``__spark_entry__.queries()`` at
   ``$SPARK_GRAFT_SF_DIR`` — per-query wall seconds (noop sink, so the
   number is plan execution, not driver collect).

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  SPARK_GRAFT_BENCH    'all' (default) | 'crawl' | 'queries'

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {...}, "sf": ..., "crawl": {...}, "cpus": N}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


N_BUCKETS = 64


def _bucketed_pages(spark, n_pages: int):
    """Materialize the corpus as a url-bucketed table — the 10^10-scale
    layout (SURVEY.md §4.3): the fetch join then shuffles ONLY the slim
    frontier side into the bucket layout; the fat html column never moves
    and nothing is broadcast. Generation cost stays out of the crawl
    measurement (on a real cluster pages are a pre-existing Iceberg table);
    SPARK_GRAFT_PAGES_CACHE reuses the files across runs (generation is
    deterministic in n_pages)."""
    from distributed_crawl_spark import corpus

    cache = os.environ.get("SPARK_GRAFT_PAGES_CACHE", "/tmp/bench_pages_cache")
    base = cache or tempfile.mkdtemp(prefix="bench_pages_")
    if cache:
        os.makedirs(base, exist_ok=True)
    name = f"bench_pages_{n_pages}_b{N_BUCKETS}"
    pages_dir = os.path.join(base, name)
    if not os.path.isdir(pages_dir) or not os.listdir(pages_dir):
        (
            corpus.scaled_pages(spark, n_pages)
            .repartition(N_BUCKETS, "url")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(N_BUCKETS, "url")
            .sortBy("url")
            .option("path", pages_dir)
            .saveAsTable(name)
        )
    elif name not in [t.name for t in spark.catalog.listTables()]:
        spark.sql(
            f"CREATE TABLE {name} (url STRING, warc_ts TIMESTAMP, html BINARY,"
            f" text STRING, lang STRING) USING PARQUET"
            f" CLUSTERED BY (url) SORTED BY (url) INTO {N_BUCKETS} BUCKETS"
            f" LOCATION '{pages_dir}'"
        )
    return spark.table(name), (None if cache else base)


def run_crawl(spark, sf: float, cpus: int) -> dict:
    from distributed_crawl_spark import corpus
    from distributed_crawl_spark.config import CrawlConfig
    from distributed_crawl_spark.streaming.driver import CrawlDriver

    # sized so per-URL work (extraction UDF, hashing, dedup shuffles)
    # dominates per-round fixed costs — the regime a real cluster runs in
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", 0)) or max(
        20_000, int(20_000_000 * sf)
    )
    n_seeds = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", 0)) or max(
        1000, n_pages // 5
    )
    pages, scratch = _bucketed_pages(spark, n_pages)
    seeds = corpus.scaled_seeds(spark, n_pages, n_seeds)

    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    cfg = CrawlConfig(
        max_levels=3,
        host_budget=1024,
        salt_threshold=2000,
        max_rounds=3,
        use_bloom=True,
        fetch_join_strategy="shuffle",  # bucketed pages: one-sided shuffle
        # A/B knob: serialize the per-round fork-join write groups
        concurrent_commits=os.environ.get("SPARK_GRAFT_SERIAL_COMMITS") != "1",
        # optional tmpfs staging for round-local scratch (A/B knob)
        scratch_dir=os.environ.get("SPARK_GRAFT_SCRATCH_DIR") or None,
    )
    drv = CrawlDriver(spark, pages, None, cfg, ckpt)
    # seed bootstrap (round -1 commit) is one-time corpus setup, not a
    # fetch round — the north-rule metric is FETCH-ROUND throughput
    drv.start(seeds)
    t0 = time.monotonic()
    stats = drv.resume()
    crawl_s = time.monotonic() - t0
    fetched = sum(s.fetched for s in stats)
    deduped = sum(s.deduped for s in stats)
    failed = sum(s.failed for s in stats)
    shutil.rmtree(ckpt, ignore_errors=True)
    if scratch:
        shutil.rmtree(scratch, ignore_errors=True)
    processed = fetched + deduped + failed
    return {
        "n_pages": n_pages,
        "n_seeds": n_seeds,
        "rounds": len(stats),
        "fetched": fetched,
        "deduped": deduped,
        "failed": failed,
        "seconds": round(crawl_s, 3),
        "urls_per_sec": round(processed / crawl_s, 2),
        "urls_per_sec_per_core": round(processed / crawl_s / cpus, 3),
    }


HEADLINE = [
    "url_slug", "content_hash", "link_dedup_cap", "politeness_window",
    "seen_anti_join", "level_stats", "seed_join", "pricing_summary",
    "hourly_events", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash64",
    "dedup_simhash_pairs", "dedup_components", "dedup_embedding_lsh",
    "semdedup",
    "ann_topk", "ann_lsh", "ann_ivf", "pq_encode", "pq_topk", "pq_rerank",
    "lang_id", "quality_score", "token_count", "doc_fingerprint",
    "unigram_logprob", "script_profile",
    "train_corpus_filter", "corpus_split", "corpus_sample",
    "decontaminate", "span_scrub", "mix_report", "mix_plan",
    "incremental_dedup",
    "pack_shards", "pack_examples", "shard_manifest", "url_strip_tracking",
    "dedup_doc_lines", "dedup_lines_global",
    "quality_quantile_gate",
    "host_rank", "anchor_census", "error_backoff", "corpus_diff",
    "doc_keywords", "normalize_nfc", "url_trap_filter", "sitemap_parse",
    "sessionize", "session_stats",
    "source_rollup",
    "pii_redact", "quality_repetition", "train_corpus_neardup", "train_corpus_full", "top_ngrams", "source_cap",
    "multimodal_meta", "audio_chunks",
    "c4_clean", "ccnet_buckets", "blocklist_filter", "dedup_exact_norm",
    "sitemap_lastmod", "image_dhash", "image_neardup",
    "recrawl_priority", "bm25_search", "bigram_logprob", "hits_scores",
    "substring_dedup", "source_entropy", "decontaminate_semantic",
    "source_similarity", "dup_rate_by_source",
    "chunk_documents", "blocklist_mine", "tokenizer_stats",
    "url_template_mine", "politeness_audit", "mirror_detect",
    "gate_agreement", "drain_plan", "dedup_cluster_stats",
    "sitemap_coverage", "robots_audit", "importance_sample",
    "bitext_mine", "bitext_mine_ivf", "phrase_search", "phrase_index_search", "focused_frontier",
    "index_neardup",
    "link_spam_signals", "trust_rank", "spam_mass", "reciprocal_links",
    "host_language_mix",
    "dedup_containment", "host_communities", "video_frames", "pii_cc_luhn",
    "redirect_resolve", "redirect_aliases", "lane_assign", "lane_load",
    "soft404_flags", "soft404_hosts", "strippable_params",
    "tfidf_keywords", "degree_census", "degree_histogram",
    "canonical_urls", "contract_edges", "collocations", "cluster_split",
    "domain_rollup",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # untimed warmup: JIT + codegen + scan caches, so the FIRST headline
    # query isn't charged for JVM cold-start (in queries-only mode it
    # previously absorbed ~5-10s of warmup)
    qs[HEADLINE[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = os.environ.get("SPARK_GRAFT_BENCH", "all")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from distributed_crawl_spark.session import build_session

    spark = build_session(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    crawl = run_crawl(spark, sf, cpus) if mode in ("all", "crawl") else {}
    queries = run_queries(spark, sf_dir) if mode in ("all", "queries") else {}
    total = time.monotonic() - t0

    print(json.dumps({
        "metric": "urls_fetched_deduped_per_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "crawl": crawl,
    }))


if __name__ == "__main__":
    main()
