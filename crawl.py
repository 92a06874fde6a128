"""spark-submit entry point for the crawl engine.

    spark-submit --py-files engine.zip crawl.py \
        --pages /data/pages_parquet --seeds seeds.txt \
        --checkpoint /data/crawl_ckpt --rounds 10 --host-budget 64

On a cluster, drop ``--cores`` (the master/executors come from
spark-submit conf); locally ``--cores N`` runs ``local[N]``. ``--resume``
continues from the latest committed snapshot in ``--checkpoint`` (no
seeds needed). Pages input: parquet/Iceberg table with columns
``url, warc_ts, html, text, lang`` (see SURVEY.md §1.4).

Build engine.zip:  cd <repo> && zip -r engine.zip distributed_crawl_spark
"""

from __future__ import annotations

import argparse
import json
import sys

# CLI kw → argparse dest where the names differ
_DEST = {"max_rounds": "rounds", "use_bloom": "no_bloom"}


def explicit_cli_overrides(cli_kw: dict, defaults: dict) -> dict:
    """The subset of CLI-derived config kwargs the user actually set (value
    differs from the parser default) — only these override config-file
    values; untyped CLI defaults must not silently beat the file."""
    out = {}
    for k, v in cli_kw.items():
        dest = _DEST.get(k, k)
        default = defaults.get(dest)
        if k == "use_bloom":
            default = not default  # store_true no_bloom, inverted
        if v != default:
            out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="PySpark URL-frontier crawl")
    ap.add_argument("--pages", required=True, help="pages table path (parquet)")
    ap.add_argument("--seeds", help="URL-list file (one per line)")
    ap.add_argument("--seeds-csv", help="CSV seed file (site/lat/long/id columns)")
    ap.add_argument("--robots", help="robots table path (host, rules_text)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--max-levels", type=int, default=3)
    ap.add_argument("--host-budget", type=int, default=64)
    ap.add_argument("--host-budgets", metavar="PATH",
                    help="parquet (host, budget) table from an offline rank "
                         "job — rank_budgets(host_rank/trust_rank); merged "
                         "with Crawl-delay budgets by LEAST")
    ap.add_argument("--strip-params", metavar="PATH",
                    help="parquet (host, param, strippable) table from an "
                         "offline pagehealth.strippable_params job — each "
                         "host's content-proven tracking params are dropped "
                         "from child links before dedup/seen")
    ap.add_argument("--salt-threshold", type=int, default=100_000)
    ap.add_argument("--retry-attempts", type=int, default=3)
    ap.add_argument("--max-links", type=int, default=10)
    ap.add_argument("--no-bloom", action="store_true")
    ap.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom",
                    help="cuckoo is deletable (required for --expire-ttl forget mode)")
    ap.add_argument("--extract-mode", choices=["basic", "markdown"],
                    default="basic",
                    help="stored text shape: 'basic' = reference byte-"
                    "identical pipeline; 'markdown' = structure-preserving "
                    "markdown (crawl graph identical either way)")
    ap.add_argument("--content-dedup", action="store_true",
                    help="store ONE crawl_results row per distinct content "
                    "hash (the reference's hash-named-file overwrite "
                    "semantics); crawl flow is unaffected")
    ap.add_argument("--pages-format", choices=["parquet", "warc"],
                    default="parquet",
                    help="pages-table source: parquet (default) or WARC "
                    "segment files (.warc/.warc.gz dir or glob — Common "
                    "Crawl layout, one task per segment)")
    ap.add_argument("--drop-traps", action="store_true",
                    help="drop trap-shaped child links (repeated path "
                    "segments, param explosions, unbounded paths) before "
                    "dedup and the seen filter")
    ap.add_argument("--block-domains", metavar="D1,D2,...",
                    help="frontier domain blocklist: drop child links "
                    "whose host is (a subdomain of) a listed domain, "
                    "with the same timing as --drop-traps")
    ap.add_argument("--honor-nofollow", action="store_true",
                    help="drop rel=nofollow links (and all links of pages "
                    "with meta robots nofollow) from the crawl graph")
    ap.add_argument("--honor-noindex", action="store_true",
                    help="crawl meta-robots-noindex pages (links still "
                    "followed) but never store their content")
    ap.add_argument("--capture-anchors", action="store_true",
                    help="store each page's (target_url, anchor) pairs as a "
                    "crawl_results column (same Arrow pass as extraction); "
                    "--export-dir then also writes anchor_census/ (top-5 "
                    "inbound anchors per link target)")
    ap.add_argument("--focused-topic", metavar="W1,W2,...",
                    help="focused crawling (shark-search): re-rank each "
                    "parent's capped link list by inbound-anchor topic "
                    "relevance before seq assignment, so link budgets "
                    "spend themselves on topic-endorsed children first; "
                    "requires --capture-anchors")
    ap.add_argument("--strip-tracking", action="store_true",
                    help="strip utm_*/fbclid/gclid/msclkid params from "
                    "extracted links before dedup and the seen filter "
                    "(campaign variants collapse to one fetch)")
    ap.add_argument("--config", help="JSON config file (ConfigManager shape); "
                    "CLI flags override file values")
    ap.add_argument("--expire-ttl", type=int, metavar="ROUNDS",
                    help="before crawling (or instead, with --rounds 0): expire "
                    "completed URLs older than ROUNDS rounds")
    ap.add_argument("--expire-mode", choices=["requeue", "forget"],
                    default="requeue")
    ap.add_argument("--scratch-dir", help="round-local scratch root (e.g. "
                    "/dev/shm for tmpfs staging; default: under --checkpoint)")
    ap.add_argument("--export-dir", metavar="DIR",
                    help="after the crawl: write summary.json (K5), "
                    "status.csv (K6), and the partitioned results layout "
                    "(K3, parquet by (host_bucket, round)) under DIR")
    ap.add_argument("--export-warc", type=int, nargs="?", const=4,
                    metavar="SHARDS",
                    help="with --export-dir: also archive the fetched "
                    "pages (raw html joined back from the pages table) as "
                    "DIR/warc/part-*.warc.gz segments plus a sorted CDXJ "
                    "index DIR/warc_cdx/ with true member offsets "
                    "(default 4 shards)")
    ap.add_argument("--export-wet", type=int, nargs="?", const=4,
                    metavar="SHARDS",
                    help="with --export-dir: also publish the EXTRACTED "
                    "text of stored results as DIR/wet/part-*.warc.wet.gz "
                    "conversion-record segments + DIR/wet_manifest/ (the "
                    "Common Crawl WET sidecar; default 4 shards)")
    ap.add_argument("--stream-seeds", metavar="DIR",
                    help="continuous-ingestion mode: consume seed FILES "
                    "(one URL per line) landing in DIR as a stream — each "
                    "micro-batch injects its new URLs and crawls to drain "
                    "(Trigger.AvailableNow; checkpointed under "
                    "<checkpoint>/_seed_stream)")
    ap.add_argument("--cores", type=int, help="local[N] (omit under spark-submit)")
    args = ap.parse_args(argv)

    from distributed_crawl_spark.config import CrawlConfig
    from distributed_crawl_spark.session import build_session
    from distributed_crawl_spark.sources.seeds import load_seed_csv, load_url_list
    from distributed_crawl_spark.streaming.driver import CrawlDriver

    if args.cores:
        spark = build_session(app_name="crawl", cores=args.cores,
                              shuffle_partitions=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("crawl").getOrCreate()

    if args.pages_format == "warc":
        from distributed_crawl_spark.sources.warc import read_warc, warc_pages

        pages = warc_pages(read_warc(spark, args.pages))
    else:
        pages = spark.read.parquet(args.pages)
    robots = spark.read.parquet(args.robots) if args.robots else None
    cli_kw = dict(
        max_levels=args.max_levels,
        host_budget=args.host_budget,
        salt_threshold=args.salt_threshold,
        retry_attempts=args.retry_attempts,
        max_links=args.max_links,
        max_rounds=args.rounds,
        use_bloom=not args.no_bloom,
        seen_filter=args.seen_filter,
        scratch_dir=args.scratch_dir,
        content_dedup=args.content_dedup,
        strip_tracking=args.strip_tracking,
        extract_mode=args.extract_mode,
        capture_anchors=args.capture_anchors,
        focused_topic=tuple(
            w.strip() for w in (args.focused_topic or "").split(",")
            if w.strip()
        ),
        drop_traps=args.drop_traps,
        block_domains=tuple(
            d.strip() for d in args.block_domains.split(",") if d.strip()
        ) if args.block_domains else (),
        honor_nofollow=args.honor_nofollow,
        honor_noindex=args.honor_noindex,
        host_budgets_path=args.host_budgets,
        strip_params_path=args.strip_params,
    )
    if args.config:
        import os

        from distributed_crawl_spark.config_files import (
            ConfigManager,
            to_crawl_config,
        )

        mgr = ConfigManager(os.path.dirname(args.config) or ".")
        file_cfg = mgr.load_config(os.path.basename(args.config))
        defaults = {a.dest: a.default for a in ap._actions}
        cfg = to_crawl_config(
            file_cfg, defaults=cli_kw,
            **explicit_cli_overrides(cli_kw, defaults),
        )
    else:
        cfg = CrawlConfig(**cli_kw)
    driver = CrawlDriver(spark, pages, robots, cfg, args.checkpoint)

    if args.expire_ttl is not None:
        if not args.resume:
            ap.error("--expire-ttl requires --resume (an existing checkpoint)")
        n = driver.expire(args.expire_ttl, requeue=args.expire_mode == "requeue")
        print(json.dumps({"expired": n, "mode": args.expire_mode}))
        if args.rounds == 0:
            return 0

    if args.stream_seeds:
        from distributed_crawl_spark.streaming.stream import stream_crawl

        q = stream_crawl(
            spark, args.stream_seeds, pages, robots, cfg, args.checkpoint,
            f"{args.checkpoint}/_seed_stream",
        )
        q.awaitTermination()
        print(json.dumps(driver.progress()))
        if args.export_dir:
            _export(driver, args.export_dir, warc_shards=args.export_warc,
                    wet_shards=args.export_wet)
        return 0

    if args.resume:
        stats = driver.resume()
    else:
        if args.seeds_csv:
            seeds = load_seed_csv(spark, args.seeds_csv).select("url", "seq")
        elif args.seeds:
            seeds = load_url_list(spark, args.seeds)
        else:
            ap.error("--seeds or --seeds-csv required unless --resume")
        stats = driver.run(seeds)

    for s in stats:
        print(json.dumps(s.__dict__))
    if args.export_dir:
        _export(driver, args.export_dir, warc_shards=args.export_warc,
                    wet_shards=args.export_wet)
    return 0


def _export(driver, out_dir: str, warc_shards: int | None = None,
            wet_shards: int | None = None) -> None:
    """K5/K6/K3 post-crawl exports in one place (also used after
    --stream-seeds); ``warc_shards`` additionally archives the fetched
    pages as WARC segments + CDX index (see --export-warc)."""
    import datetime
    import os

    from distributed_crawl_spark.sinks.export import (
        export_status_csv,
        session_summary,
    )
    from distributed_crawl_spark.sinks.layout import export_results_layout

    os.makedirs(out_dir, exist_ok=True)
    session_summary(driver, path=os.path.join(out_dir, "summary.json"))
    export_status_csv(driver.current_status(), os.path.join(out_dir, "status.csv"))
    ts = datetime.datetime.now(datetime.timezone.utc).strftime("%Y%m%d_%H%M%S")
    results = driver.results()
    export_results_layout(results, os.path.join(out_dir, "results"), ts)
    if "anchors" in results.columns:
        # capture_anchors ran: census from the stored slim pairs column —
        # no html re-scan at export time
        from distributed_crawl_spark.functions.graph import (
            anchor_census_from_pairs,
        )

        anchor_census_from_pairs(results).write.mode("overwrite").parquet(
            os.path.join(out_dir, "anchor_census")
        )
    if warc_shards:
        # archive-what-you-fetched: raw html joined back from the pages
        # table for every stored result URL, written as .warc.gz segments
        # (one gzip member per record) + a sorted CDXJ index with true
        # member offsets — replayable by read_warc/read_cdx
        from distributed_crawl_spark.sinks.warc import cdx_lines, write_warc

        fetched = driver.pages.join(
            results.select("url").distinct(), "url"
        ).select("url", "warc_ts", "html")
        manifest = write_warc(
            fetched, os.path.join(out_dir, "warc"), n_shards=warc_shards
        )
        # global sort = range partition: every output file is sorted AND
        # the files themselves are in key order (Common Crawl's own
        # 300-sharded index layout), so binary-search range scans work
        cdx_lines(manifest).sort("line").write.mode("overwrite").text(
            os.path.join(out_dir, "warc_cdx")
        )
    if wet_shards:
        # publish-what-you-extracted: the stored text as WET conversion
        # records — the sidecar downstream text pipelines ingest without
        # touching html
        from distributed_crawl_spark.sinks.warc import write_wet

        write_wet(
            results.select("url", "last_modified", "text"),
            os.path.join(out_dir, "wet"), n_shards=wet_shards,
            ts_col="last_modified",
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "wet_manifest")
        )


if __name__ == "__main__":
    sys.exit(main())
