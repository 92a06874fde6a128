"""Micro-batch crawl driver (SURVEY.md §2.13/§3.4).

The reference's scheduler tick (run_crawl_local.py:269-313) becomes a
round loop: each round is one set of declarative plans committed as one
atomic snapshot. The loop is the only imperative remnant — everything
inside a round is Catalyst-planned DataFrame dataflow; the shape matches
a Structured-Streaming ``foreachBatch`` body so a ``Trigger.AvailableNow``
wrapper could drive it unchanged.

Per-round lineage counters (BASELINE.json): urls_seen, fetched, deduped,
deferred_by_politeness (+ failed, robots_denied, new_frontier) land in the
``round_metrics`` append table and the commit pointer metadata.

Resume: state lives entirely in the checkpoint; ``CrawlDriver.resume()``
continues from the latest committed round — mid-round crashes replay the
whole round (rounds are idempotent because commits are all-or-nothing).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators.fetch import fetch_and_extract
from ..operators.politeness import select_round
from ..operators.robots import apply_robots_gate
from ..operators.seen import BloomSeenFilter, filter_unseen
from ..plans.round import (
    FRONTIER_COLS,
    child_candidates,
    seeds_to_frontier,
    split_fetch_results,
)
from ..schema import ROUND_METRICS_SCHEMA
from .checkpoint import CheckpointStore

_SEEN_COLS = [
    "url", "url_hash", "status", "level", "attempt",
    "parent_url", "discovered_round", "seq",
]


def _seen_events(frontier_like: DataFrame, status: str, round_no: int) -> DataFrame:
    """Status-event rows for the append-only url_seen log."""
    return frontier_like.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.lit(status).alias("status"),
        "level",
        "attempt",
        "parent_url",
        F.lit(round_no).alias("discovered_round"),
        "seq",
    )


@dataclass
class RoundStats:
    round: int
    urls_seen: int
    fetched: int
    failed: int
    deduped: int
    deferred_by_politeness: int
    robots_denied: int
    new_frontier: int


class CrawlDriver:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame | None,
        cfg: CrawlConfig,
        checkpoint_dir: str,
    ):
        cfg.validate()
        self.spark = spark
        self.pages = pages
        self.robots = robots
        self.cfg = cfg
        self.store = CheckpointStore(checkpoint_dir)
        self.bloom = (
            BloomSeenFilter(cfg.bloom_buckets, cfg.bloom_bits)
            if cfg.use_bloom
            else None
        )
        self.stats: list[RoundStats] = []

    # -- lifecycle -------------------------------------------------------------

    def start(self, seeds: DataFrame) -> None:
        """Round -1 commit: seeds → frontier + seen(pending) + bloom."""
        frontier = seeds_to_frontier(seeds)
        staging = self.store.begin()
        frontier = staging.write_replace("frontier", frontier)
        staging.write_append("url_seen", _seen_events(frontier, "pending", 0))
        if self.bloom:
            state = self.bloom.insert(
                self.bloom.empty_state(self.spark), frontier.select("url")
            )
            staging.write_replace("bloom_state", state)
        staging.finalize({"round": -1})

    def run(self, seeds: DataFrame | None = None) -> list[RoundStats]:
        """Full crawl: start (unless resuming) then loop until the frontier
        drains or max_rounds."""
        if seeds is not None:
            self.start(seeds)
        round_no = self._next_round()
        while round_no < self.cfg.max_rounds:
            stats = self.run_round(round_no)
            self.stats.append(stats)
            if stats.new_frontier == 0 and self._frontier_empty():
                break
            round_no += 1
        return self.stats

    def resume(self) -> list[RoundStats]:
        """Continue from the latest committed snapshot."""
        return self.run(seeds=None)

    def _next_round(self) -> int:
        meta = self.store.latest_meta()
        if meta is None:
            raise RuntimeError("no checkpoint to resume from — call start()")
        return meta.get("round", -1) + 1

    def _frontier_empty(self) -> bool:
        return self.store.read(self.spark, "frontier").limit(1).count() == 0

    # -- one round ---------------------------------------------------------------

    def run_round(self, round_no: int) -> RoundStats:
        spark, cfg = self.spark, self.cfg
        frontier = self.store.read(spark, "frontier")
        staging = self.store.begin()

        # 1. robots gate
        if self.robots is not None:
            allowed, denied = apply_robots_gate(frontier, self.robots)
        else:
            allowed, denied = frontier, frontier.limit(0)

        # 2. politeness window
        selected, deferred = select_round(
            allowed, cfg.host_budget, cfg.salt_threshold, cfg.max_salts
        )

        # 3. fetch + extract — materialized once (staged write cuts lineage
        #    so the pandas-UDF extraction never re-executes downstream)
        fetched = fetch_and_extract(
            selected, self.pages, cfg.max_links, cfg.extract_links
        )
        # replace-mode scratch: one materialization per round, GC'd later
        fetched = staging.write_replace(
            "_round_fetch",
            fetched.withColumn("round", F.lit(round_no)),
        )

        ok, retry, failed = split_fetch_results(fetched, cfg)

        # slim per-attempt log (url, round, level, attempt, ok) — the crawl
        # ordering evidence (attempt = reference attempt_count, 1-based)
        staging.write_append(
            "fetch_log",
            fetched.select(
                "url", "round", "level",
                (F.col("attempt") + 1).alias("attempt"),
                "ok", "seq", "status_code",
            ),
        )

        # 4. results delta
        results = ok.select(
            "url", "seq", "level", "round", "text", "md_hash", "page_slug",
            "filename", "method", "status_code", "content_length",
            "last_modified", "extracted_links",
            F.col("geo_blocked").cast("string").alias("geo_blocked"),
        )
        staging.write_append("crawl_results", results)

        # 5. children: extract links → filter → batch-dedup → seen-filter
        candidates = child_candidates(ok, cfg, round_no)
        url_seen = self.store.read(spark, "url_seen")
        bloom_state = (
            self.store.read(spark, "bloom_state") if self.bloom else None
        )
        new_frontier = filter_unseen(
            candidates.select(*FRONTIER_COLS), url_seen, self.bloom, bloom_state
        )

        # 6. next frontier = deferred ∪ retries ∪ new children — staged
        next_frontier = (
            deferred.select(*FRONTIER_COLS)
            .unionByName(retry.select(*FRONTIER_COLS))
            .unionByName(new_frontier.select(*FRONTIER_COLS))
        )
        next_frontier = staging.write_replace("frontier", next_frontier)

        # 7. url_seen delta: new pending + completed + failed (+ robots)
        new_children = next_frontier.filter(
            F.col("discovered_round") == round_no + 1
        )
        seen_delta = (
            _seen_events(new_children, "pending", round_no + 1)
            .unionByName(_seen_events(ok, "completed", round_no))
            .unionByName(_seen_events(failed, "failed", round_no))
            .unionByName(_seen_events(denied, "robots_denied", round_no))
        )
        staging.write_append("url_seen", seen_delta)

        # 8. errors delta (K4/R2 semantics: reason + 200-char preview)
        errors = failed.select(
            "url",
            F.lit(round_no).alias("round"),
            F.lit("fetch_miss_max_retries").alias("reason"),
            F.concat(F.lit("status "), F.col("status_code")).alias("error"),
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 200).alias("preview"),
        ).unionByName(
            denied.select(
                "url",
                F.lit(round_no).alias("round"),
                F.lit("robots_denied").alias("reason"),
                F.lit(None).cast("string").alias("error"),
                F.lit(None).cast("string").alias("preview"),
            )
        )
        staging.write_append("errors", errors)

        # 9. bloom insert for the newly-enqueued urls
        if self.bloom:
            new_bloom = self.bloom.insert(bloom_state, new_children.select("url"))
            staging.write_replace("bloom_state", new_bloom)

        # 10. metrics — counts over already-materialized deltas (cheap)
        n_candidates = candidates.count()
        n_new = new_children.count()
        stats = RoundStats(
            round=round_no,
            urls_seen=n_new,
            fetched=fetched.filter(F.col("ok")).count(),
            failed=failed.count(),
            deduped=n_candidates - n_new,
            deferred_by_politeness=deferred.count(),
            robots_denied=denied.count(),
            new_frontier=n_new,
        )
        metrics_row = spark.createDataFrame(
            [
                (
                    stats.round, stats.urls_seen, stats.fetched, stats.failed,
                    stats.deduped, stats.deferred_by_politeness,
                    stats.robots_denied, stats.new_frontier,
                )
            ],
            schema=ROUND_METRICS_SCHEMA,
        )
        staging.write_append("round_metrics", metrics_row)

        staging.finalize({"round": round_no, "metrics": stats.__dict__})
        return stats

    # -- views --------------------------------------------------------------------

    def seen_set(self) -> DataFrame:
        """Distinct ever-enqueued URLs (the reference's crawl_status keys)."""
        return self.store.read(self.spark, "url_seen").select("url").distinct()

    def current_status(self) -> DataFrame:
        """Latest status per URL from the append-only event log."""
        seen = self.store.read(self.spark, "url_seen")
        # terminal events (completed/failed/robots_denied) outrank pending
        # within the same round; later rounds outrank earlier ones.
        rank = F.when(F.col("status") == "pending", 0).otherwise(1)
        return (
            seen.groupBy("url")
            .agg(
                F.max_by(
                    F.struct("status", "level", "attempt", "parent_url", "seq"),
                    F.struct("discovered_round", F.col("attempt"), rank.alias("rank")),
                ).alias("w")
            )
            .select("url", "w.status", "w.level", "w.attempt", "w.parent_url", "w.seq")
        )

    def results(self) -> DataFrame:
        return self.store.read(self.spark, "crawl_results")

    def metrics(self) -> DataFrame:
        return self.store.read(self.spark, "round_metrics")
