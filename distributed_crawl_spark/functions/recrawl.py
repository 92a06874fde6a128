"""Adaptive recrawl scheduling: change-rate estimation + staleness priority.

A continuous crawler (the reference, thebenjy/distributed_crawl, crawls
each URL once per session — see its single `visited` set) eventually
needs to RE-crawl, and the classic answer (Cho & Garcia-Molina, "The
Evolution of the Web and Implications for an Incremental Crawler",
VLDB 2000) is to model each page as a Poisson change process: estimate
a per-page change rate λ from the revisit history, then prioritize by
the probability the cached copy is stale,

    p_stale(t) = 1 - exp(-λ * age).

This module computes that signal as one DataFrame plan over a visit
log (page key, visit timestamp, content digest):

1. per page, sort visits by time and mark each revisit as changed /
   unchanged vs the previous digest (one window over the page key);
2. estimate the change ratio r = changes / revisit-intervals, capped
   below 1 (r = 1 gives λ = ∞; the standard fix caps the estimator at
   the resolution of the sample — here 999/1000);
3. λ̂ = -ln(1 - r) / mean_interval  (the MLE for Poisson arrivals
   observed through evenly-spaced snapshots);
4. p_stale at the log's horizon (max visit ts across the log), and the
   recrawl priority = p_stale.

Determinism contract: the float transcendentals (ln, exp) are applied
ONCE per page to integer-derived rationals and floor-quantized
immediately — ``lam_x1e9 = floor(-ln(1 - r_milli/1000) / mean_iv_s *
1e9)`` and ``p_stale_x1e6 = floor((1 - exp(-lam_x1e9 * age_s / 1e9)) *
1e6)`` — the same once-per-key quantization discipline as
``unigram_logprob`` / ``host_rank``, so the result hash-matches a
DuckDB oracle. All upstream counts/intervals are exact integers
(epoch seconds).

Scale story: one shuffle on the page key (the lag window and the
per-page aggregate share it — a 10^10-URL visit log partitions
uniformly by url hash), one broadcast 1-row horizon aggregate. Window
input per key is the page's own revisit history (bounded by revisit
policy, dozens not millions). No driver collects, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LAM_SCALE = 1_000_000_000  # λ in nano-units (per second)
P_SCALE = 1_000_000  # probabilities in micro-units
R_CAP_MILLI = 999  # change-ratio cap: r = 1 would give λ = ∞


def change_stats(visits: DataFrame, page_col: str = "page",
                 ts_col: str = "ts", digest_col: str = "digest",
                 order_col: str | None = None) -> DataFrame:
    """Per-page revisit statistics from a visit log.

    Returns one row per page with ≥ 2 visits:
    (page, n_visits, n_changes, span_s, last_ts) where ``n_changes``
    counts revisits whose digest differs from the previous visit and
    ``span_s`` is last_ts - first_ts in whole seconds.
    ``order_col`` breaks ties within identical timestamps."""
    cols = [
        F.col(page_col).alias("page"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(digest_col).alias("digest"),
    ]
    if order_col:
        cols.append(F.col(order_col).alias("__ord"))
    order = [F.col("ts")] + ([F.col("__ord")] if order_col else [])
    marked = visits.select(*cols).withColumn(
        "prev_digest",
        F.lag("digest").over(Window.partitionBy("page").orderBy(*order)),
    )
    return (
        marked.groupBy("page")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_visits"),
            F.sum(
                (
                    F.col("prev_digest").isNotNull()
                    & (F.col("digest") != F.col("prev_digest"))
                ).cast("long")
            ).cast("long").alias("n_changes"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).cast("long").alias("span_s"),
            F.max("ts").alias("last_ts"),
        )
        .where(F.col("n_visits") >= 2)
    )


def recrawl_priority(visits: DataFrame, page_col: str = "page",
                     ts_col: str = "ts", digest_col: str = "digest",
                     order_col: str | None = None) -> DataFrame:
    """Poisson staleness priority per page, integer-quantized.

    Returns (page, n_visits, n_changes, mean_iv_s, lam_x1e9, age_s,
    p_stale_x1e6) for every page with ≥ 2 visits and a positive mean
    revisit interval, ordered nowhere (callers sort). ``age_s`` is
    measured from the page's last visit to the log horizon (max ts in
    the log) — a deterministic "now" derived from the data itself, so
    the operator needs no wall clock."""
    stats = change_stats(visits, page_col=page_col, ts_col=ts_col,
                         digest_col=digest_col, order_col=order_col)
    horizon = visits.agg(
        F.unix_timestamp(F.max(F.col(ts_col).cast("timestamp")))
        .cast("long").alias("horizon_s")
    )
    # mean revisit interval in whole seconds; r capped at 999/1000.
    enriched = stats.crossJoin(F.broadcast(horizon)).select(
        "page",
        "n_visits",
        "n_changes",
        F.expr("span_s div (n_visits - 1)").cast("long").alias("mean_iv_s"),
        (F.col("horizon_s") - F.unix_timestamp("last_ts"))
        .cast("long").alias("age_s"),
        F.least(
            F.expr("(n_changes * 1000) div (n_visits - 1)"),
            F.lit(R_CAP_MILLI),
        ).cast("long").alias("r_milli"),
    ).where(F.col("mean_iv_s") > 0)
    lam = enriched.withColumn(
        "lam_x1e9",
        F.floor(
            -F.log(F.lit(1.0) - F.col("r_milli") / F.lit(1000.0))
            / F.col("mean_iv_s")
            * LAM_SCALE
        ).cast("long"),
    )
    return lam.select(
        "page",
        "n_visits",
        "n_changes",
        "mean_iv_s",
        "lam_x1e9",
        "age_s",
        F.floor(
            (
                F.lit(1.0)
                - F.exp(-(F.col("lam_x1e9") * F.col("age_s")) / F.lit(float(LAM_SCALE)))
            )
            * P_SCALE
        ).cast("long").alias("p_stale_x1e6"),
    )


def refetch_frontier(priorities: DataFrame, min_p_stale_x1e6: int = 0,
                     url_col: str = "page") -> DataFrame:
    """Turn :func:`recrawl_priority` output into frontier rows the
    politeness window drains STALEST-FIRST — the scheduler composition:
    ``rank_frontier`` orders each host lane by (level, attempt, seq),
    so encoding ``seq = P_SCALE - p_stale_x1e6`` (smaller = staler =
    first) makes per-host budgets spend themselves on the pages most
    likely to have changed, with zero changes to the politeness
    operator itself (same single window shuffle).

    ``min_p_stale_x1e6`` drops pages whose staleness probability hasn't
    reached the threshold — the "don't waste budget re-fetching what
    hasn't changed" knob (Cho & Garcia-Molina's uniform-allocation
    pitfall). Level/attempt are 0 (refetches are roots), parent lineage
    is null/self, discovered_round = -1 marks scheduler-injected rows.

    Output matches FRONTIER_SCHEMA so it unions straight into the
    driver's frontier table.
    """
    from ..functions.url import url_host

    kept = priorities.filter(F.col("p_stale_x1e6") >= min_p_stale_x1e6)
    return kept.select(
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        F.lit(0).cast("int").alias("level"),
        F.lit(0).cast("int").alias("attempt"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(-1).cast("long").alias("parent_seq"),
        F.lit(0).cast("int").alias("link_pos"),
        (F.lit(P_SCALE) - F.col("p_stale_x1e6")).cast("long").alias("seq"),
        F.lit(-1).cast("int").alias("discovered_round"),
    )
