"""Host-graph analytics for crawl prioritization.

A frontier scheduler at 10^10 URLs cannot treat every host equally:
which host's queue to drain first is a ranking problem over the host
link graph (who links to whom, aggregated from page out-links). The
reference crawler (thebenjy/distributed_crawl) schedules FIFO within a
concurrency budget and has no graph signal; this module adds the
standard one — PageRank-style power iteration — as a DataFrame-native
iterative job, the same shape as
:func:`~distributed_crawl_spark.functions.dedup.near_dup_components`.

Determinism contract: ranks are QUANTIZED to integer micro-units
(x1e6) and every update uses integer floor arithmetic only. Floating
point summation is order-dependent (a + b + c ≠ c + a + b in the last
ulp), so a float PageRank can differ run-to-run with partition layout;
the integer form is bit-identical across engines, layouts, and the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_UNIT = 1_000_000  # 1.0 in micro-units


def host_rank(edges: DataFrame, iters: int = 5, damping_x1000: int = 850,
              src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """PageRank over a host multigraph, quantized to integer micro-units.

    Update per iteration (all integer ops)::

        contrib(e) = pr(src(e)) // outdeg(src(e))          per edge
        pr'(h)     = (1000 - d)*1000 + d * sum(contrib) // 1000

    with ``d = damping_x1000`` (850 = the classic 0.85). Parallel edges
    count once each (a host linking twice sends twice the mass) —
    pre-``distinct()`` the edge list for simple-graph semantics.
    Dangling mass (hosts with no out-edges) is dropped, the common
    large-scale simplification: ranks are used comparatively for queue
    ordering, not as true probabilities.

    Scale shape: the edge list joins the current rank table on ``src``
    (uniform hash join — a popular DESTINATION host skews nothing here;
    the groupBy on ``dst`` is map-side combinable so even 10^6 in-links
    partial-aggregate before the exchange), then one groupBy(dst) and
    one left join back to the node set. Three shuffles per iteration,
    each keyed by host id; ``localCheckpoint`` per iteration keeps the
    plan linear. Overflow bound: sum(contrib) ≤ |hosts| · RANK_UNIT, so
    the 850× product stays in int64 up to ~10^13 hosts.

    Returns (host, pr_x1e6) for every host appearing as src or dst.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = e.join(outdeg, "src").localCheckpoint()  # static across iterations
    base = F.lit((1000 - damping_x1000) * 1000).cast("long")
    ranks = nodes.withColumn("pr_x1e6", F.lit(RANK_UNIT).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(
                ranks.select(
                    F.col("host").alias("src"), F.col("pr_x1e6").alias("pr")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(
                F.sum(F.floor(F.col("pr") / F.col("outdeg")).cast("long"))
                .alias("s")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["host"] == contrib["dst"], "left")
            .select(
                "host",
                (base + F.floor(
                    F.lit(damping_x1000) * F.coalesce(F.col("s"), F.lit(0))
                    / F.lit(1000)
                ).cast("long")).alias("pr_x1e6"),
            )
            .localCheckpoint()
        )
    return ranks


def rank_budgets(ranks: DataFrame, total_budget: int,
                 min_budget: int = 1) -> DataFrame:
    """Turn :func:`host_rank` output into per-host politeness budgets —
    the "priority queue" composition: instead of every host getting the
    same per-round fetch budget, a round's ``total_budget`` slots are
    allocated proportionally to host rank, so well-linked hosts drain
    faster while ``min_budget`` keeps every host live (no starvation).

    ``budget(h) = max(min_budget, total_budget * pr(h) // sum(pr))`` —
    integer floor allocation (deterministic; the sum of budgets can
    exceed ``total_budget`` only via the min-budget floor, and can fall
    short by at most one slot per host from flooring — politeness
    budgets are soft targets, not exact quotas).

    The rank sum is a one-row aggregate cross-joined back (broadcast of
    a single row — no collect, stays a pure plan). Output (host,
    budget) plugs directly into
    :func:`~distributed_crawl_spark.operators.politeness.rank_frontier`'s
    ``host_budgets`` parameter, which broadcast-joins it onto the
    frontier — the whole priority path adds zero shuffles to the round.
    """
    tot = ranks.agg(F.sum("pr_x1e6").alias("__tot"))
    return (
        ranks.crossJoin(F.broadcast(tot))
        .select(
            "host",
            F.greatest(
                F.lit(min_budget).cast("long"),
                F.floor(
                    F.lit(total_budget) * F.col("pr_x1e6") / F.col("__tot")
                ).cast("long"),
            ).alias("budget"),
        )
    )


def anchor_census(pages: DataFrame, k: int = 5,
                  url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Inbound anchor-text census: for every link TARGET, the top-``k``
    anchor strings the web uses to describe it, with counts — the
    classic link-graph side product (anchor corpora train retrieval and
    title models; "what others call this page" beats the page's own
    title for ranking). No reference analog (the reference crawler
    discards anchor text at extraction, webcrawleranalyzer.py:139-140);
    this is the engine's web-graph extension.

    Plan: one Arrow pass over html (``anchor_pairs_udf`` — the page's
    bytes cross into Python exactly once, same batch shape as the
    extract UDF) → explode → ONE map-side-combinable census shuffle on
    (target, anchor) → per-target top-k. ``row_number() <= k`` gets
    Catalyst's map-side WindowGroupLimit(Partial) (measured for
    per_source_cap, BENCH.md), so a target the whole web links to — the
    Zipf head of inbound links — forwards at most k rows per map task,
    never its full inbound census, into the rank exchange. Ties break
    (n DESC, anchor ASC) for deterministic, oracle-checkable output.
    Returns (target_url, anchor, n, rank).
    """
    from .text import anchor_pairs_udf

    pairs = pages.select(
        F.explode(
            anchor_pairs_udf(F.col(url_col), F.col(html_col))
        ).alias("p")
    )
    return _census_topk(pairs, k)


def anchor_census_from_pairs(results: DataFrame, k: int = 5,
                             pairs_col: str = "anchors") -> DataFrame:
    """:func:`anchor_census` over PRE-CAPTURED pairs — the crawl-export
    path. A crawl run with ``CrawlConfig.capture_anchors`` stores each
    page's (target_url, anchor) pairs as a crawl_results column (harvested
    in the extract UDF's Arrow pass, operators/fetch.py), so the census at
    export time is explode → one map-side-combinable shuffle over a slim
    parquet column — NO html re-scan, no second Python crossing of the
    page bytes. Output schema and semantics identical to
    :func:`anchor_census` on the same fetched pages."""
    pairs = results.select(F.explode(F.col(pairs_col)).alias("p"))
    return _census_topk(pairs, k)


def _census_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Shared census stage: exploded pair structs → per-target top-k."""
    from pyspark.sql.window import Window

    census = (
        pairs.select(
            F.col("p.target_url").alias("target_url"),
            F.col("p.anchor").alias("anchor"),
        )
        .groupBy("target_url", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("target_url").orderBy(
        F.col("n").desc(), F.col("anchor")
    )
    return (
        census.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
