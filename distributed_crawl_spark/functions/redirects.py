"""Redirect-chain resolution for URL canonicalization at frontier scale.

A crawler that stores 301/302/meta-refresh targets as (src, dst) edges
needs every frontier URL mapped to its TERMINAL location before dedup
and politeness scheduling — otherwise the same page is fetched once per
alias and the seen-set fills with chain intermediaries. The reference
crawler (thebenjy/distributed_crawl, crawler.py's single-process fetch
loop) follows redirects inline per request; at a 10^10-URL frontier the
chains live in a table and must be resolved as a JOB.

The naive per-hop self-join is O(max_hops) shuffles. This module uses
pointer doubling: the mapping m_k(x) = "node reached from x after
2^k steps (saturating at terminals)" composes with itself in one
hash join per round, so ``max_hops`` is covered in ``log2(max_hops)``
rounds — 5 joins for 32 hops, 34 for 2^34. Each round's mapping table
is exactly |nodes| rows (never grows), keyed by node id (uniform —
md5-distributed URL strings), and ``localCheckpoint`` keeps the plan
linear, the same iteration idiom as
:func:`~distributed_crawl_spark.functions.graph.host_rank`.

Determinism contract: hop counts are exact integers (terminal
self-loops contribute 0, so composition h = h_a + h_b saturates at the
true chain length), and a non-functional edge list is first reduced to
min(dst) per src — bit-identical across engines and partition layouts,
so the DuckDB recursive-CTE oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 8,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """Resolve every redirect source to its terminal URL.

    ``edges`` holds one redirect hop per row (src → dst). Sources with
    several recorded targets (re-crawls disagreeing) are reduced to the
    lexicographically smallest dst first, making the map functional and
    the result layout-independent.

    Returns (src, final, hops, resolved) for every distinct src:

    - ``final``: the node reached after following at most ``max_hops``
      hops — the terminal URL when the chain ends, else the node
      reached after exactly ``max_hops`` steps (cycles land wherever
      ``max_hops mod cycle_length`` says, same as a stepwise walk).
    - ``hops``: exact number of hops taken (≤ ``max_hops``).
    - ``resolved``: true iff ``final`` has no outgoing redirect — false
      flags a cycle or a chain longer than ``max_hops``, both of which
      a frontier should quarantine rather than enqueue.

    ``max_hops`` must be a power of two (the doubling schedule covers
    exactly 2^k steps per round).

    Scale shape: one groupBy(src) to functionalize, one left-anti to
    find terminals, then log2(max_hops) self-joins on a |nodes|-row
    table — every shuffle keyed by node id. No driver collects, no
    per-hop iteration over the longest chain.
    """
    k = max_hops.bit_length() - 1
    if max_hops <= 0 or (1 << k) != max_hops:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")

    e = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("to"))
        .groupBy("node")
        .agg(F.min("to").alias("to"))
        .localCheckpoint()
    )
    # Targets that never redirect are fixed points with hop cost 0, so
    # the composition join is total over the node set.
    terminals = (
        e.select(F.col("to").alias("node"))
        .distinct()
        .join(e.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("to"))
    )
    m = (
        e.withColumn("h", F.lit(1).cast("long"))
        .unionByName(terminals.withColumn("h", F.lit(0).cast("long")))
        .localCheckpoint()
    )
    for _ in range(k):
        b = m.select(
            F.col("node").alias("b_node"),
            F.col("to").alias("b_to"),
            F.col("h").alias("b_h"),
        )
        m = (
            m.join(b, m["to"] == b["b_node"])
            .select(
                "node",
                F.col("b_to").alias("to"),
                (F.col("h") + F.col("b_h")).alias("h"),
            )
            .localCheckpoint()
        )
    # Report redirect sources only; resolved = final has no out-edge.
    out_edges = e.select(F.col("node").alias("final_node"))
    return (
        m.join(e.select("node"), "node", "semi")
        .join(out_edges, m["to"] == out_edges["final_node"], "left")
        .select(
            F.col("node").alias("src"),
            F.col("to").alias("final"),
            F.col("h").alias("hops"),
            F.col("final_node").isNull().alias("resolved"),
        )
    )


def redirect_aliases(resolved: DataFrame) -> DataFrame:
    """Alias-group census from :func:`resolve_redirects` output.

    Groups resolved sources by terminal URL and counts the aliases each
    terminal accumulates — the dedup dividend of resolution (every
    alias beyond the first is a fetch the frontier no longer makes).
    Unresolved rows (cycles, over-long chains) are excluded: they have
    no terminal to canonicalize to.

    Returns (final, n_aliases, max_hops_seen). One map-side-combinable
    groupBy keyed by terminal URL.
    """
    return (
        resolved.where(F.col("resolved"))
        .groupBy("final")
        .agg(
            F.count(F.lit(1)).alias("n_aliases"),
            F.max("hops").alias("max_hops_seen"),
        )
    )
