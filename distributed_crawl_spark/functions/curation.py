"""Corpus-curation operators for training-data pipelines: deterministic
splits and per-source health rollups.

No reference analog (thebenjy/distributed_crawl stops at page storage);
these are the engine's extension contract for the steps between a
crawled corpus and a training run. Both are pure DataFrame plans with
md5-based arithmetic so the DuckDB oracle verifies values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int48
from .textstats import char_count, word_count

SPLIT_BUCKETS = 10_000


def split_bucket(id_col: Column) -> Column:
    """Deterministic split bucket in [0, 10000): md5-prefix hash of the
    STRING form of the id. Stable under repartitioning, cluster layout,
    and corpus growth — a document's bucket never changes when other
    documents are added, which is what makes hash splits (vs random or
    modulo-row-number splits) the only correct choice for an evolving
    10^10-doc corpus."""
    return md5_int48(id_col.cast("string")) % F.lit(SPLIT_BUCKETS)


def corpus_split(docs: DataFrame, id_col: str = "doc_id",
                 weights: dict[str, float] | None = None) -> DataFrame:
    """Assign every document to a named split by hash range.

    ``weights`` maps split name → fraction (summing to ≤ 1; any
    remainder falls into the last split). Ranges are cumulative over the
    dict's insertion order, so ``{"train": .9, "val": .05, "test": .05}``
    gives buckets [0,9000) → train, [9000,9500) → val, rest → test.
    Returns (id, split, bucket) — bucket kept so downstream samplers can
    sub-slice a split without rehashing.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = split_bucket(F.col(id_col))
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond = b < int(round(edge * SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return docs.select(id_col, expr.alias("split"), b.alias("bucket"))


def per_source_cap(docs: DataFrame, k: int, id_col: str = "doc_id",
                   text_col: str = "text",
                   source_col: str = "source") -> DataFrame:
    """Corpus balancing: keep at most ``k`` documents per source, best
    quality first (the C4-style per-domain cap that stops one mega-site
    from dominating a training mix). Ranking = (quality_score_int DESC,
    doc_id ASC) — deterministic and engine-portable (integer composite);
    one window shuffle keyed by source.
    At corpus scale a Zipf-head source funnels through one window
    partition — acceptable because the window emits at most k rows per
    source and the rank never materializes beyond the partition scan;
    for extreme heads pre-filter with ``corpus_split`` buckets.
    Returns (doc_id, source, quality, rank_in_source).
    """
    from pyspark.sql.window import Window

    from .textstats import quality_score_int

    scored = docs.select(
        id_col, source_col,
        quality_score_int(F.col(text_col)).alias("quality"),
    )
    w = Window.partitionBy(source_col).orderBy(
        F.desc("quality"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= k)
        .select(id_col, source_col, "quality", "rank_in_source")
    )


def source_rollup(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Per-source corpus health: document count, token/char volume, and
    how many of the source's documents are exact duplicates of ANY
    document corpus-wide (the crawl-prioritization signal — a source
    whose content is mostly seen elsewhere isn't worth recrawl budget).

    Plan: digest census (one uniform groupBy on md5(text)) joined back
    to the docs, then one rollup shuffle keyed by source. Returns
    (source, n_docs, sum_tokens, sum_chars, n_dup_docs) sorted-stable by
    the compare harness.
    """
    digest = F.md5(F.col(text_col)).alias("digest")
    census = (
        docs.select(digest)
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )
    tagged = docs.select(
        source_col,
        word_count(F.col(text_col)).alias("wc"),
        char_count(F.col(text_col)).alias("cc"),
        digest,
    ).join(census, "digest")
    return tagged.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("wc").alias("sum_tokens"),
        F.sum("cc").alias("sum_chars"),
        F.sum((F.col("n_copies") > 1).cast("long")).alias("n_dup_docs"),
    )
