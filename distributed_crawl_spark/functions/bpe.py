"""In-engine BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-prep step of a training-data pipeline, run where the corpus
lives instead of sampling it out.

Scale shape — the whole point: BPE trains on the WORD CENSUS, not the
corpus. The corpus is touched exactly once (one token explode + one
word groupBy); every merge iteration then runs over the distinct-word
table (vocabulary-sized — millions of rows at web scale, not billions)
as one pair-census aggregate plus one closed-form array fold, with the
single winning merge collected to the driver (one row per iteration —
the MODEL crosses to the driver, never data). ``localCheckpoint`` per
iteration keeps the plan flat, exactly like
:func:`~.dedup.near_dup_components`.

No DuckDB oracle: the trainer is iterative with argmax tie-breaks (the
driver contract's weaker rows-only check would apply); instead the
merge table and the segmentation are pytest-verified against a
pure-Python reference implementation of the classic algorithm.

Reference has no tokenizer (its analysis stage truncates characters,
utils.py); engine training-pipeline extension.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

END = "</w>"


def _word_census(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over the corpus — the only corpus-wide pass."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """One BPE merge applied left-to-right non-overlapping: fold the
    symbol array, replacing [... left] + right with [... left||right].
    A fresh merge result can't immediately re-merge as a LEFT element
    (its string differs from ``left``), matching the reference
    algorithm's non-overlapping scan."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(docs: DataFrame, k: int = 50,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``k`` BPE merges from the corpus. Returns the ordered merge
    list [(left, right), ...] — highest-count pair first, ties broken
    lexicographically (deterministic across runs and layouts).

    Each word starts as its character sequence plus the ``</w>``
    end-of-word marker; iteration i censuses adjacent symbol pairs
    weighted by word count, picks the argmax, and rewrites the symbol
    arrays with :func:`_merge_fold`. Stops early when no pair repeats.
    """
    census = _word_census(docs, text_col)
    words = census.select(
        "cnt",
        F.concat(
            F.split(F.col("word"), "(?!$)"), F.array(F.lit(END))
        ).alias("syms"),
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(k):
        pairs = words.select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i.cast("int") + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        ).filter(F.size("syms") > 1)
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right = top[0]["a"], top[0]["b"]
        merges.append((left, right))
        words = words.select(
            "cnt", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges


def make_segment_udf(merges: list[tuple[str, str]]):
    """Arrow-batched segmenter over a trained merge list: text →
    array<string>, merges applied in rank order per word with per-word
    memoization. The model ships in the closure (model-sized); zero
    shuffle — segmentation is embarrassingly parallel at any scale."""
    from pyspark.sql.functions import pandas_udf

    ranks = {m: i for i, m in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        if word in cache:
            return cache[word]
        syms = list(word) + [END]
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            left, right = best
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        cache[word] = syms
        return syms

    @pandas_udf("array<string>")
    def segment(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split():
                toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return segment


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]],
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Segment every document with a trained merge list: per doc,
    (id, bpe_tokens array<string>, n_bpe_tokens) via
    :func:`make_segment_udf` — one Arrow pass, zero shuffle."""
    segment = make_segment_udf(merges)
    return docs.select(
        id_col,
        segment(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))
