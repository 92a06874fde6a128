"""In-engine BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-prep step of a training-data pipeline, run where the corpus
lives instead of sampling it out.

Scale shape — the whole point: BPE trains on the WORD CENSUS, not the
corpus. The corpus is touched exactly once (one token explode + one
word groupBy); every merge iteration then runs over the distinct-word
table (vocabulary-sized — millions of rows at web scale, not billions)
as one pair-census aggregate plus one closed-form array fold, with only
the winning merge batch collected to the driver (≤8·batch slim rows per
pass — the MODEL crosses to the driver, never data). ``batch=M``
accepts up to M merge-independent pairs per census pass, cutting the
job count from k to ~k/M — the driver-paced per-merge job was the one
structural scale problem of the sequential form. ``localCheckpoint``
per pass keeps the plan flat, exactly like
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


_SEP = "\x00"  # never occurs inside a symbol: symbols are characters
               # of whitespace-split words (and their concats)


def _merge_fold(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a BATCH of symbol-disjoint BPE merges in one left-to-right
    non-overlapping fold: replace [... left] + right with
    [... left||right] whenever (left, right) is in the batch. One map
    lookup per element keeps the expression size constant in the batch
    width. A fresh merge result can't immediately re-merge as a LEFT
    element (its concat string differs from every batch symbol — the
    selector guarantees it), matching the reference algorithm's
    non-overlapping scan; because the batch shares no symbols, at most
    one rule can fire at any position, so the simultaneous fold equals
    applying the merges one-at-a-time in rank order."""
    lut = F.create_map(
        *[c for l, r in merges for c in (F.lit(l + _SEP + r), F.lit(l + r))]
    )
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & F.element_at(
                lut, F.concat(F.element_at(acc, -1), F.lit(_SEP), s)
            ).isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.element_at(
                        lut, F.concat(F.element_at(acc, -1), F.lit(_SEP), s)
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _select_batch(rows, batch: int) -> list[tuple[str, str]]:
    """Greedy prefix of the rank-ordered pair census that is mutually
    MERGE-INDEPENDENT: no symbol appears in two selected pairs, and no
    selected concat collides with another selected pair's symbol (or
    concat). Under that condition each selected pair's occurrences are
    untouched by the other merges in the batch, so one fold pass applies
    them all exactly as a sequential scan would — the deviation from
    exact Sennrich is only that pairs CREATED or DEPLETED by a batch
    member aren't re-ranked until the next census (see
    tests/test_bpe.py for both the provably-equal and the documented
    divergence case)."""
    used: set[str] = set()
    concats: set[str] = set()
    sel: list[tuple[str, str]] = []
    for r in rows:
        if r["n"] < 2:
            break
        a, b = r["a"], r["b"]
        c = a + b
        if {a, b, c} & used or {a, b, c} & concats:
            continue
        sel.append((a, b))
        used |= {a, b}
        concats.add(c)
        if len(sel) == batch:
            break
    return sel


def train_bpe(docs: DataFrame, k: int = 50,
              text_col: str = "text", batch: int = 1,
              stats: dict | None = None) -> list[tuple[str, str]]:
    """Learn ``k`` BPE merges from the corpus. Returns the ordered merge
    list [(left, right), ...] — highest-count pair first, ties broken
    lexicographically (deterministic across runs and layouts).

    Each word starts as its character sequence plus the ``</w>``
    end-of-word marker; each census pass counts adjacent symbol pairs
    weighted by word count, then accepts up to ``batch``
    merge-independent pairs from the rank order (:func:`_select_batch`)
    and rewrites the symbol arrays in ONE fold (:func:`_merge_fold`).
    Stops early when no pair repeats.

    ``batch=1`` is exactly the sequential Sennrich algorithm (the
    argmax pair is always accepted). ``batch=M>1`` is the standard
    scalable approximation: a real 32k–100k vocabulary takes ~k/M
    driver-paced Spark jobs instead of k — the per-merge-job cost was
    the one structural scale problem of the sequential form. Within a
    pass the accepted pairs cannot interact (no shared symbols, no
    symbol/concat collisions), so each batch equals applying its pairs
    sequentially; the approximation is only that a merge-CREATED pair
    can't win until the next census, and a batch member whose count was
    depleted by an earlier member's occurrences was accepted at its
    pre-pass count (divergence case pinned in tests/test_bpe.py).

    ``stats``, if given, receives {"passes": <census passes run>} so
    callers/tests can assert the ≈k/batch job count.
    """
    census = _word_census(docs, text_col)
    words = census.select(
        "cnt",
        F.concat(
            F.split(F.col("word"), "(?!$)"), F.array(F.lit(END))
        ).alias("syms"),
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    passes = 0
    while len(merges) < k:
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
        want = min(batch, k - len(merges))
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(max(64, 8 * want))  # selection headroom, driver-tiny
            .collect()
        )
        passes += 1
        sel = _select_batch(top, want)
        if not sel:
            break
        merges.extend(sel)
        words = words.select(
            "cnt", _merge_fold(F.col("syms"), sel).alias("syms")
        ).localCheckpoint()
    if stats is not None:
        stats["passes"] = passes
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
