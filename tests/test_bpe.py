"""BPE trainer/segmenter vs a pure-Python reference of the classic
algorithm (Sennrich et al. 2016)."""

from __future__ import annotations

import collections

from distributed_crawl_spark.functions.bpe import (END, apply_bpe,
                                                   train_bpe)

CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest wider wider wider new new",
    "low lower lowest newest wide wider widest",
]


def py_train(word_counts: dict, k: int) -> list:
    vocab = {tuple(list(w) + [END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs or max(pairs.values()) < 2:
            break
        mx = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append(best)
        left, right = best

        def merge_syms(syms):
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            return tuple(out)

        vocab = {merge_syms(s): c for s, c in vocab.items()}
    return merges


def py_segment(text: str, merges: list) -> list:
    ranks = {m: i for i, m in enumerate(merges)}
    out = []
    for w in text.split():
        syms = list(w) + [END]
        while len(syms) > 1:
            cand = [(ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks]
            if not cand:
                break
            left, right = merges[min(cand)[0]]
            nxt = []
            for s in syms:
                if nxt and nxt[-1] == left and s == right:
                    nxt[-1] = left + right
                else:
                    nxt.append(s)
            syms = nxt
        out.extend(syms)
    return out


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id LONG, text STRING"
    )
    counts: collections.Counter = collections.Counter()
    for t in CORPUS:
        counts.update(t.split())
    want = py_train(dict(counts), 12)
    got = train_bpe(docs, k=12)
    assert got == want
    assert len(got) >= 8                       # corpus supports real merges
    assert ("e", "s") in got or ("es", "t") in got or ("s", "t") in got


def test_apply_bpe_matches_reference_segmentation(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id LONG, text STRING"
    )
    merges = train_bpe(docs, k=10)
    out = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
           for r in apply_bpe(docs, merges).collect()}
    for i, t in enumerate(CORPUS):
        want = py_segment(t, merges)
        assert out[i][0] == want and out[i][1] == len(want)
    # an untrained word falls back to characters + end marker
    solo = spark.createDataFrame([(0, "zq")], "doc_id LONG, text STRING")
    r = apply_bpe(solo, merges).collect()[0]
    assert list(r.bpe_tokens) == ["z", "q", END]
