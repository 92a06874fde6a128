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


def test_batch_one_is_exact_sennrich(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id LONG, text STRING"
    )
    counts: collections.Counter = collections.Counter()
    for t in CORPUS:
        counts.update(t.split())
    stats: dict = {}
    got = train_bpe(docs, k=12, batch=1, stats=stats)
    assert got == py_train(dict(counts), 12)
    assert stats["passes"] >= len(got)         # one census per merge


def test_batch_matches_sequential_when_pairs_independent(spark):
    """Diverse successors keep every merge-created pair below the next
    batch pick, so batched == sequential provably (see _select_batch):
    (a,b) count 8 > (c,d) count 6 > every created/secondary pair (<=2)."""
    words = (["abq", "abr", "abs", "abt"] * 2
             + ["cdw", "cdx", "cdy"] * 2)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id LONG, text STRING"
    )
    counts = collections.Counter(words)
    want = py_train(dict(counts), 2)
    assert want == [("a", "b"), ("c", "d")]    # the premise of the test
    stats: dict = {}
    got = train_bpe(docs, k=2, batch=2, stats=stats)
    assert got == want
    assert stats["passes"] == 1                # both merges in ONE census


def test_batch_divergence_case_documented(spark):
    """Where batching CANNOT match: merging (a,b) creates (ab,</w>) with
    count 10, outranking (c,d)=8 — sequential picks it second, but the
    batch already committed to (c,d) from the pre-pass census. Both are
    valid BPE vocabularies; the batch one re-ranks next pass."""
    words = ["ab"] * 10 + ["cd"] * 8
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id LONG, text STRING"
    )
    seq = py_train(dict(collections.Counter(words)), 2)
    assert seq == [("a", "b"), ("ab", END)]
    got = train_bpe(docs, k=2, batch=2)
    assert got == [("a", "b"), ("c", "d")]     # the documented deviation
    # and the created pair wins the NEXT pass:
    got3 = train_bpe(docs, k=3, batch=2)
    assert got3[2] == ("ab", END)


def test_batch_pass_count_scales_inverse_with_m(spark):
    """The scale claim: k merges in ~k/M census passes on a corpus with
    plenty of independent pairs (random words over a 40-letter
    alphabet). Segmentation with the batched model still matches the
    pure-Python segmenter under the SAME merge list."""
    import random

    rng = random.Random(11)
    alpha = [chr(ord("a") + i) for i in range(26)] + [
        chr(ord("A") + i) for i in range(14)
    ]
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(3, 9)))
        for _ in range(400)
    ]
    corpus = " ".join(rng.choice(words) for _ in range(4000))
    docs = spark.createDataFrame([(0, corpus)], "doc_id LONG, text STRING")
    stats: dict = {}
    merges = train_bpe(docs, k=64, batch=16, stats=stats)
    assert len(merges) == 64
    assert stats["passes"] <= 64 // 16 + 2     # ~k/M, small slack
    out = apply_bpe(docs, merges).collect()[0]
    assert list(out.bpe_tokens) == py_segment(corpus, merges)


def test_tokenizer_exact_packing(spark):
    """--bpe-train → --pack-tokens end-to-end: pack_shards budgets in
    the EXACT tokens the trained model emits (count_col='n_bpe_tokens'
    from apply_bpe), so every non-final shard total lands in
    [budget, budget + max_doc) in BPE-token units, and pack_examples'
    slices index the BPE token arrays exactly."""
    import collections as C

    from distributed_crawl_spark.functions import curation as CU

    rng_words = [w for t in CORPUS for w in t.split()]
    docs = spark.createDataFrame(
        [(i, " ".join(rng_words[i::7])) for i in range(40)],
        "doc_id LONG, text STRING",
    )
    merges = train_bpe(docs, k=20, batch=8)
    seg = apply_bpe(docs, merges)
    n_bpe = {r.doc_id: r.n_bpe_tokens for r in seg.collect()}
    with_counts = docs.join(seg.select("doc_id", "n_bpe_tokens"), "doc_id")

    budget = 64
    packed = CU.pack_shards(
        with_counts, shard_tokens=budget, count_col="n_bpe_tokens"
    ).collect()
    assert {r.doc_id: r.n_tokens for r in packed} == n_bpe  # exact units
    by_shard: dict = C.defaultdict(list)
    last_shard = {}
    for r in packed:
        by_shard[r.shard_id].append(r)
        if r.writer not in last_shard or r.shard_id > last_shard[r.writer]:
            last_shard[r.writer] = r.shard_id
    max_doc = max(n_bpe.values())
    for sid, rows in by_shard.items():
        tot = sum(r.n_tokens for r in rows)
        if sid in last_shard.values():
            assert tot < budget + max_doc
        else:
            assert budget <= tot < budget + max_doc, (sid, tot)

    ex = CU.pack_examples(
        with_counts, seq_len=32, count_col="n_bpe_tokens"
    ).collect()
    per_ex: dict = C.defaultdict(int)
    for r in ex:
        assert 0 <= r.start_in_doc < n_bpe[r.doc_id]   # valid BPE index
        assert r.start_in_doc + r.n_in_example <= n_bpe[r.doc_id]
        per_ex[r.example_id] += r.n_in_example
    # every doc's BPE tokens are fully covered by its example slices
    per_doc: dict = C.defaultdict(int)
    for r in ex:
        per_doc[r.doc_id] += r.n_in_example
    assert per_doc == {d: n for d, n in n_bpe.items() if n > 0}
    # full examples carry exactly seq_len tokens (lane-final may be short)
    lane_last = {}
    for r in ex:
        lane_last[r.writer] = max(lane_last.get(r.writer, -1), r.example_id)
    for eid, tot in per_ex.items():
        if eid not in lane_last.values():
            assert tot == 32, (eid, tot)
