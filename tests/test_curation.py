"""Corpus-curation operators: deterministic hash splits and per-source
rollups."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from distributed_crawl_spark.functions import curation as CU


def test_corpus_split_deterministic_and_partition_invariant(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: (r.split, r.bucket)
         for r in CU.corpus_split(docs).collect()}
    b = {r.doc_id: (r.split, r.bucket)
         for r in CU.corpus_split(docs.repartition(7)).collect()}
    assert a == b                       # layout never changes assignment
    for i, (split, bucket) in a.items():
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) % 10000
        assert bucket == want
        assert split == ("train" if bucket < 9000 else
                         "val" if bucket < 9500 else "test")
    # growing the corpus never reassigns existing docs
    grown = {r.doc_id: r.split
             for r in CU.corpus_split(
                 spark.range(0, 1000).withColumnRenamed("id", "doc_id")
             ).collect()}
    assert all(grown[i] == s for i, (s, _) in a.items())
    # fractions land near the weights
    n_train = sum(1 for s, _ in a.values() if s == "train")
    assert 0.8 < n_train / len(a) < 0.97


def test_corpus_split_custom_weights(spark):
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    out = CU.corpus_split(docs, weights={"a": 0.5, "b": 0.5}).collect()
    assert {r.split for r in out} == {"a", "b"}
    assert all((r.bucket < 5000) == (r.split == "a") for r in out)


def test_source_rollup_counts_cross_source_dups(spark):
    rows = [
        (0, "same text", "s1"), (1, "same text", "s2"),   # cross-source dup
        (2, "unique one here", "s1"), (3, "", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    got = {r.source: r for r in CU.source_rollup(docs).collect()}
    assert got["s1"].n_docs == 2 and got["s2"].n_docs == 2
    # the duplicate pair is counted in BOTH sources (corpus-wide census)
    assert got["s1"].n_dup_docs == 1 and got["s2"].n_dup_docs == 1
    assert got["s1"].sum_tokens == 2 + 3    # "same text" + "unique one here"
    assert got["s2"].sum_tokens == 2 + 0    # empty doc -> 0 tokens


def test_per_source_cap_keeps_best_k(spark):
    from distributed_crawl_spark.functions import curation as CU

    rows = (
        # s1: 4 docs, quality ordered by construction (longer, wordier =
        # higher integer composite); s2: 1 doc
        [(i, "the and is of to in that it " * (i + 1), "s1") for i in range(4)]
        + [(10, "the quick brown fox", "s2")]
    )
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = CU.per_source_cap(docs, k=2).collect()
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    assert len(by_source["s1"]) == 2           # capped
    assert len(by_source["s2"]) == 1           # under the cap
    s1 = sorted(by_source["s1"], key=lambda r: r.rank_in_source)
    assert s1[0].quality >= s1[1].quality      # best first
    assert [r.rank_in_source for r in s1] == [1, 2]


def test_corpus_sample_deterministic_monotone_rates(spark):
    docs = (
        spark.range(0, 600)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        )
    )
    kept = {r.doc_id for r in CU.corpus_sample(docs, default_rate=0.5).collect()}
    # deterministic: same seed, any layout -> same sample
    again = {r.doc_id for r in
             CU.corpus_sample(docs.repartition(7), default_rate=0.5).collect()}
    assert kept == again
    # exact hash-threshold membership
    for i in range(600):
        key = int(hashlib.md5(f"s42:{i}".encode()).hexdigest()[:12], 16) % 10000
        assert (i in kept) == (key < 5000)
    # rate increase is a SUPERSET (monotone threshold), rate 1.0 keeps all
    bigger = {r.doc_id for r in CU.corpus_sample(docs, default_rate=0.8).collect()}
    assert kept < bigger
    assert len(CU.corpus_sample(docs, default_rate=1.0).collect()) == 600
    # per-source rates override the default; a 0-rate source drops fully
    mixed = CU.corpus_sample(docs, rates={"s0": 0.0, "s1": 1.0},
                             default_rate=0.5).collect()
    by_src = {}
    for r in mixed:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert "s0" not in by_src and len(by_src["s1"]) == 200
    assert by_src["s2"] == {i for i in kept if i % 3 == 2}
    # a different seed draws an (almost surely) different sample
    other = {r.doc_id for r in
             CU.corpus_sample(docs, default_rate=0.5, seed="z9").collect()}
    assert other != kept


def test_decontaminate_planted_overlap(spark):
    gram = "w1 w2 w3 w4 w5 w6 w7 w8"          # the leaked 8-gram
    rows = [
        (0, f"prefix {gram} suffix tail words here"),   # 1 leaked gram? no —
        # every 8-window covering the run matches only if bench has it too;
        # bench holds exactly `gram`, so doc 0 hits on exactly one window
        (1, "totally different text with no overlap at all beyond n"),
        (2, "short doc"),                                 # < 8 words: no grams
        (3, f"{gram} {gram}"),                            # repeated: distinct=count once?
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    bench = spark.createDataFrame([(100, gram)], "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in CU.decontaminate(docs, bench, n=8).collect()}
    assert len(got) == 4                                  # every doc reported
    assert got[0].contaminated and got[0].n_hit_grams == 1
    assert not got[1].contaminated and got[1].n_hit_grams == 0
    assert not got[2].contaminated
    # doc 3 contains the gram twice -> still ONE distinct leaked gram
    assert got[3].contaminated and got[3].n_hit_grams == 1


def test_span_scrub_planted_duplicate_chunks(spark):
    shared = " ".join(f"s{i}" for i in range(20))         # one full chunk
    rows = [
        (0, shared),                                       # dup of doc 1
        (1, f"{shared} tail1 tail2 tail3"),                # chunk1 dup, chunk2 own
        (2, "entirely unique little document"),
        (3, "rep rep rep " * 2),                           # within-doc only
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in CU.span_scrub(docs, w=20, min_docs=2).collect()}
    assert got[0].clean_text == "" and got[0].n_removed == 1   # fully scrubbed
    assert got[1].clean_text == "tail1 tail2 tail3" and got[1].n_removed == 1
    assert got[2].clean_text == "entirely unique little document"
    assert got[2].n_removed == 0
    # within-doc repetition is not a cross-doc leak -> untouched
    assert got[3].clean_text == rows[3][1].strip() and got[3].n_removed == 0


def test_span_scrub_reassembly_order(spark):
    # 3 chunks; the MIDDLE one is duplicated across docs -> remaining two
    # must stitch back in original order
    c = lambda tag: " ".join(f"{tag}{i}" for i in range(20))
    dup = c("d")
    rows = [(0, f"{c('a')} {dup} {c('b')}"), (1, dup)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in CU.span_scrub(docs, w=20, min_docs=2).collect()}
    assert got[0].clean_text == f"{c('a')} {c('b')}" and got[0].n_removed == 1
    assert got[1].clean_text == "" and got[1].n_removed == 1


def test_mix_report_matches_sample_plus_split(spark):
    """mix_report must be exactly the census of corpus_sample ∘
    corpus_split: same predicate helpers, so totals reconcile row for
    row against the composed operators."""
    rows = [
        (i, f"w{i} " * (i % 7), ["src0", "src1", "src2"][i % 3])
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    rates = {"src0": 0.3, "src1": 0.9}
    rep = {
        (r.source, r.split): (r.n_docs, r.n_tokens, r.n_chars)
        for r in CU.mix_report(docs, rates=rates, default_rate=0.6).collect()
    }
    sampled = CU.corpus_sample(docs, rates=rates, default_rate=0.6)
    split = CU.corpus_split(docs)
    composed = (
        docs.join(sampled.select("doc_id"), "doc_id", "left_semi")
        .join(split.select("doc_id", "split"), "doc_id")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"),
            F.sum(F.length("text")).alias("c"),
        )
    )
    want = {(r.source, r.split): (r.n, r.t, r.c) for r in composed.collect()}
    # empty-text token counts: split('') gives [''] (size 1) vs 0 — none
    # of the planted rows are empty except i%7==0 rows, align manually
    for k, (n, t, c) in want.items():
        assert rep[k][0] == n and rep[k][2] == c
    assert set(rep) == set(want)


def test_pack_shards_invariants(spark):
    """pack_shards: every doc assigned exactly once; offsets are exact
    exclusive running token totals per writer lane; a shard's docs all
    start inside its budget window, so each closed shard's total lands
    within max_doc of the budget; shard ids are unique across lanes."""
    rows = [(i, "w " * (5 + i % 40)) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    B = 100
    out = CU.pack_shards(docs, shard_tokens=B, n_writers=4).collect()
    assert sorted(r.doc_id for r in out) == list(range(400))
    by_writer = {}
    for r in out:
        by_writer.setdefault(r.writer, []).append(r)
    assert set(r.writer for r in out) <= set(range(4))
    for w, rs in by_writer.items():
        rs.sort(key=lambda r: r.offset_tokens)
        run = 0
        for r in rs:
            assert r.offset_tokens == run
            assert r.shard_id == w * (1 << 20) + run // B
            run += r.n_tokens
    # a closed shard (every shard but each lane's last) spans from its
    # first doc's offset (in [sB, sB + max_doc): the previous shard's
    # spillover) to the next shard's first offset, so its total is
    # within max_doc of the budget on either side
    max_doc = max(r.n_tokens for r in out)
    totals = {}
    for r in out:
        totals[r.shard_id] = totals.get(r.shard_id, 0) + r.n_tokens
    for w, rs in by_writer.items():
        last = max(r.shard_id for r in rs)
        for sid, tot in totals.items():
            if sid // (1 << 20) == w and sid != last:
                assert B - max_doc < tot < B + max_doc


def test_pack_shards_deterministic_under_layout(spark):
    """Hash order, not row order: repartitioned/reversed input produces
    byte-identical shard assignments."""
    rows = [(i, f"tok{i} " * (1 + i % 9)) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    a = {r.doc_id: (r.writer, r.shard_id, r.offset_tokens)
         for r in CU.pack_shards(docs, shard_tokens=50, n_writers=3).collect()}
    moved = spark.createDataFrame(rows[::-1], "doc_id LONG, text STRING").repartition(7)
    b = {r.doc_id: (r.writer, r.shard_id, r.offset_tokens)
         for r in CU.pack_shards(moved, shard_tokens=50, n_writers=3).collect()}
    assert a == b


def test_quality_quantile_gate_per_source_median(spark):
    """Each source gates on ITS OWN median: a doc that would pass a
    global threshold can fail inside a strong source and vice versa;
    keep counts per source are >= half (>= because of ties at the
    median). approx=True returns the same schema and, on this tiny
    well-separated data, the same keeps."""
    rows = []
    for i in range(8):   # sA: wordy docs with stopwords (high quality)
        rows.append((i, "the quick brown fox is near the lazy dog " * (i + 1), "sA"))
    for i in range(8):   # sB: terse low-stopword docs (low quality)
        rows.append((100 + i, "zzz " * (i + 1), "sB"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = CU.quality_quantile_gate(docs, p=0.5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        qs = sorted(r.quality for r in rs)
        med = (qs[3] + qs[4]) / 2
        assert all(r.thr == med for r in rs)
        assert all(r.keep == (r.quality >= med) for r in rs)
        assert sum(r.keep for r in rs) >= len(rs) // 2
    # both sources keep SOME docs — a global threshold would zero out sB
    assert sum(r.keep for r in by_src["sB"]) > 0
    approx = {r.doc_id: r.keep
              for r in CU.quality_quantile_gate(docs, p=0.5, approx=True).collect()}
    assert set(approx) == {r.doc_id for r in out}


def test_top_ngrams_reach_over_count(spark):
    """Ranking is by document reach: a phrase in many docs beats one
    doc's self-repetition even when the raw count is lower."""
    boiler = "subscribe to our newsletter"
    rows = (
        # 5 docs each containing the boilerplate once
        [(i, f"intro{i} words{i} {boiler} outro{i}", "s") for i in range(5)]
        # 1 doc repeating its own phrase 10 times
        + [(99, "own repeated phrase " * 10, "s")]
    )
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    got = CU.top_ngrams(docs, n=4, k=3).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    top = got[0]
    assert top.gram == boiler and top.n_docs == 5 and top.n_total == 5
    # the self-repeated 4-gram has higher n_total but only 1-doc reach
    assert all(r.n_docs <= 5 for r in got[1:])
    assert got[1].n_docs < 5 or got[1].n_total <= 5


def test_mix_plan_bottleneck_and_proportions(spark):
    """The scarcest source per weight unit samples at exactly 100%
    (rate_bp 10000); the others downsample so planned tokens match the
    target ratio; zero-weight sources are excluded with rate 0."""
    rows = (
        # srcA: 10 docs x 10 tokens = 100 tokens, weight 1 -> bottleneck
        [(i, " ".join(["w"] * 10), "srcA") for i in range(10)]
        # srcB: 60 docs x 10 tokens = 600 tokens, weight 2
        + [(100 + i, " ".join(["w"] * 10), "srcB") for i in range(60)]
        # srcC: excluded from the mix
        + [(200 + i, " ".join(["w"] * 10), "srcC") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["source"]: r
        for r in CU.mix_plan(
            docs, weights={"srcB": 2, "srcC": 0}, default_weight=1
        ).collect()
    }
    assert out["srcA"]["rate_bp"] == 10000          # bottleneck: 100/1
    # srcB target = 2x srcA's 100 tokens = 200 of its 600 -> 1/3
    assert out["srcB"]["rate_bp"] == 3333           # floor(10000/3)
    assert out["srcB"]["planned_tokens"] == 199     # floor(600*3333/1e4)
    assert out["srcC"]["rate_bp"] == 0 and out["srcC"]["planned_tokens"] == 0
    # closing the loop: the rates drive corpus_sample directly
    rates = {s: r["rate_bp"] / 10000 for s, r in out.items()}
    kept = CU.corpus_sample(docs, rates=rates).groupBy("source").count()
    kept = {r["source"]: r["count"] for r in kept.collect()}
    assert kept.get("srcC", 0) == 0
    assert kept["srcA"] == 10                        # full epoch
    assert 10 <= kept["srcB"] <= 30                  # ~20 of 60 (seeded hash)


def test_shard_manifest_digest_is_order_free(spark):
    """Manifest totals tie out against the pack plan, and the
    commutative digest is invariant under repartitioning (a shard
    written by any executor in any order verifies identically)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = {
        r.shard_id: (r.n_docs, r.n_tokens, r.content_digest)
        for r in CU.shard_manifest(docs, n_writers=4).collect()
    }
    m2 = {
        r.shard_id: (r.n_docs, r.n_tokens, r.content_digest)
        for r in CU.shard_manifest(
            docs.repartition(13), n_writers=4
        ).collect()
    }
    assert m1 == m2 and len(m1) > 1
    packed = CU.pack_shards(docs, n_writers=4)
    assert sum(d for d, _, _ in m1.values()) == packed.count()


def test_pack_examples_cover_streams_exactly(spark):
    """Every example except each lane's last holds exactly seq_len
    tokens with no gaps or overlaps; per-doc spans tile the doc."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = CU.pack_examples(docs, seq_len=128, n_writers=4).collect()
    by_ex: dict[int, int] = {}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_ex[r.example_id] = by_ex.get(r.example_id, 0) + r.n_in_example
        by_doc.setdefault(r.doc_id, []).append(r)
        assert r.n_in_example > 0 and r.start_in_doc >= 0
    # per lane: all but the last example are exactly full
    last_per_writer = {
        w: max(e for e in by_ex if e >> 20 == w)
        for w in {e >> 20 for e in by_ex}
    }
    for e, tot in by_ex.items():
        if e != last_per_writer[e >> 20]:
            assert tot == 128, (e, tot)
        else:
            assert 0 < tot <= 128
    # per doc: spans tile [0, n_tokens) contiguously
    packed = {r.doc_id: r.n_tokens
              for r in CU.pack_shards(docs, n_writers=4).collect()}
    for d, spans in by_doc.items():
        spans.sort(key=lambda r: r.start_in_doc)
        assert spans[0].start_in_doc == 0
        pos = 0
        for s in spans:
            assert s.start_in_doc == pos
            pos += s.n_in_example
        assert pos == packed[d]


def test_per_source_cap_quality_col_passthrough(spark):
    """A precomputed ranking column yields the identical cap output as
    scoring the text in-plan (and lets callers/benchmarks skip the text
    pass)."""
    from distributed_crawl_spark.functions.textstats import quality_score_int

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "word " * (i % 7 + 1)) for i in range(60)],
        "doc_id LONG, source STRING, text STRING",
    )
    pre = docs.withColumn("q", quality_score_int(F.col("text")))
    a = sorted(map(tuple, CU.per_source_cap(docs, k=4).collect()))
    b = sorted(map(tuple, CU.per_source_cap(pre, k=4, quality_col="q").collect()))
    assert a == b and len(a) == 12


def test_per_source_cap_lane_stage_equivalence(spark):
    """Force the lane pre-stage with a tiny threshold: output must be
    row-identical to the single-window plan (any global top-k row is
    top-k within its own lane), heavy and light sources mixed."""
    docs = spark.createDataFrame(
        [(i, "head" if i % 4 else f"tail{i % 5}", "w " * (i % 11 + 1))
         for i in range(400)],
        "doc_id LONG, source STRING, text STRING",
    )
    single = sorted(map(tuple, CU.per_source_cap(docs, k=7).collect()))
    laned = sorted(map(tuple, CU.per_source_cap(
        docs, k=7, lane_threshold=20, max_lanes=8
    ).collect()))
    assert single == laned


def test_c4_clean_planted_rules(spark):
    """One planted violation per C4 rule: line rules rewrite the text,
    doc rules only flip `keep`."""
    good = "this line is long enough and it ends properly."
    docs = spark.createDataFrame(
        [
            # clean doc: 3 good lines -> keep
            (0, "\n".join([good] * 3)),
            # line with no terminal punctuation removed -> only 2 kept -> drop
            (1, "\n".join([good, good, "no punctuation here at all"])),
            # short line removed (under 3 words) -> drop
            (2, "\n".join([good, good, "too short."])),
            # javascript banner line removed; 3 good lines remain -> keep
            (3, "\n".join([good] * 3
                          + ["please enable javascript to continue."])),
            # cookie banner removed
            (4, "\n".join([good] * 3 + ["this site uses cookies today."])),
            # doc rule: brace anywhere -> keep=False, lines untouched
            (5, "\n".join([good, good, "call f(x) { now } please ok."])),
            # doc rule: lorem ipsum -> keep=False even with clean lines
            (6, "\n".join([good, good,
                           "lorem ipsum dolor sit amet consectetur."])),
            # quote after terminal punct is still a good ending
            (7, "\n".join([good, good, 'she said "this is the end?"'])),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in CU.c4_clean(docs).collect()}
    assert out[0].keep and out[0].n_kept == 3 and out[0].n_removed == 0
    assert not out[1].keep and out[1].n_kept == 2 and out[1].n_removed == 1
    assert not out[2].keep and out[2].n_kept == 2
    assert out[3].keep and out[3].n_kept == 3 and out[3].n_removed == 1
    assert "javascript" not in out[3].clean_text
    assert out[4].keep and out[4].n_removed == 1
    assert not out[5].keep and out[5].n_kept == 3   # line survives, doc fails
    assert not out[6].keep and out[6].n_kept == 3
    assert out[7].keep and out[7].n_kept == 3


def test_source_entropy(spark):
    """Uniform mix -> ln(k); single source -> 0; skew matches a pure-
    Python mirror of the per-term quantization (sum of floor'd bigints,
    so the expected value is computed term-wise, not from float H)."""
    import math

    rows = (
        [(i, "en", f"src{i % 4}") for i in range(40)]       # uniform over 4
        + [(i, "de", "src0") for i in range(40, 50)]        # single source
        + [(i, "fr", "src0") for i in range(50, 59)]        # 9:1 skew
        + [(59, "fr", "src1")]
    )
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING, source STRING")
    out = {r.lang: r for r in CU.source_entropy(docs).collect()}

    def expected(counts):
        t = sum(counts)
        return sum(
            math.floor((c / t) * math.log(t / c) * 1_000_000) for c in counts
        )

    assert out["en"].n_docs == 40 and out["en"].n_sources == 4
    assert out["en"].entropy_q == expected([10, 10, 10, 10])
    assert abs(out["en"].entropy_q - 1_000_000 * math.log(4)) < 5
    assert out["de"].entropy_q == 0 and out["de"].n_sources == 1
    assert out["fr"].entropy_q == expected([9, 1])
    assert out["fr"].n_docs == 10


def test_decontaminate_semantic_planted_neighbors(spark):
    """Planted geometry: an exact bench copy, a near-paraphrase, an
    orthogonal doc; argmax tie over two identical bench vectors must pick
    the smaller bench id; values mirror a numpy brute force exactly."""
    import math

    import numpy as np

    rng = np.random.default_rng(7)
    b0 = rng.normal(size=8)
    near = b0 + rng.normal(scale=0.1, size=8)     # cos ~0.97 vs b0
    ortho = np.zeros(8); ortho[0] = 1.0
    b1 = np.zeros(8); b1[1] = 1.0                 # orthogonal to ortho
    corpus = {0: b0.copy(), 1: near, 2: ortho}
    bench = {100: b0.copy(), 101: b0.copy(), 102: b1}   # 100/101 identical

    mk = lambda d: spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in d.items()],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = {r.vec_id: r for r in CU.decontaminate_semantic(
        mk(corpus), mk(bench), threshold_m=900
    ).collect()}
    assert len(got) == 3

    def cos_m(a, b):
        return math.floor(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
            * 1000
        )

    for cid, cvec in corpus.items():
        best = max(
            ((cos_m(cvec, bvec), -bid) for bid, bvec in bench.items()),
        )
        assert got[cid].best_cos_m == best[0], cid
        assert got[cid].best_bench_id == -best[1], cid
        assert got[cid].contaminated == (best[0] >= 900), cid
    # the exact copy ties between bench 100 and 101 -> smaller id wins
    assert got[0].best_bench_id == 100 and got[0].best_cos_m == 1000
    assert got[0].contaminated and got[1].contaminated
    assert not got[2].contaminated
    # corpus side stays exchange-free: the round-6 Arrow kernel streams
    # the corpus through MapInPandas against the broadcast bench matrix
    # (previously a BroadcastNestedLoopJoin over the 1-row bench array)
    plan = CU.decontaminate_semantic(
        mk(corpus), mk(bench), threshold_m=900
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange hashpartitioning" not in plan


def test_source_similarity_matches_python_sets(spark):
    """Handcrafted vocab overlap vs a pure-Python set mirror: identical
    sources -> jaccard 1e6; disjoint pairs absent; partial overlap and
    the duplicated-shingle case (vocabulary is DISTINCT grams) exact."""
    import math

    texts = {
        "a": ["w1 w2 w3 w4", "w2 w3 w4 w5"],     # grams overlap within source
        "b": ["w1 w2 w3 w4", "w2 w3 w4 w5"],     # identical vocab to a
        "c": ["w3 w4 w5 w6"],                    # partial overlap with a/b
        "d": ["x1 x2 x3 x4 x1 x2 x3"],           # disjoint; repeated gram
    }
    rows = [
        (i, t, s)
        for i, (s, t) in enumerate(
            (s, t) for s, ts in sorted(texts.items()) for t in ts
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")

    def vocab(s):
        out = set()
        for t in texts[s]:
            w = t.split()
            out |= {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return out

    got = {(r.source_a, r.source_b): r
           for r in CU.source_similarity(docs).collect()}
    for sa in texts:
        for sb in texts:
            if sa >= sb:
                continue
            inter = vocab(sa) & vocab(sb)
            if not inter:
                assert (sa, sb) not in got, (sa, sb)
                continue
            r = got[(sa, sb)]
            union = len(vocab(sa)) + len(vocab(sb)) - len(inter)
            assert r.n_inter == len(inter)
            assert (r.n_a, r.n_b) == (len(vocab(sa)), len(vocab(sb)))
            assert r.jaccard_u == math.floor(len(inter) / union * 1_000_000)
    assert got[("a", "b")].jaccard_u == 1_000_000
    assert ("a", "d") not in got and ("c", "d") not in got


def test_dup_rate_by_source(spark):
    """Components drive the rate: non-canonical members count, canonical
    picks and un-paired docs don't; a duplicate-free source reports 0;
    basis points floor-quantize."""
    docs = spark.createDataFrame(
        [(1, "s1"), (2, "s1"), (3, "s1"),      # 2,3 dups of 1 -> 2/3
         (4, "s2"), (5, "s2"),                 # 5 dup of 4   -> 1/2
         (6, "s3")],                           # clean source -> 0
        "doc_id LONG, source STRING",
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "doc_id LONG, component_id LONG",
    )
    got = {r.source: r for r in CU.dup_rate_by_source(docs, comp).collect()}
    assert (got["s1"].n_docs, got["s1"].n_dups, got["s1"].dup_bp) == (3, 2, 6666)
    assert (got["s2"].n_docs, got["s2"].n_dups, got["s2"].dup_bp) == (2, 1, 5000)
    assert (got["s3"].n_docs, got["s3"].n_dups, got["s3"].dup_bp) == (1, 0, 0)


def test_mix_temperature_matches_python_mirror(spark):
    import math

    rows = []
    sizes = {"big": 400, "mid": 100, "tiny": 25}
    for src, n in sizes.items():
        rows.append((src, " ".join(["w"] * n)))
    rows.append(("empty", "   "))          # zero-token source
    docs = spark.createDataFrame(rows, "source STRING, text STRING")
    got = {r.source: r for r in CU.mix_temperature(docs, alpha_bp=3000).collect()}

    wq = {s: math.floor(math.pow(n, 0.3) * 1_000_000)
          for s, n in sizes.items()}
    wq["empty"] = 0
    q_tot = sum(wq.values())
    # bottleneck = max wq/t, i.e. the smallest source for alpha < 1
    star = max(sizes, key=lambda s: (wq[s] / sizes[s], s))
    assert star == "tiny"
    for s, n in sizes.items():
        r = got[s]
        assert r.n_tokens == n
        assert r.weight_q == wq[s]
        assert r.share_bp == (10_000 * wq[s]) // q_tot
        assert r.rate_bp == (10_000 * wq[s] * sizes[star]) // (wq[star] * n)
        assert r.planned_tokens == (n * r.rate_bp) // 10_000
    assert got["tiny"].rate_bp == 10_000          # bottleneck at 100%
    assert got["big"].rate_bp < got["mid"].rate_bp < 10_000
    assert got["empty"].rate_bp == 0 and got["empty"].share_bp == 0
    # alpha -> 1 recovers proportional-to-size shares (mix_plan's regime)
    flat = {r.source: r for r in
            CU.mix_temperature(docs, alpha_bp=10_000).collect()}
    tot = sum(sizes.values())
    for s, n in sizes.items():
        assert abs(flat[s].share_bp - (10_000 * n) // tot) <= 1


def test_mix_temperature_small_sources_upweighted(spark):
    docs = spark.createDataFrame(
        [("a", " ".join(["w"] * 1000)), ("b", " ".join(["w"] * 10))],
        "source STRING, text STRING",
    )
    got = {r.source: r for r in CU.mix_temperature(docs, alpha_bp=3000).collect()}
    # temperature compresses the 100:1 size gap to ~100^0.3 ~ 4:1 shares
    ratio = got["a"].share_bp / got["b"].share_bp
    assert 3.5 < ratio < 4.5
    assert got["b"].rate_bp == 10_000
    # realized tokens follow the alpha-shares: planned_a/planned_b == ratio
    assert abs(got["a"].planned_tokens / got["b"].planned_tokens - ratio) < 0.1


def test_quality_drift_mirror_and_one_sided_buckets(spark):
    import math

    old = spark.createDataFrame(
        [(b,) for b in [0] * 50 + [1] * 30 + [2] * 20],
        "bucket LONG",
    )
    new = spark.createDataFrame(
        [(b,) for b in [0] * 30 + [1] * 30 + [3] * 40],
        "bucket LONG",
    )
    got = {r.bucket: r for r in CU.quality_drift(old, new).collect()}
    assert set(got) == {0, 1, 2, 3}

    def term(n_o, n_n, t_o=100, t_n=100):
        p, q = n_o / t_o, n_n / t_n
        return math.floor((p - q) * math.log(p / q) * 1_000_000)

    assert got[0].psi_q == term(50, 30)
    assert got[1].psi_q == term(30, 30) == 0
    # one-sided buckets: counts visible, psi NULL (not epsilon-smoothed)
    assert got[2].n_old == 20 and got[2].n_new == 0 and got[2].psi_q is None
    assert got[3].n_old == 0 and got[3].n_new == 40 and got[3].psi_q is None
    assert got[0].p_ppm_old == 500_000 and got[0].p_ppm_new == 300_000
    # identical snapshots -> every psi term exactly 0
    same = CU.quality_drift(old, old).collect()
    assert all(r.psi_q == 0 for r in same)
    # psi terms are >= 0 by construction
    assert all(r.psi_q >= 0 for r in got.values() if r.psi_q is not None)


def test_chunk_documents_matches_python_mirror(spark):
    """Chunk grid vs a pure-Python mirror over every regime: shorter
    than one window, exactly one window, one-token spill, redundant
    tail start (the start that adds nothing and must be dropped),
    multi-chunk, and empty/whitespace docs (no rows)."""
    win, stride = 8, 6
    texts = {
        0: "a b c",                                   # n < win: 1 chunk
        1: " ".join(f"t{i}" for i in range(8)),       # n == win
        2: " ".join(f"t{i}" for i in range(9)),       # n = win+1: 2 chunks
        3: " ".join(f"t{i}" for i in range(7)),       # start 6 adds nothing
        4: " ".join(f"t{i}" for i in range(25)),      # several chunks
        5: "",                                        # no rows
        6: "   ",                                     # no rows
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id LONG, text STRING"
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk)
        for r in CU.chunk_documents(docs, win=win, stride=stride).collect()
    }

    expect = {}
    for did, text in texts.items():
        tk = text.split()
        n = len(tk)
        for s in range(0, n, stride):
            if s == 0 or s < n - win + stride:
                expect[(did, s // stride)] = (
                    min(win, n - s),
                    " ".join(tk[s : s + win]),
                )
    assert got == expect
    # doc 3: n=7, start 6 covers tokens already inside chunk 0 -> dropped
    assert (3, 1) not in got and (3, 0) in got
    # coverage: every token of doc 4 appears in >=1 chunk
    covered = set()
    for (did, ci), (nt, _) in got.items():
        if did == 4:
            covered.update(range(ci * stride, ci * stride + nt))
    assert covered == set(range(25))


def test_chunk_documents_no_overlap_keeps_every_start(spark):
    """stride >= win (disjoint chunks): the redundancy rule never
    fires, so the grid is the plain ceil(n/stride) split."""
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(0, text)], "doc_id LONG, text STRING")
    out = sorted(
        (r.chunk_idx, r.n_tokens)
        for r in CU.chunk_documents(docs, win=4, stride=4).collect()
    )
    assert out == [(0, 4), (1, 4), (2, 2)]


def test_blocklist_mine_thresholds_and_floor_division(spark):
    """Census + basis-point floor vs hand-computed values, both
    thresholds exercised: a failing-enough source passes, one doc
    short of min_docs is dropped, one basis point under min_fail_bp
    is dropped, and the bp value is the floor (2/3 -> 6666, not 6667)."""
    from pyspark.sql import functions as F

    rows = (
        # srcA: 3 docs, 2 fail -> 6666 bp (floor), selected at 6666
        [(i, "srcA", i == 0) for i in range(3)]
        # srcB: 3 docs, 2 fail -> selected at min_docs=3, dropped at 4
        + [(i, "srcB", i == 10) for i in range(10, 13)]
        # srcC: 4 docs, 2 fail -> 5000 bp, below 6666 -> dropped
        + [(i, "srcC", i < 22) for i in range(20, 24)]
        # srcD: 4 docs, 4 fail -> 10000 bp, selected
        + [(i, "srcD", False) for i in range(30, 34)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, ok BOOLEAN"
    )
    out = {
        r.source: r
        for r in CU.blocklist_mine(
            docs, F.col("ok"), min_docs=3, min_fail_bp=6666
        ).collect()
    }
    assert set(out) == {"srcA", "srcB", "srcD"}
    assert (out["srcA"].n_docs, out["srcA"].n_fail, out["srcA"].fail_bp) == (
        3, 2, 6666,
    )
    assert out["srcD"].fail_bp == 10000
    # min_docs drops srcB even though its rate qualifies
    out4 = {
        r.source
        for r in CU.blocklist_mine(
            docs, F.col("ok"), min_docs=4, min_fail_bp=5000
        ).collect()
    }
    assert out4 == {"srcC", "srcD"}


def test_gate_agreement_census(spark):
    """Verdict-cell counts and floor shares vs hand-computed values;
    a NULL gate verdict is its own cell, not coerced to a boolean."""
    rows = [
        (0, 10, True), (1, 10, True), (2, 10, False),
        (3, 3, True), (4, 3, None), (5, 3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, score LONG, flag BOOLEAN")
    out = CU.gate_agreement(docs, {
        "big": F.col("score") >= 5,
        "flag": F.col("flag"),
    }).collect()
    cells = {(r.big, r.flag): (r.n_docs, r.share_bp) for r in out}
    assert cells == {
        (True, True): (2, 3333),
        (True, False): (1, 1666),
        (False, True): (1, 1666),
        (False, None): (2, 3333),
    }
    assert sum(r.n_docs for r in out) == 6

    import pytest as _pytest
    with _pytest.raises(ValueError):
        CU.gate_agreement(docs, {})


def test_importance_sample_linear_ramp_matches_mirror(spark):
    """Linear ramp (alpha=1.0): per-bucket keep rates and membership
    match a pure-Python mirror of the whole pipeline (rank deciles
    over the distinct score domain, md5 hash threshold)."""
    import hashlib
    import math

    rows = [(i, (i * 37) % 23) for i in range(200)]   # 23 distinct scores
    docs = spark.createDataFrame(rows, "doc_id LONG, score LONG")
    got = {(r.doc_id): (r.score_bucket, r.sample_key)
           for r in CU.importance_sample(
               docs, F.col("score"), n_buckets=10,
               alpha_bp=10000, floor_bp=500).collect()}

    dom = sorted({s for _, s in rows})
    bucket = {s: min((r * 10) // len(dom), 9) for r, s in enumerate(dom)}

    def key(i):
        return int(hashlib.md5(f"s42:{i}".encode()).hexdigest()[:12], 16) % 10000

    expect = {}
    for i, s in rows:
        b = bucket[s]
        rate = 500 + math.floor(9500 * ((b + 1) / 10))
        if key(i) < rate:
            expect[i] = (b, key(i))
    assert got == expect and got
    # top bucket keeps everything passing rate 10000 == all of it
    top = [i for i, s in rows if bucket[s] == 9]
    assert all(i in got for i in top)


def test_importance_sample_alpha_shapes_rates(spark):
    """alpha=2.0 is strictly more top-heavy than linear; the floor
    keeps every bucket non-empty-in-expectation (rate >= floor_bp);
    rates are non-decreasing in the bucket."""
    rows = [(i, i % 10) for i in range(2000)]         # dense buckets
    docs = spark.createDataFrame(rows, "doc_id LONG, score LONG")

    def kept_by_bucket(alpha_bp):
        out = CU.importance_sample(
            docs, F.col("score"), n_buckets=10,
            alpha_bp=alpha_bp, floor_bp=500).collect()
        by = {}
        for r in out:
            by[r.score_bucket] = by.get(r.score_bucket, 0) + 1
        return by

    lin = kept_by_bucket(10000)
    sq = kept_by_bucket(20000)
    assert set(lin) == set(range(10))          # floor keeps every bucket
    # same seed => squared-ramp sample is a SUBSET per bucket, and
    # strictly smaller in the low buckets
    assert all(sq.get(b, 0) <= lin[b] for b in range(10))
    assert sq.get(0, 0) < lin[0] and sq.get(3, 0) < lin[3]
    # top bucket: both ramps keep the full bucket (rate 10000)
    assert sq[9] == lin[9] == 200


def test_cluster_split_no_leakage(spark):
    """Every member of a near-dup cluster lands on ONE side; singletons
    agree with plain corpus_split row-for-row."""
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # clusters: {0..4} -> 0, {10..12} -> 10; everyone else singleton
    comp_rows = [(i, 0) for i in range(5)] + [(i, 10) for i in (10, 11, 12)]
    comps = spark.createDataFrame(
        comp_rows, "doc_id long, component_id long"
    )
    out = {r["doc_id"]: r for r in
           CU.cluster_split(docs, comps).collect()}
    assert len(out) == 200
    # cluster coherence: same key, bucket, split for every member
    for group in ([0, 1, 2, 3, 4], [10, 11, 12]):
        splits = {out[i]["split"] for i in group}
        keys = {out[i]["split_key"] for i in group}
        assert len(splits) == 1 and len(keys) == 1
    assert out[0]["split_key"] == "0" and out[10]["split_key"] == "10"
    # singleton agreement with corpus_split
    plain = {r["doc_id"]: (r["split"], r["bucket"])
             for r in CU.corpus_split(docs).collect()}
    clustered_ids = {i for i, _ in comp_rows}
    for i in range(200):
        if i not in clustered_ids:
            assert (out[i]["split"], out[i]["bucket"]) == plain[i]
    # distribution sanity: all three splits non-empty at n=200
    assert {r["split"] for r in out.values()} == {"train", "val", "test"}
