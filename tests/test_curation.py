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
