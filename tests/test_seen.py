"""URL-seen layer: bloom pre-filter correctness (never drops a URL) and
raw-string dedup semantics (SURVEY.md §7.3 risks 3 and 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark.operators.seen import BloomSeenFilter, filter_unseen


def _urls_df(spark, urls, extra_cols=False):
    if extra_cols:
        return spark.createDataFrame(
            [(u, i) for i, u in enumerate(urls)], ["url", "seq"]
        )
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_bloom_no_false_negatives(spark):
    """Every inserted URL must probe maybe_seen=True — with a tiny bitmap
    to force heavy collision pressure."""
    bloom = BloomSeenFilter(n_buckets=4, m_bits=256)  # adversarially small
    urls = [f"https://h{i % 7}.test/p/{i}" for i in range(500)]
    state = bloom.insert(bloom.empty_state(spark), _urls_df(spark, urls))
    probed = bloom.probe(state, _urls_df(spark, urls))
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_filters_most_unseen(spark):
    bloom = BloomSeenFilter(n_buckets=8, m_bits=1 << 16)
    seen = [f"https://a.test/{i}" for i in range(1000)]
    fresh = [f"https://b.test/{i}" for i in range(1000)]
    state = bloom.insert(bloom.empty_state(spark), _urls_df(spark, seen))
    probed = bloom.probe(state, _urls_df(spark, fresh))
    fp = probed.filter(F.col("maybe_seen")).count()
    assert fp < 50  # ~16 bits/element, k=7 → fp well under 5%


def test_bloom_incremental_insert(spark):
    bloom = BloomSeenFilter(n_buckets=4, m_bits=1 << 14)
    s0 = bloom.empty_state(spark)
    s1 = bloom.insert(s0, _urls_df(spark, ["https://x.test/1"]))
    s2 = bloom.insert(s1, _urls_df(spark, ["https://x.test/2"]))
    probed = bloom.probe(
        s2, _urls_df(spark, ["https://x.test/1", "https://x.test/2"])
    )
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    assert s2.agg(F.sum("n_inserted")).collect()[0][0] == 2


def test_filter_unseen_exact_equals_bloomed(spark):
    """The bloom path must return exactly the same set as plain anti-join,
    even with forced false positives (tiny bitmap)."""
    bloom = BloomSeenFilter(n_buckets=2, m_bits=128)
    seen_urls = [f"https://s.test/{i}" for i in range(200)]
    cand_urls = [f"https://s.test/{i}" for i in range(100, 300)]  # 100 overlap
    seen = _urls_df(spark, seen_urls)
    cands = _urls_df(spark, cand_urls, extra_cols=True)
    state = bloom.insert(bloom.empty_state(spark), seen)

    exact = {r.url for r in filter_unseen(cands, seen).collect()}
    bloomed = {
        r.url for r in filter_unseen(cands, seen, bloom, state).collect()
    }
    assert bloomed == exact == {f"https://s.test/{i}" for i in range(200, 300)}


def test_raw_url_dedup_keeps_fragment_variants(spark):
    """Two URLs differing only in fragment are DIFFERENT seen-set keys
    (dedup happens before normalization — run_crawl_local.py:165)."""
    seen = _urls_df(spark, ["https://x.test/p"])
    cands = _urls_df(spark, ["https://x.test/p", "https://x.test/p#frag"], True)
    out = {r.url for r in filter_unseen(cands, seen).collect()}
    assert out == {"https://x.test/p#frag"}
