"""Property-based invariants (hypothesis) for the hashing / dedup /
politeness kernels. Each example batch becomes ONE DataFrame so a
property run costs a handful of small Spark jobs, not one per example.

Reference invariants exercised (SURVEY.md §5 model): URL normalization
idempotence (P2), fingerprint parity vs the pure-Python oracles, and the
politeness window's budget/partition contract (W1).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_crawl_spark.functions import dedup as DD
from distributed_crawl_spark.functions import url as U
from distributed_crawl_spark.operators.politeness import rank_frontier, split_ranked

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish text without NULs (Spark strings are UTF-8, no NUL)
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=80,
)


def py_tokens(text: str) -> list[str]:
    """EXACT mirror of the engine's tokens() contract (verified against
    Spark): trim strips SPACES only; split is ASCII \\s+ (Java/DuckDB
    semantics — \\x1c-\\x1f and unicode spaces are NOT separators, unlike
    Python str.split()); leading/trailing separators yield '' tokens."""
    import re

    t = text.strip(" ")
    if t == "":
        return []
    return re.split(r"\s+", t, flags=re.ASCII)


def py_simhash64(text: str) -> tuple[int, int]:
    w = [0] * 64
    tf: dict[str, int] = {}
    for tok in py_tokens(text):
        tf[tok] = tf.get(tok, 0) + 1
    for tok, n in tf.items():
        hx = hashlib.md5(tok.encode()).hexdigest()
        lo, hi = int(hx[:8], 16), int(hx[8:16], 16)
        for j in range(64):
            bit = (hi >> (j - 32)) & 1 if j >= 32 else (lo >> j) & 1
            w[j] += n if bit else -n
    return (
        sum(1 << (j - 32) for j in range(32, 64) if w[j] > 0),
        sum(1 << j for j in range(32) if w[j] > 0),
    )


@SLOW
@given(st.lists(texts, min_size=1, max_size=16))
def test_simhash64_matches_python_oracle(spark, docs):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: (r.sh_hi, r.sh_lo) for r in DD.simhash64(df).collect()}
    for i, t in rows:
        if py_tokens(t):
            assert got[i] == py_simhash64(t), repr(t)
        else:
            assert i not in got  # zero-token docs are dropped


@SLOW
@given(st.lists(texts, min_size=1, max_size=16))
def test_exact_dedup_partitions_the_corpus(spark, docs):
    """Digest groups form a partition: counts sum to n, one canonical id
    per group, canonical id is the group minimum."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = DD.exact_duplicates(df).collect()
    assert sum(r.n_copies for r in out) == len(rows)
    by_digest: dict[str, list[int]] = {}
    for i, t in rows:
        by_digest.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(i)
    for r in out:
        assert r.canonical_id == min(by_digest[r.digest])
        assert r.n_copies == len(by_digest[r.digest])


@SLOW
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdef"), st.integers(0, 999)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.integers(1, 4),
)
def test_politeness_budget_contract(spark, items, budget):
    """W1: selected ∪ deferred partitions the frontier; every host gets at
    most `budget` selected rows; a host with ≥ budget pending gets exactly
    budget (work-conserving)."""
    rows = [
        (f"https://{h}.test/p{i}", f"{h}.test", 0, 0, None, 0, 0, i, 0)
        for h, i in items
    ]
    frontier = spark.createDataFrame(
        rows,
        "url STRING, host STRING, level INT, attempt INT, parent_url STRING,"
        "parent_seq LONG, link_pos INT, seq LONG, discovered_round INT",
    )
    selected, deferred = split_ranked(rank_frontier(frontier, host_budget=budget))
    sel = [(r.host, r.url) for r in selected.collect()]
    def_ = [(r.host, r.url) for r in deferred.collect()]
    assert len(sel) + len(def_) == len(rows)
    assert set(u for _, u in sel).isdisjoint(u for _, u in def_)
    from collections import Counter

    per_host_sel = Counter(h for h, _ in sel)
    per_host_all = Counter(f"{h}.test" for h, _ in items)
    for host, n_all in per_host_all.items():
        assert per_host_sel[host] == min(budget, n_all), host


@SLOW
@given(st.lists(texts, min_size=1, max_size=12))
def test_minhash_signature_is_permutation_invariant(spark, docs):
    """Shuffling document ROW ORDER never changes any signature (the
    min-aggregation is order-free) — the property that makes signatures
    stable across partitionings/cluster layouts."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df1 = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df2 = spark.createDataFrame(rows[::-1], "doc_id LONG, text STRING").repartition(5)
    sig = lambda df: {
        (r.doc_id, r.i): r.minhash for r in DD.minhash_signatures(df).collect()
    }
    assert sig(df1) == sig(df2)


@SLOW
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa bb", "cc dd", "ee ff", "x", "", "  "]),
            max_size=6,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_global_line_dedup_matches_python_oracle(spark, docs_lines):
    """Keep-first cross-doc line dedup == the literal spec: an eligible
    line survives only at the first (doc_id, pos); short/empty lines
    always survive; counts are conserved."""
    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs_lines)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r.doc_id: r for r in DD.global_line_dedup(df, min_chars=2).collect()
    }

    winner: dict[str, tuple[int, int]] = {}
    for i, text in rows:
        for pos, ln in enumerate(text.split("\n")):
            if len(ln.strip()) >= 2 and ln not in winner:
                winner[ln] = (i, pos)
    for i, text in rows:
        lines = text.split("\n")
        kept = [
            ln
            for pos, ln in enumerate(lines)
            if len(ln.strip()) < 2 or winner[ln] == (i, pos)
        ]
        assert out[i].clean_text == "\n".join(kept)
        assert out[i].n_kept == len(kept)
        assert out[i].n_kept + out[i].n_removed == len(lines)


@SLOW
@given(
    st.lists(
        st.tuples(st.sampled_from("abcd"), st.integers(1, 30)),
        min_size=1,
        max_size=20,
    ),
    st.dictionaries(st.sampled_from("abcd"), st.integers(0, 5), max_size=4),
)
def test_mix_plan_matches_python_oracle(spark, docs, weights):
    """mix_plan == the closed-form spec: bottleneck source (argmin
    tokens-per-weight, source tiebreak) at exactly 10000 bp, every rate
    floor(10000·t*·w / (w*·t)), zero-weight sources excluded."""
    from distributed_crawl_spark.functions import curation as CU

    rows = [
        (i, " ".join(["w"] * n), s) for i, (s, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = {
        r.source: r
        for r in CU.mix_plan(df, weights=weights, default_weight=1).collect()
    }

    toks: dict[str, int] = {}
    for _, text, s in rows:
        toks[s] = toks.get(s, 0) + len(text.split())
    w_of = lambda s: weights.get(s, 1)
    elig = [s for s in toks if w_of(s) > 0 and toks[s] > 0]
    if not elig:
        assert all(r.rate_bp == 0 for r in out.values())
        return
    s_star = min(elig, key=lambda s: (toks[s] / w_of(s), s))
    t_star, w_star = toks[s_star], w_of(s_star)
    for s, r in out.items():
        assert r.n_tokens == toks[s] and r.weight == w_of(s)
        if w_of(s) > 0:
            expect = (10000 * t_star * w_of(s)) // (w_star * toks[s])
            assert r.rate_bp == expect, (s, r.rate_bp, expect)
        else:
            assert r.rate_bp == 0
        assert r.planned_tokens == (toks[s] * r.rate_bp) // 10000
    assert out[s_star].rate_bp == 10000


@given(st.lists(
    st.tuples(
        st.from_regex(r"https://[a-z]{1,8}\.test/[a-z0-9/]{0,20}",
                      fullmatch=True),
        st.binary(max_size=200),
    ),
    min_size=1, max_size=6,
))
@settings(max_examples=25, deadline=None)
def test_warc_roundtrip_property(records):
    """Synthesize a WARC stream from arbitrary (url, body) pairs →
    iter_warc_records recovers urls in order and bodies byte-exactly,
    for both the plain and the member-gzipped encodings."""
    import gzip as _gz

    from distributed_crawl_spark.sources.warc import iter_warc_records

    def rec(url, body):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2026-01-02T03:04:05Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    blob = b"".join(rec(u, b) for u, b in records)
    for encoded in (blob, b"".join(_gz.compress(rec(u, b))
                                   for u, b in records)):
        got = list(iter_warc_records(encoded))
        assert [r["url"] for r in got] == [u for u, _ in records]
        assert [r["html"] for r in got] == [b for _, b in records]


@given(texts)
@settings(max_examples=50, deadline=None)
def test_nfc_kernel_idempotent(t):
    """NFC is a projection: applying it twice equals once, and the
    changed flag is exactly 'was not already NFC' (UAX #15 invariant the
    DuckDB oracle relies on)."""
    import unicodedata

    once = unicodedata.normalize("NFC", t)
    assert unicodedata.normalize("NFC", once) == once
    assert (once != t) == (not unicodedata.is_normalized("NFC", t))


# constrained alphabet for normalization parity: exercising the pipeline
# composition (case, accents, digits, punct, whitespace), not the JVM
# vs CPython unicode-table edge cases
_norm_texts = st.text(
    alphabet="abcXYZ 09\t\n.,!?\"'()[]{}<>/\\|@#$%^&*_+=~-àéÀÉçÑ汉я",
    max_size=60,
)


def py_normalize_for_dedup(text: str) -> str:
    import re

    from distributed_crawl_spark.functions.dedup import (_ACCENT_DST,
                                                         _ACCENT_SRC)

    t = text.lower()
    t = t.translate(str.maketrans(_ACCENT_SRC, _ACCENT_DST))
    t = re.sub(r"[0-9]", "0", t)
    t = re.sub(r"[.,;:!?\"'()\[\]{}<>/\\|@#$%^&*_+=~-]", "", t)
    t = re.sub(r"\s+", " ", t, flags=re.ASCII)
    return t.strip(" ")


@SLOW
@given(st.lists(_norm_texts, min_size=1, max_size=20))
def test_normalize_for_dedup_matches_python(spark, ts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ts)],
                               "i LONG, text STRING")
    got = {
        r.i: r.n
        for r in df.select(
            "i", DD.normalize_for_dedup(F.col("text")).alias("n")
        ).collect()
    }
    for i, t in enumerate(ts):
        assert got[i] == py_normalize_for_dedup(t), repr(t)
    # idempotence: a normalized string is its own normal form
    renorm = {
        r.i: r.n
        for r in spark.createDataFrame(
            [(i, v) for i, v in got.items()], "i LONG, text STRING"
        ).select("i", DD.normalize_for_dedup(F.col("text")).alias("n"))
        .collect()
    }
    assert renorm == got


_labels = st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1,
                   max_size=7)


@SLOW
@given(st.lists(_labels, min_size=1, max_size=15),
       st.sets(st.sampled_from(
           ["a.b", "b.c", "c.a", "dd.a", "a.a.b", "b.b.c.a"]),
           min_size=1, max_size=4))
def test_blocklist_filter_matches_python(spark, hostlabels, domains):
    hosts = [".".join(ls) for ls in hostlabels]
    docs = spark.createDataFrame(
        [(i, f"https://{h}/p") for i, h in enumerate(hosts)],
        "doc_id LONG, url STRING",
    )
    bl = spark.createDataFrame([(d, "cat") for d in sorted(domains)],
                               "domain STRING, category STRING")
    got = {r.doc_id: r.matched_domain
           for r in U.blocklist_filter(docs, bl).collect()}
    for i, h in enumerate(hosts):
        labels = h.split(".")
        want = None
        for d in range(min(5, len(labels)), 1, -1):   # longest first
            sfx = ".".join(labels[len(labels) - d:])
            if sfx in domains:
                want = sfx
                break
        assert got[i] == want, (h, sorted(domains))
