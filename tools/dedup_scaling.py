"""Scaling evidence for the dedup family: wall growth at 10× documents.

Builds 5k- and 50k-doc corpora from ONE generator shaped like the
driver testdata — word-soup drawn from sf0.1's own vocabulary, the same
50–100-word length band, 20 sources, AND ~10% planted near-dups (docs
with id%10==0 copy their successor's token stream with a 1-in-20
per-token re-roll, giving trigram Jaccard ≈ 0.74 and small hamming
distance — the testdata's near-dup rate) — then times the four pair/CC
contract queries (`dedup_ngram_jaccard`, `dedup_minhash_lsh`,
`dedup_simhash_pairs`, `dedup_components`) at both sizes, interleaved
medians. Only N varies between the corpora, so the wall ratio measures
scaling, not corpus composition. Reports ratio and growth exponent
(log10(ratio)); the posting-list and 16-bit-block designs predict
near-linear — candidate COUNTS are printed too because pair output is
the quantity that can grow quadratically on a self-similar corpus.

Usage: python tools/dedup_scaling.py [n_docs] — one JSON line.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from distributed_crawl_spark.session import build_session

SF01 = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_components",
    # round-4 additions — all documents-only queries, same harness:
    "dedup_lines_global",   # keep-first line dedup (3 uniform shuffles)
    "unigram_logprob",      # census -> broadcast scoring (2 shuffles)
    "anchor_census",        # Arrow parse + census + top-k window
    # round-4 session-4 additions:
    "doc_keywords",         # tf+df censuses + token join + window top-k
    "normalize_nfc",        # one Arrow pass, zero shuffle
    # round-4 session-5 additions:
    "image_neardup",        # dHash Arrow pass + pigeonhole pair join
    "c4_clean",             # split -> HOF filter -> rejoin, zero shuffle
    "ccnet_buckets",        # LM census + distinct-(lang,score) window
    "dedup_exact_norm",     # normalize + one digest shuffle (3x rows)
    # round-5 additions:
    "substring_spans",      # winnow anchors -> census -> bounded extension
    "bm25_search",          # postings census + broadcast term join + top-k
    "bigram_logprob",       # two censuses -> broadcast scoring
    "hits_scores",          # 2x2 integer power half-steps + 1-row max
    "recrawl_visits",       # lag window + per-page agg, one page shuffle
    # round-5 session-2 additions (documents-only contract queries):
    "chunk_documents",      # zero-shuffle projection+explode, output-bound
    "blocklist_mine",       # Gopher-feature scan + |sources| census
    "tokenizer_stats",      # one projection + |langs| census
    "url_template_mine",    # template census + |hosts| broadcast rollup
    "mirror_detect",        # digest shuffle + max_df posting-list pairs
    "gate_agreement",       # 3-gate regex scan + <=8-cell census
    "drain_plan",           # host census + |hosts|-keyed budget join
    "sitemap_coverage",     # url-keyed distincts + semi/anti + census
    "robots_audit",         # broadcast robots join + robotparser UDF
    "importance_sample",    # distinct-score census + hash filter
    # round-5 session-5 additions:
    "link_spam_signals",    # two map-side censuses + |hosts|-sized join
    "trust_rank",           # 3 host-keyed shuffles x iters, checkpointed
    "spam_mass",            # host_rank + scaled trust_rank + 1 equi-join
    "reciprocal_links",     # distinct-pair census + semi self-join
    "host_language_mix",    # one (host,lang) census + bounded rollups
    # round-5 session-6 additions:
    "dedup_containment",    # shared posting-list census + direction explode
    "host_communities",     # 4x (neighbor join + census + top-1 window)
    "video_frames",         # one Arrow metadata pass + closed-form explode
    "pii_cc_luhn",          # regex scan + HOF checksum, zero shuffle
    "containment_salted",   # real-web df regime: pair machinery at 10x
    "communities_scaled",   # hosts scale with docs: 10x label tables
    # round-5 session-7 additions (documents-only contract queries):
    "redirect_resolve",     # log2(max_hops) doubling joins on |nodes| rows
    "redirect_aliases",     # + one terminal census
    "lane_assign",          # zero-shuffle explode + map-side top-1 window
    "lane_load",            # + |hosts| weight join + |lanes| census
    "soft404_flags",        # regex + wc scan, zero shuffle
    "soft404_hosts",        # host/digest censuses + top-1 window
    "strippable_params",    # one variant-group census (2x expand)
    "tfidf_keywords",       # postings census + idf join + top-k window
    "degree_census",        # two direction censuses + |hosts| merge
    "degree_histogram",     # + 4-way stack + <=256-row census
    "canonical_urls",       # DUST learn + broadcast drop-set rewrite
    "contract_edges",       # two |mapping| joins + edge census
    "collocations",         # two censuses + vocab joins + TakeOrdered
    "cluster_split",        # simhash CC chain + hash-split projection
    "domain_rollup",        # census-sized suffix groupBy
]


def _q_substring_spans(spark, d):
    """Probe-local twin of the substring_dedup operator run on the probe
    corpus ITSELF (the contract query synthesizes doc_id-%-3 groups whose
    size grows with the corpus, making its pair output quadratic BY
    CONSTRUCTION — here the planted ~10% near-dup pairs keep duplicated
    mass proportional to n_docs, which is the honest scaling shape).
    w=20/s=8: the 1-in-20 per-token mutation leaves exact runs with
    ~20-token expected length, so a healthy fraction of planted pairs
    carries >=20-token shared spans."""
    from distributed_crawl_spark.functions import curation as CU

    return CU.substring_spans(
        spark.read.parquet(f"{d}/documents.parquet"), w=20, s=8
    )


def _q_containment_salted(spark, d):
    """Probe-local twin of dedup_containment on a REAL-WEB shingle
    regime: the raw probe corpus draws from the testdata's 31-word
    vocabulary, so at 50k docs every possible trigram exceeds
    max_df=64 and the rare filter (correctly) empties the index —
    flat walls, but zero pairs measured. Salting every token with its
    BASE doc id (the near-dup plant's source) makes each trigram
    df ∈ {1, 2} — the web regime where shingles are mostly unique —
    so the posting-list census, pair enumeration, and direction
    explode all carry the planted ~10% near-dup mass at both sizes."""
    from distributed_crawl_spark.functions import dedup as DD

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    base = F.when(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") + 1 < n),
        F.col("doc_id") + 1,
    ).otherwise(F.col("doc_id"))
    salted = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split(F.trim("text"), r"\s+"),
                lambda t: F.concat(F.lit("g"), base.cast("string"),
                                   F.lit("_"), t),
            ),
            " ",
        ).alias("text"),
    )
    return DD.ngram_containment_pairs(salted, threshold=0.8, max_df=64)


def _q_communities_scaled(spark, d):
    """LPA probe whose HOST COUNT scales with the corpus (the contract
    query pins 40 hosts at any sf, so its 10× row measures only the
    edge census): hosts = n_docs // 25 in planted groups of 5, intra-
    group edges from every doc + sparse cross edges — label table,
    neighbor join, census, and top-1 window all grow 10×."""
    from distributed_crawl_spark.functions import graph as GR

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n_hosts = max(40, docs.count() // 25)
    g = F.col("doc_id") % n_hosts
    grp = g - (g % 5)
    intra = docs.select(
        F.concat(F.lit("h"), g.cast("string")).alias("src"),
        F.concat(
            F.lit("h"),
            (grp + F.pmod(F.xxhash64("doc_id"), F.lit(5))).cast("string"),
        ).alias("dst"),
    )
    cross = docs.filter(F.col("doc_id") % 31 == 0).select(
        F.concat(F.lit("h"), g.cast("string")).alias("src"),
        F.concat(
            F.lit("h"),
            F.pmod(F.xxhash64("doc_id", F.lit("x")), F.lit(n_hosts))
            .cast("string"),
        ).alias("dst"),
    )
    return GR.label_communities(intra.unionByName(cross), iters=4)


def _q_recrawl_visits(spark, d):
    """Probe-local twin of recrawl_priority whose VISIT LOG scales with
    the corpus (the contract query reads the fixed events table): one
    page per document, 5 visits each, deterministic hash-driven digests
    — so the probe measures the page-key shuffle + lag window + agg at
    5x and 50x visit rows."""
    from distributed_crawl_spark.functions import recrawl as RC

    n = spark.read.parquet(f"{d}/documents.parquet").count()
    visits = (
        spark.range(n * 5)
        .select(
            (F.col("id") % n).alias("page"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.floor(F.col("id") / n) * 3600
                + F.pmod(F.xxhash64("id"), F.lit(600))
            ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit("d")), F.lit(3))
            .cast("string").alias("digest"),
            F.col("id").alias("event_id"),
        )
    )
    return RC.recrawl_priority(visits, order_col="event_id")


def build_corpus(spark, n_docs: int, out_dir: str,
                 id_offset: int = 0) -> str:
    """Deterministic twin of the sf0.1 documents table: tokens drawn
    (by per-position xxhash64) from sf0.1's own distinct vocabulary,
    lengths 50..100 words, sources/langs with the same cardinalities,
    near-dups planted at the testdata's ~10% rate (id%10==0 mirrors
    id+1's token stream with a 1/20 per-position re-roll — base docs are
    never themselves dups, so the construction is non-circular)."""
    vocab = [
        r.tok
        for r in spark.read.parquet(f"{SF01}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .distinct()
        .orderBy("tok")
        .collect()
    ]
    v = F.array(*[F.lit(w) for w in vocab])
    nv = len(vocab)
    langs = F.array(*[F.lit(x) for x in ["en", "de", "es", "fr", "und"]])

    def tok_at(src_id, j):
        return F.element_at(
            v, (F.pmod(F.xxhash64(src_id, j), F.lit(nv)) + 1).cast("int")
        )

    def length_of(src_id):
        return (
            F.lit(50) + F.pmod(F.xxhash64(src_id, F.lit("len")), F.lit(51))
        ).cast("int")

    is_dup = (F.col("id") % 10 == 0) & (F.col("id") + 1 < id_offset + n_docs)
    base = F.when(is_dup, F.col("id") + 1).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), length_of(base)),
        lambda j: F.when(
            is_dup & (F.pmod(F.xxhash64(F.col("id"), j, F.lit("m")), F.lit(20)) == 0),
            tok_at(F.xxhash64(F.col("id"), F.lit("re")), j),
        ).otherwise(tok_at(base, j)),
    )
    text = F.array_join(words, " ")
    docs = spark.range(id_offset, id_offset + n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(langs, (F.pmod(F.xxhash64("id", F.lit("lang")), F.lit(5)) + 1).cast("int")).alias("lang"),
        F.concat(F.lit("source-"), F.pmod(F.xxhash64("id", F.lit("src")), F.lit(20))).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    path = f"{out_dir}/documents.parquet"
    docs.write.mode("overwrite").parquet(path)
    return out_dir


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    global QUERIES
    if len(sys.argv) > 2:  # optional filter: bench only the named queries
        QUERIES = [q for q in QUERIES if q in sys.argv[2:]]
    spark = build_session(app_name="dedup-scaling")
    small_dir = build_corpus(spark, n_docs // 10, "/tmp/docs_scale1x")
    big_dir = build_corpus(spark, n_docs, "/tmp/docs_scale10x")

    import __spark_entry__ as entry

    qs = dict(entry.queries())
    qs["substring_spans"] = _q_substring_spans
    qs["recrawl_visits"] = _q_recrawl_visits
    qs["containment_salted"] = _q_containment_salted
    qs["communities_scaled"] = _q_communities_scaled
    walls: dict[str, dict[str, list[float]]] = {
        q: {"sf01": [], "big": []} for q in QUERIES
    }
    counts: dict[str, dict[str, int]] = {q: {} for q in QUERIES}

    for q in QUERIES:  # warmup both sizes once
        counts[q]["sf01"] = qs[q](spark, small_dir).count()
    for _ in range(3):
        for q in QUERIES:
            t0 = time.monotonic()
            qs[q](spark, small_dir).count()
            walls[q]["sf01"].append(time.monotonic() - t0)
            t0 = time.monotonic()
            counts[q]["big"] = qs[q](spark, big_dir).count()
            walls[q]["big"].append(time.monotonic() - t0)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {"metric": "dedup_scaling_10x", "n_docs": n_docs, "queries": {}}
    for q in QUERIES:
        w1, w10 = med(walls[q]["sf01"]), med(walls[q]["big"])
        out["queries"][q] = {
            "sf01_sec": round(w1, 2),
            "big_sec": round(w10, 2),
            "ratio": round(w10 / w1, 2),
            "exponent": round(math.log10(w10 / w1), 2),
            "rows_sf01": counts[q]["sf01"],
            "rows_big": counts[q]["big"],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
