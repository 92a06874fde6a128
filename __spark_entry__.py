"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl round (politeness window →
fetch-join → pandas-UDF extraction → link explode) over a pages table
synthesized deterministically from sf0.001 documents.

``queries()`` exposes every SQL-expressible operator from SURVEY.md §2
plus the training-data-pipeline extensions (dedup families, similarity
search, text analysis, multimodal plumbing); ``oracle_sql()`` gives the
DuckDB-equivalent for each.

Cross-engine determinism rules used throughout (so value-hashes match):
- hashes are md5/sha256-based (both engines agree); Spark-only hashes
  (xxhash64/murmur) never appear in checked outputs;
- ratios/cosines are floor-scaled to integers, never round()'ed;
- double SUMs go through DECIMAL (exact, order-independent) then DOUBLE;
- timestamps are emitted as wall-clock strings (the testdata parquet is
  TIMESTAMP_NTZ; formatting the naive value is session-timezone-proof,
  epoch conversion is not).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_crawl_spark.functions import curation as CU
from distributed_crawl_spark.functions import dedup as DD
from distributed_crawl_spark.functions import events as EV
from distributed_crawl_spark.functions import graph as GR
from distributed_crawl_spark.functions import pagehealth as PH
from distributed_crawl_spark.functions import recrawl as RC
from distributed_crawl_spark.functions import redirects as RD
from distributed_crawl_spark.functions import search as SE
from distributed_crawl_spark.functions import similarity as SIM
from distributed_crawl_spark.functions import textstats as TS
from distributed_crawl_spark.functions import text as T
from distributed_crawl_spark.functions import url as U
from distributed_crawl_spark.functions.text import (
    clean_markdown,
    markdown_extract_udf,
    text_metadata,
    truncate_content,
)
from distributed_crawl_spark.operators.fetch import fetch_and_extract
from distributed_crawl_spark.operators.multimodal import image_metadata
from distributed_crawl_spark.operators import politeness as PO
from distributed_crawl_spark.operators import robots as RO
from distributed_crawl_spark.operators.politeness import select_round

SF0001 = "/root/testdata/sf0.001"
P31 = DD.MERSENNE31


# scan-parallelism memo: (sf_dir, table) -> native scan partition count.
# An int per table, NOT data — every query still computes from parquet.
_SCAN_PARTS: dict[tuple[str, str], int] = {}


def _t(spark: SparkSession, sf_dir: str, name: str, par: bool = False) -> DataFrame:
    """Load a testdata table, redistributing unsplittable scans.

    The testdata parquet files are written as a SINGLE row group — the
    minimum parquet read unit — so no split configuration can give the
    scan more than 1-2 tasks, and every compute stage pipelined with it
    (tokenize/explode, dot products, hashing) runs on one core of the
    whole box.  When the native scan yields fewer partitions than the
    session's parallelism, redistribute once right after the read (the
    guide's unsplittable-input remedy).  Scale-adaptive by construction:
    real corpus tables carry many row groups/files, the condition is
    false, and this is a no-op — never a constant tuned to local[32].

    ``par`` is opt-in per query: the redistribution pays one exchange +
    one AQE stage (~0.3s of fixed latency per consumer on this box), so
    it is enabled exactly where the scan-pipelined per-row work
    (shingling, hashing, dot products, pandas UDFs) dwarfs that cost —
    measured query by query in OPTIMIZATION_r06.md — and left off for
    the projection/aggregate queries where the exchange would dominate.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if not par:
        return df
    want = spark.sparkContext.defaultParallelism
    key = (sf_dir, name)
    have = _SCAN_PARTS.get(key)
    if have is None:
        have = df.rdd.getNumPartitions()
        _SCAN_PARTS[key] = have
    return df.repartition(want) if have < want else df


# ---------------------------------------------------------------------------
# Synthetic URL column over the documents table — the crawl-kernel queries
# need URLs; derive them deterministically from (source, doc_id) so the
# DuckDB oracle can rebuild the exact same strings.
# ---------------------------------------------------------------------------

def _doc_url_col() -> F.Column:
    did = F.col("doc_id")
    ext = (
        F.when(did % 7 == 0, F.lit(".pdf"))
        .when(did % 7 == 1, F.lit(".zip"))
        .when(did % 7 == 2, F.lit(""))
        .otherwise(F.lit(".html"))
    )
    frag = F.when(did % 3 == 0, F.concat(F.lit("#sec-"), did.cast("string"))).otherwise(F.lit(""))
    return F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/d/"),
        (did % 5).cast("string"),
        F.lit("/page-"),
        did.cast("string"),
        ext,
        frag,
    )


_URL_SQL = (
    "'https://' || source || '.example.org/d/' || (doc_id % 5)::VARCHAR"
    " || '/page-' || doc_id::VARCHAR"
    " || CASE doc_id % 7 WHEN 0 THEN '.pdf' WHEN 1 THEN '.zip' WHEN 2 THEN ''"
    " ELSE '.html' END"
    " || CASE WHEN doc_id % 3 = 0 THEN '#sec-' || doc_id::VARCHAR ELSE '' END"
)

# portable 48-bit md5-prefix integer (see dedup.md5_int48) in DuckDB form
_MD5I48 = "CAST('0x' || substr(md5({x}), 1, 12) AS BIGINT)"

# Multi-table hyperplane LSH buckets (the 'balanced' preset) in DuckDB
# form: bucket(vec_id, t, bucket) from a `comp` CTE of (vec_id, val, d).
# Table 0 uses the legacy 'j_d' plane seed; tables t>0 use 't{t}_j_d' —
# exactly similarity.plane_component.
# 64-bit two-half SimHash fingerprint → 16-bit pigeonhole blocks →
# candidate pairs (DuckDB CTE chain shared by dedup_simhash_pairs and
# dedup_components; ends at `cand`)
_SH64_PAIRS_CTES = """toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
              FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf,
                     CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS hlo,
                     CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS hhi
              FROM toks GROUP BY 1, 2
            ),
            bits AS (
              SELECT doc_id, j,
                     sum(CASE WHEN ((CASE WHEN j >= 32 THEN hhi ELSE hlo END)
                                    >> (j % 32)) & 1 = 1
                         THEN tf ELSE -tf END) AS w
              FROM tf CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)
              GROUP BY 1, 2
            ),
            fp AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN w > 0 AND j >= 32
                              THEN (1::BIGINT << (j - 32)) ELSE 0 END) AS BIGINT) AS sh_hi,
                     CAST(sum(CASE WHEN w > 0 AND j < 32
                              THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sh_lo
              FROM bits GROUP BY 1
            ),
            blk AS (
              SELECT doc_id, sh_hi, sh_lo, b,
                     ((CASE WHEN b >= 2 THEN sh_hi ELSE sh_lo END)
                      >> ((b % 2) * 16)) & 65535 AS bv
              FROM fp CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.sh_hi AS ha, a.sh_lo AS la, b.sh_hi AS hb, b.sh_lo AS lb
              FROM blk a JOIN blk b ON a.b = b.b AND a.bv = b.bv
                                    AND a.doc_id < b.doc_id
            )"""

_BAL = SIM.LSH_PRESETS["balanced"]
_LSH_MT_BUCKETS_CTE = f"""
            planes AS (
              SELECT t, j, d,
                     (CAST('0x' || substr(md5(
                        CASE WHEN t = 0
                             THEN j::VARCHAR || '_' || d::VARCHAR
                             ELSE 't' || t::VARCHAR || '_' || j::VARCHAR || '_' || d::VARCHAR
                        END), 1, 8) AS BIGINT) % 2001 - 1000)::DOUBLE AS w
              FROM (SELECT unnest(generate_series(0, {_BAL['n_tables'] - 1})) AS t),
                   (SELECT unnest(generate_series(0, {_BAL['n_planes'] - 1})) AS j),
                   (SELECT unnest(generate_series(0, 63)) AS d)
            ),
            proj AS (
              SELECT vec_id, t, j, sum(val * w) AS s
              FROM comp JOIN planes USING (d) GROUP BY 1, 2, 3
            ),
            bucket AS (
              SELECT vec_id, t,
                     sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
              FROM proj GROUP BY 1, 2
            )"""

# DuckDB shingle-array builder over whitespace tokens (3-grams)
_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                               i -> array_to_string(t[i:i+2], ' '))) AS shingle
  FROM toks
),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh)
"""


def _fl(col: F.Column, scale: int) -> F.Column:
    return F.floor(col * scale).cast("long")


# ---------------------------------------------------------------------------
# entry — flagship: one full crawl round on synthesized sf0.001 pages
# ---------------------------------------------------------------------------

def _synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-style pages table (url, warc_ts, html, text, lang) built
    deterministically from the documents table: each page links to three
    sibling docs, giving the frontier a real link graph to expand."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    url = _doc_url_col()
    link = [
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/d/"),
            (((F.col("doc_id") * 7 + k) % n) % 5).cast("string"),
            F.lit("/page-"),
            ((F.col("doc_id") * 7 + k) % n).cast("string"),
            F.lit(".html"),
        )
        for k in (1, 2, 3)
    ]
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>b{}</style></head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><script>var x=1;</script><p>"),
        F.col("text"),
        F.lit('</p><a href="'), link[0], F.lit('">l1</a> '),
        F.lit('<a href="'), link[1], F.lit('">l2</a> '),
        F.lit('<a href="'), link[2], F.lit('">l3</a></body></html>'),
    )
    return docs.select(
        url.alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: one politeness-budgeted crawl round over sf0.001."""
    pages = _synth_pages(spark, SF0001)
    docs = _t(spark, SF0001, "documents")
    frontier = docs.filter(F.col("doc_id") < 20).select(
        _doc_url_col().alias("url"),
        F.col("source").alias("host"),
        F.lit(0).alias("level"),
        F.lit(0).alias("attempt"),
        F.col("doc_id").alias("seq"),
    )
    selected, _deferred = select_round(frontier, host_budget=5, salt_threshold=10**9)
    fetched = fetch_and_extract(selected, pages, max_links=10)
    return fetched.select(
        "url",
        "host",
        "status_code",
        "md_hash",
        "page_slug",
        "content_length",
        "geo_blocked",
        F.size("extracted_links").alias("n_links"),
    )


# ---------------------------------------------------------------------------
# queries — (spark, sf_dir) -> DataFrame, one per operator
# ---------------------------------------------------------------------------

def q_url_slug(spark, sf_dir):
    """P3 page slug + host + validity over synthetic urls (SURVEY §2.3)."""
    docs = _t(spark, sf_dir, "documents")
    url = _doc_url_col()
    return docs.select(
        F.col("doc_id"),
        url.alias("url"),
        U.page_slug(url).alias("slug"),
        U.url_host(url).alias("host"),
        U.is_valid_url(url).alias("is_valid"),
    )


def q_content_hash(spark, sf_dir):
    """P4 content hashes: sha256[:16] + md5 (SURVEY §2.3)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        U.content_hash(F.col("text")).alias("md_hash"),
        U.md5_hash(F.col("text")).alias("md5_hash"),
    )


def q_url_normalize(spark, sf_dir):
    """P2 fragment-drop + S2 scheme default (SURVEY §2.3/§2.1)."""
    docs = _t(spark, sf_dir, "documents")
    url = _doc_url_col()
    raw = F.when(F.col("doc_id") % 4 == 0, F.substring(url, 9, 10**6)).otherwise(url)
    return docs.select(
        "doc_id",
        raw.alias("raw_url"),
        U.ensure_scheme(raw).alias("with_scheme"),
        U.normalize_url(U.ensure_scheme(raw)).alias("normalized"),
    )


def q_blocked_ext_filter(spark, sf_dir):
    """F4 blocked-extension filter (SURVEY §2.4)."""
    docs = _t(spark, sf_dir, "documents")
    url = _doc_url_col()
    return (
        docs.select("doc_id", url.alias("url"))
        .filter(~U.has_blocked_extension(F.col("url")))
    )


def q_geo_block_detect(spark, sf_dir):
    """P12 geo-block predicate over page text (SURVEY §2.3)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", U.is_geo_blocked(F.col("text")).alias("geo_blocked")
    )


def q_seen_anti_join(spark, sf_dir):
    """F6/D2 URL-seen anti-join shape: orders never fetched (no lineitem)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return orders.join(lineitem, "o_orderkey", "left_anti").select("o_orderkey")


def q_link_dedup_cap(spark, sf_dir):
    """D1+L2: first-occurrence distinct + cap 10 over per-doc tokens —
    the deterministic replacement for the reference's list(set())[:10]."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(DD.tokens(F.col("text"))).alias("pos", "token")
    )
    first = toks.groupBy("doc_id", "token").agg(F.min("pos").alias("first_pos"))
    w = Window.partitionBy("doc_id").orderBy("first_pos")
    return (
        first.withColumn("link_pos", F.row_number().over(w))
        .filter(F.col("link_pos") <= 10)
        .select("doc_id", "link_pos", "token")
    )


def q_politeness_window(spark, sf_dir):
    """W1 per-host politeness budget window (SURVEY §2.9)."""
    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        _doc_url_col().alias("url"),
        F.col("source").alias("host"),
        F.lit(0).alias("level"),
        F.lit(0).alias("attempt"),
        F.col("doc_id").alias("seq"),
    )
    selected, _ = select_round(frontier, host_budget=8, salt_threshold=10**9)
    return selected.select("host", "url", "seq")


def q_frontier_fifo(spark, sf_dir):
    """L1 FIFO ordering: first 100 events by (ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy("ts", "event_id")
        .limit(100)
        .select(
            "event_id",
            F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
    )


def q_level_stats(spark, sf_dir):
    """A3 per-level stats shape over lineitem (level := l_linenumber)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_linenumber").alias("level")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


def q_error_histogram(spark, sf_dir):
    """A4 error-type histogram shape: group by truncated payload."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type"),
        F.substring(F.col("props"), 1, 8).alias("props_prefix"),
    ).agg(F.count(F.lit(1)).alias("n"))


def q_content_stats(spark, sf_dir):
    """A5 content-length stats (sum/avg/min/max) over documents."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        _fl(F.sum("n_chars") / F.count(F.lit(1)), 10000).alias("avg_chars_x1e4"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def q_seed_join(spark, sf_dir):
    """J1 seed-enrichment join shape: customer ⋈ nation ⋈ region (dims
    broadcast)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
        )
    )


def q_text_metadata(spark, sf_dir):
    """P9 word/char/line counts + title extraction."""
    docs = _t(spark, sf_dir, "documents")
    meta = text_metadata(F.col("text"))
    return docs.select(
        "doc_id",
        meta["word_count"].alias("word_count"),
        meta["char_count"].alias("char_count"),
        meta["line_count"].alias("line_count"),
        meta["title"].alias("title"),
    )


def q_truncate_content(spark, sf_dir):
    """P10 word-truncation with marker (max_words=50)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", truncate_content(F.col("text"), max_words=50).alias("truncated")
    )


def q_clean_markdown(spark, sf_dir):
    """P8 markdown cleanup over a constructed messy-whitespace column."""
    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("# Title  \n\n\n\n"), F.col("text"), F.lit("   \nend  \n\n \n")
    )
    return docs.select("doc_id", clean_markdown(messy).alias("cleaned"))


def q_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped aggregation (decimal-exact sums → double)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_hourly_events(spark, sf_dir):
    """Streaming-shaped tumbling-window aggregation (batch-verifiable twin
    of the Structured Streaming path; SURVEY §2.13)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.col("ts"), "yyyy-MM-dd HH").alias("hour_str"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def q_session_counters(spark, sf_dir):
    """A1/A2 session counters + success rate over events (SURVEY §2.7):
    one-row aggregate with conditional counts and a derived ratio."""
    ev = _t(spark, sf_dir, "events")
    n_click = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
    n_view = F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
    total = F.count(F.lit(1))
    return ev.agg(
        total.alias("total"),
        n_click.alias("n_click"),
        n_view.alias("n_view"),
        (total - n_click - n_view).alias("n_other"),
        _fl((n_click + n_view) / total, 10000).alias("success_rate_x1e4"),
    )


def q_frontier_expand(spark, sf_dir):
    """One BFS frontier expansion, end to end (SURVEY §2.5/§2.6 composition):
    seeds (doc_id<20) → 3 links each (deterministic link graph) →
    first-enqueuer-wins batch dedup → anti-join vs the seen set (= seeds)."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    seeds = docs.filter(F.col("doc_id") < 20).select(
        _doc_url_col().alias("url"), F.col("doc_id").alias("seq"), "source"
    )
    k = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
    links = seeds.select("url", "seq", "source", k).select(
        F.col("url").alias("parent_url"),
        F.col("seq").alias("parent_seq"),
        F.col("k").alias("link_pos"),
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/d/"),
            (((F.col("seq") * 7 + F.col("k")) % n) % 5).cast("string"),
            F.lit("/page-"),
            ((F.col("seq") * 7 + F.col("k")) % n).cast("string"),
            F.lit(".html"),
        ).alias("url"),
    )
    dedup = (
        links.groupBy("url")
        .agg(
            F.min_by(
                F.struct("parent_url", "parent_seq", "link_pos"),
                F.struct("parent_seq", "link_pos"),
            ).alias("w")
        )
        .select("url", "w.parent_url", "w.parent_seq", "w.link_pos")
    )
    return dedup.join(seeds.select("url"), "url", "left_anti").select(
        "url", "parent_url", "parent_seq", "link_pos"
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5 digest groups (training-data pipeline)."""
    return DD.exact_duplicates(_t(spark, sf_dir, "documents"))


def q_dedup_exact_norm(spark, sf_dir):
    """CCNet hash-normalized exact dedup on planted trivial variants:
    each doc expands to 3 rows — the base text; for even docs an
    UPPERCASED + punctuated + accent-folded twin and a quoted twin (all
    three normalize to the base → n_copies 3); for odd docs two
    different-digit suffixes (' 123' / ' 987.') that collapse onto each
    other but NOT onto the base (digits → 0). Same one-digest-shuffle
    plan as dedup_exact."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    t = F.col("text")
    even = d % 2 == 0
    row = lambda i, txt: F.struct(  # noqa: E731
        (d * 3 + i).alias("doc_id"), txt.alias("text"))
    variants = F.array(
        row(0, t),
        row(1, F.when(even, F.concat(F.upper(t), F.lit(" !!!")))
              .otherwise(F.concat(t, F.lit(" 123")))),
        row(2, F.when(even, F.concat(F.lit('"'),
                                     F.translate(t, "ae", "àé"),
                                     F.lit('"')))
              .otherwise(F.concat(t, F.lit(" 987.")))),
    )
    rows = docs.select(F.explode(variants).alias("r")).select("r.*")
    return DD.exact_duplicates(rows, normalize=True)


def q_dedup_ngram_jaccard(spark, sf_dir):
    """3-gram Jaccard near-dup pairs ≥ 0.5 (training-data pipeline).

    max_df=64 exercises the posting-list cap that bounds the inverted-index
    join's skew at corpus scale (a Zipf-head shingle otherwise produces an
    O(df²) pair blowup); the oracle applies the same document-frequency
    filter."""
    return DD.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents", par=True), threshold=0.5, max_df=64
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + LSH(4×4) candidate pairs (training-data pipeline)."""
    return DD.minhash_lsh_pairs(_t(spark, sf_dir, "documents", par=True))


def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash fingerprints (training-data pipeline)."""
    return DD.simhash(_t(spark, sf_dir, "documents", par=True))


def q_dedup_simhash64(spark, sf_dir):
    """64-bit SimHash fingerprints as two 32-bit halves (sh_hi, sh_lo),
    computed in one closed-form aggregate — the 10^9+-doc print width."""
    return DD.simhash64(_t(spark, sf_dir, "documents", par=True))


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster-then-compare semantic
    dedup — 32 seeded IVF cells, within-cell cosine pairs ≥ 0.4,
    connected components → min-id canonical pick. Pair cost is
    Σ|cluster|², never N²; the oracle replays the same chain with a
    recursive CTE."""
    return SIM.semdedup(
        _t(spark, sf_dir, "embeddings", par=True), n_cells=32, threshold=0.4
    )


def q_pq_encode(spark, sf_dir):
    """Product-quantization encode: 64-dim embeddings → 8 code bytes
    (16-entry seeded per-subspace codebooks) + reconstruction-cosine
    distortion. The argmin is ordered-fold L2² in BOTH engines so
    near-tie code picks can't flip across engines."""
    return SIM.pq_encode(_t(spark, sf_dir, "embeddings"))


def q_pq_topk(spark, sf_dir):
    """ADC top-5 over PQ codes (the IVF-PQ search pattern): database =
    4-byte codes, query = full precision, distance = broadcast-LUT
    lookups summed as integers (order-free). Queries = vec_id < 10,
    same protocol as the other ANN contracts."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def q_pq_rerank(spark, sf_dir):
    """Two-stage PQ search (the measured production composition): ADC
    shortlist of 100 over 4-byte codes, exact cosine re-rank to top-5
    on the shortlist only — brute_force_topk's output shape at a 98%
    compressed scan."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.pq_topk_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=5, shortlist=100
    )


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash hamming-ball near-dup pairs via pigeonhole block join over
    64-bit two-half fingerprints: agree on ≥1 of 4 SIXTEEN-bit blocks ⇒
    candidate (65,536 buckets per block position — the scale form);
    bit_count over both halves verifies hamming ≤ 3."""
    return DD.simhash_pairs64(_t(spark, sf_dir, "documents", par=True), max_hamming=3)


def q_dedup_components(spark, sf_dir):
    """Near-dup connected components: 64-bit SimHash hamming-ball pairs
    → transitive closure → (doc_id, component_id = min id in cluster) —
    the canonical-pick step of a dedup pipeline. Iterative min-label
    propagation (Pregel-style CC as DataFrame joins; DuckDB oracle is a
    recursive CTE over the same pair set)."""
    return DD.near_dup_components(
        DD.simhash_pairs64(_t(spark, sf_dir, "documents", par=True), max_hamming=3)
    )


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs ≥ 0.4 (training-data pipeline)."""
    return SIM.embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings", par=True), threshold=0.4)


def q_dedup_embedding_lsh(spark, sf_dir):
    """LSH-bucketed embedding near-dup pairs ≥ 0.4 — the scale path: the
    self-join is an equi-join on (table, hyperplane bucket), never
    all-pairs. Uses the 'balanced' preset (6 planes × 4 tables), picked
    from the measured recall study in BENCH.md — the single-table
    8-plane default was the study's worst case on diffuse corpora."""
    return SIM.embedding_near_dup_pairs_lsh(
        _t(spark, sf_dir, "embeddings", par=True), threshold=0.4, preset="balanced"
    )


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors vec_id < 10."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-5 (random hyperplanes), 'balanced'
    preset (6 planes × 4 independent tables — recall-tuned from the
    BENCH.md study; candidates found by several tables score once)."""
    emb = _t(spark, sf_dir, "embeddings", par=True)
    return SIM.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, preset="balanced"
    )


def q_ann_ivf(spark, sf_dir):
    """IVF-Flat approximate top-5: 32 seeded coarse cells, 4 probed."""
    emb = _t(spark, sf_dir, "embeddings", par=True)
    return SIM.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_cells=32, nprobe=4
    )


def q_lang_id(spark, sf_dir):
    """Marker-lexicon language ID + per-language scores."""
    docs = _t(spark, sf_dir, "documents")
    scores = TS.lang_scores(F.col("text"))
    cols = [scores[lang].alias(f"score_{lang}") for lang in sorted(scores)]
    return docs.select("doc_id", TS.lang_id(F.col("text")).alias("lang_pred"), *cols)


def q_quality_score(spark, sf_dir):
    """Quality features + composite score (floor-scaled ratios)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    wc = TS.word_count(t)
    cc = TS.char_count(t)
    safe_wc = F.when(wc > 0, wc).otherwise(F.lit(1))
    safe_cc = F.when(cc > 0, cc).otherwise(F.lit(1))
    return docs.select(
        "doc_id",
        wc.alias("word_count"),
        cc.alias("char_count"),
        _fl((cc - wc + 1) / safe_wc, 10000).alias("mean_word_len_x1e4"),
        _fl(TS.punct_count(t) / safe_cc, 10000).alias("punct_ratio_x1e4"),
        _fl(TS.stopword_count(t) / safe_wc, 10000).alias("stop_ratio_x1e4"),
        _fl(TS.alpha_count(t) / safe_cc, 10000).alias("alpha_ratio_x1e4"),
    )


def q_token_count(spark, sf_dir):
    """Whitespace + BPE-ish token counts."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TS.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        TS.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_doc_fingerprint(spark, sf_dir):
    """Order-sensitive rolling document fingerprint."""
    docs = _t(spark, sf_dir, "documents", par=True)
    return docs.select("doc_id", TS.doc_fingerprint(F.col("text")).alias("fingerprint"))


def q_unigram_logprob(spark, sf_dir):
    """Self-trained unigram LM quality score (the distributable floor
    of CCNet's KenLM perplexity bucket): census → bounded top-V model →
    broadcast scoring — the 100-TB token stream never shuffles twice.
    Per-token log-probs are floor-quantized BEFORE the per-doc mean so
    the result is summation-order-free and oracle-hashable."""
    return TS.unigram_logprob(_t(spark, sf_dir, "documents"))


def q_blocklist_filter(spark, sf_dir):
    """UT1/FineWeb-style URL gate on synthesized structure: blocklist =
    25 nation-derived domains; each doc's URL is by turns a subdomain of
    a blocked domain (matched at depth 2), the blocked domain exactly, a
    clean host with ONE soft keyword hit (kept — under the threshold),
    or a clean host that gains 'free-casino-poker' (two hits → dropped)
    every third doc. Zero shuffle on the doc side — one broadcast hash
    join per suffix depth, longest suffix wins via coalesce."""
    docs = _t(spark, sf_dir, "documents")
    nation = _t(spark, sf_dir, "nation")
    dom = F.concat(
        F.regexp_replace(F.lower(F.col("n_name")), " ", "-"),
        F.lit(".example"),
    )
    bl = nation.select(
        dom.alias("domain"),
        F.when(F.col("n_regionkey") % 2 == 0, F.lit("adult"))
        .otherwise(F.lit("gambling")).alias("category"),
    )
    d = F.col("doc_id")
    urls = (
        docs.join(F.broadcast(nation), (d % 25) == F.col("n_nationkey"))
        .select(
            "doc_id",
            F.when(d % 4 == 0, F.concat(F.lit("https://www."), dom, F.lit("/")))
            .when(d % 4 == 1, F.concat(F.lit("https://"), dom, F.lit("/page")))
            .when(d % 4 == 2, F.concat(F.lit("https://ok"), d,
                                       F.lit(".org/casino-news")))
            .otherwise(F.concat(
                F.lit("https://ok"), d, F.lit(".org"),
                F.when(d % 3 == 0, F.lit("/free-casino-poker.html"))
                .otherwise(F.lit("/clean")),
            )).alias("url"),
        )
    )
    return U.blocklist_filter(urls, bl)


def q_ccnet_buckets(spark, sf_dir):
    """CCNet per-language head/middle/tail perplexity split: unigram-LM
    score + exact integer tertiles (3·cum ≥ total) per the table's lang
    column — the thresholds sort only DISTINCT (lang, score) pairs and
    broadcast back, so the split is census-cost at any corpus size."""
    return TS.ccnet_buckets(_t(spark, sf_dir, "documents"), lang_col="lang")


def q_script_profile(spark, sf_dir):
    """Unicode script census (the mC4/CCNet per-language routing
    pre-filter) on deterministically mixed-script text: each doc gets
    doc_id%5 Cyrillic and doc_id%3 Han chars appended, so the Java
    \\p{IsXxx} regexes are exercised on real non-Latin input while the
    oracle states the expected counts in closed form. Zero shuffle —
    codegen projections at scan speed."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    mixed = F.concat(
        F.col("text"),
        F.repeat(F.lit("я"), (d % 5).cast("int")),
        F.repeat(F.lit("汉"), (d % 3).cast("int")),
    )
    prof = TS.script_profile(mixed)
    return docs.select(
        "doc_id",
        *[
            prof[f"n_{s}"].cast("long").alias(f"n_{s}")
            for s in TS.SCRIPTS
        ],
        prof["main_script"].alias("main_script"),
    )


def q_analyze_stub(spark, sf_dir):
    """§2.12 analysis stage: mapInPandas batch 'inference' with the
    deterministic heuristic analyzer (LLM call stubbed; plumbing real)."""
    from distributed_crawl_spark.functions.analysis import analyze_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = analyze_documents(docs)
    return out.select(
        "doc_id",
        "main_topic",
        "content_type",
        "summary",
        F.floor(F.col("relevance_score") * 10 + F.lit(0.5)).cast("long").alias("score_x10"),
    )


def q_train_corpus_filter(spark, sf_dir):
    """End-to-end training-corpus gate — the composition this engine
    exists for: exact-dedup canonical docs ∩ lang_pred='en' ∩ word_count
    ≥ 50 ∩ alpha ratio ≥ 0.6. One digest-keyed shuffle (the dedup agg) +
    per-row closed-form scoring; every stage is a reused contract op."""
    docs = _t(spark, sf_dir, "documents", par=True)
    t = F.col("text")
    wc = TS.word_count(t)
    cc = TS.char_count(t)
    safe_cc = F.when(cc > 0, cc).otherwise(F.lit(1))
    scored = docs.select(
        "doc_id",
        TS.lang_id(t).alias("lang_pred"),
        wc.alias("word_count"),
        _fl(TS.alpha_count(t) / safe_cc, 10000).alias("alpha_x1e4"),
        F.md5(t).alias("digest"),
    )
    canon = scored.groupBy("digest").agg(F.min("doc_id").alias("doc_id"))
    return (
        scored.join(canon, ["digest", "doc_id"])
        .filter(
            (F.col("lang_pred") == "en")
            & (F.col("word_count") >= 50)
            & (F.col("alpha_x1e4") >= 6000)
        )
        .select("doc_id", "lang_pred", "word_count", "alpha_x1e4")
    )


def q_stream_dedup(spark, sf_dir):
    """§2.13 stateful streaming: applyInPandasWithState first-occurrence
    URL dedup across micro-batches (one file = one batch). Synthetic urls
    derived from doc_id mod 97 so waves repeat urls; the drained output is
    exactly the distinct url set — SQL-oracle-checkable."""
    import shutil
    import tempfile

    from distributed_crawl_spark.streaming.stream import (
        run_available_now,
        stream_dedup_urls,
    )

    urls = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://docs.test/"), (F.col("doc_id") % 97)).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    import glob
    import os

    work = tempfile.mkdtemp(prefix="stream_dedup_q_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    # two waves → two micro-batches; duplicates span the batch boundary
    for i, wave in enumerate((urls.filter(F.col("url") < "https://docs.test/5"),
                              urls)):
        wave.coalesce(1).write.mode("overwrite").parquet(f"{work}/stage{i}")
        for f in glob.glob(f"{work}/stage{i}/*.parquet"):
            shutil.copy(f, f"{in_dir}/wave{i}.parquet")
    stream = stream_dedup_urls(
        spark, in_dir, n_buckets=4, max_files_per_trigger=1
    )
    name = f"stream_dedup_{abs(hash(work)) % 10**8}"
    run_available_now(stream, f"{work}/ck", name)
    return spark.table(name).select("url")


def _corpus_gate(docs, pairs):
    """Shared near-dup corpus gate: canonical pick over ANY pair list
    (functions.dedup.canonical_docs — pair-source agnostic, the property
    that lets one pipeline swap dedup engines) ∩ lang_pred='en'
    ∩ word_count ≥ 50 ∩ alpha ratio ≥ 0.6. Canonicalization runs FIRST
    so language/quality scoring never touches dropped duplicates."""
    kept = DD.canonical_docs(docs, pairs)
    t = F.col("text")
    wc = TS.word_count(t)
    cc = TS.char_count(t)
    safe_cc = F.when(cc > 0, cc).otherwise(F.lit(1))
    return (
        kept.select(
            "doc_id",
            TS.lang_id(t).alias("lang_pred"),
            wc.alias("word_count"),
            _fl(TS.alpha_count(t) / safe_cc, 10000).alias("alpha_x1e4"),
        )
        .filter(
            (F.col("lang_pred") == "en")
            & (F.col("word_count") >= 50)
            & (F.col("alpha_x1e4") >= 6000)
        )
    )


def q_train_corpus_neardup(spark, sf_dir):
    """The FULL modern corpus gate: near-dup canonical (64-bit SimHash
    pairs → connected components → keep only each cluster's min-id doc)
    ∩ lang_pred='en' ∩ word_count ≥ 50 ∩ alpha ratio ≥ 0.6 — the
    composition that subsumes the exact-dedup gate (identical docs share
    a fingerprint, so exact dups are hamming-0 near-dups)."""
    docs = _t(spark, sf_dir, "documents", par=True)
    return _corpus_gate(docs, DD.simhash_pairs64(docs, max_hamming=3))


def q_train_corpus_neardup_minhash(spark, sf_dir):
    """The same corpus gate driven by the MinHash-LSH pair engine —
    banded Jaccard candidates (≥1 shared band of the 4×4 scheme, the
    band-collision gate production corpora like C4/RedPajama/Dolma use
    at Jaccard ~0.8 without a verify pass) → connected components →
    canonical min-id pick ∩ the identical lang/length/alpha filters.
    Demonstrates the gate is pair-source parameterized: only the pair
    generator differs from `train_corpus_neardup`."""
    docs = _t(spark, sf_dir, "documents")
    return _corpus_gate(docs, DD.minhash_lsh_pairs(docs))


def q_markdown_extract(spark, sf_dir):
    """Structure-preserving markdown extraction (the Crawl4AI-path output
    shape, hybrid_crawler.py:322-353) driven through the pandas UDF on
    KNOWN-SHAPE html synthesized from the documents table — headings →
    '#', links → absolutized '[text](url)' — so the DuckDB oracle can
    state the expected markdown in closed form and hash-check the real
    Arrow/UDF path (same pattern as multimodal_meta). Free-form html is
    covered by the golden-vector pytest (SURVEY §7.3: own goldens,
    browser parity out of contract)."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    clean = F.regexp_replace(F.col("text"), "[<>&]", "")
    url = F.concat(F.lit("https://md.test/doc/"), d)
    html = F.concat(
        F.lit("<h1>Doc "), d, F.lit("</h1><p>"), clean,
        F.lit('</p><a href="/next/'), d, F.lit('">next '), d, F.lit("</a>"),
    )
    md = markdown_extract_udf(url, html)
    return docs.select(
        "doc_id",
        md.alias("markdown"),
        F.size(F.split(md, "\n")).cast("long").alias("n_blocks"),
    )


def q_anchor_census(spark, sf_dir):
    """Inbound anchor-text census (top-k anchors per link target) driven
    through the real Arrow parse path on KNOWN-SHAPE html: every doc
    links to /d/(id%97) as 'go <b>N</b>' (nested tag inside the anchor),
    to /d/((31·id+7)%97) as 'see N', plus a '#frag' href and an
    empty-text icon link that the hygiene filters must drop. The oracle
    rebuilds the same (target, anchor) pairs in closed form — so the
    UDF's parse, absolutize, and filter chain is what's actually
    hash-checked (same pattern as markdown_extract/multimodal)."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    x = (d % 97).cast("string")
    y = ((d * 31 + 7) % 97).cast("string")
    clean = F.regexp_replace(F.col("text"), "[<>&]", "")
    url = F.concat(F.lit("https://anchors.test/doc/"), d.cast("string"))
    html = F.concat(
        F.lit("<p>"), clean, F.lit('</p><a href="/d/'), x,
        F.lit('">go <b>'), x, F.lit('</b></a><a href="/d/'), y,
        F.lit('">see '), y,
        F.lit('</a><a href="#frag">skip</a><a href="/icon/'), x,
        F.lit('"></a>'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return GR.anchor_census(pages, k=3)


def q_train_corpus_gopher(spark, sf_dir):
    """Full Gopher document-quality gate (Rae et al. 2021): keep docs
    passing ALL published bounds — word count 50..100k, mean word length
    3..10, symbol-to-word ≤0.1, bullet lines ≤90%, ellipsis lines ≤30%,
    ≥80% words alphabetic, ≥2 distinct stopwords, repeated lines
    ≤30%. Every rule input is a floor-scaled integer column (closed-form
    array/regex expressions, zero shuffle) so the oracle hashes the full
    feature surface, not just the verdict. The stopword lexicon here is
    the engine's English marker list rather than the paper's 8 words —
    English markers + the article 'a' rather than the paper's 8 words —
    the synthetic corpus's function words are 'a'/'the' (the paper list
    fires at most once per doc, making the gate vacuously empty);
    gopher_features defaults to the paper list."""
    docs = _t(spark, sf_dir, "documents")
    feats = TS.gopher_features(
        F.col("text"), stopwords=sorted(["a", *TS.LANG_MARKERS["en"]])
    )
    out = docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])
    return out.filter(TS.gopher_keep({n: F.col(n) for n in feats}))


def q_source_cap(spark, sf_dir):
    """C4-style per-domain cap: keep at most 10 docs per source, best
    integer-composite quality first (one window shuffle keyed by source;
    deterministic (quality DESC, doc_id) ranking)."""
    return CU.per_source_cap(_t(spark, sf_dir, "documents"), k=10)


# substring_dedup synthesis: shared passages planted at per-doc variable
# offsets (prefix length = doc_id%7+1), so copies are NEVER grid-aligned —
# the case span_scrub's fixed chunk window provably misses.
def q_substring_dedup(spark, sf_dir):
    """Arbitrary-offset exact-substring dedup (Lee et al. 2022 repeated-
    span pass): winnowed k-gram anchors (content-defined, so copies at
    different offsets still collide) → digest census → census-bounded
    pairwise maximal extension → per-doc interval merge. Corpus =
    documents with shared 12-token passages planted at doc_id-varying
    offsets (%3 passage A, %6 A+B adjacent — exercises touching-span
    merge) plus a 7-token near-miss below w=8 that must NOT flag.
    Passage CONTENT varies per 60-id group, so each duplicated digest
    occurs in a BOUNDED ~20-doc set at every sf — the production corpus
    shape (duplicated mass spread over many distinct passages); a single
    passage shared by an unbounded fraction of the corpus is the
    pathological-anchor regime the documented ``max_df`` knob handles
    (quadratic pairing per digest, like ngram_jaccard's cap).
    The oracle brute-forces every-offset duplicated-8-gram coverage —
    provably equal to the anchor plan's output (see substring_spans)."""
    docs = _t(spark, sf_dir, "documents", par=True)
    idc = F.col("doc_id")
    ids = idc.cast("string")
    gs = F.floor(idc / 60).cast("long").cast("string")

    def passage(prefix: str, n: int):
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(n)),
                lambda j: F.concat(
                    F.lit(prefix), gs, F.lit("x"), j.cast("string")
                ),
            ),
            " ",
        )

    pre = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (idc % 7 + 1).cast("int")),
            lambda j: F.concat(F.lit("u"), ids, F.lit("w"), j.cast("string")),
        ),
        " ",
    )
    suf = F.concat(F.lit("v"), ids, F.lit("w1 v"), ids, F.lit("w2 v"),
                   ids, F.lit("w3"))
    text = F.concat_ws(
        " ",
        pre,
        F.when(idc % 3 == 0, passage("qa", 12)),
        F.when(idc % 6 == 0, passage("qb", 12)),
        F.when(idc % 11 == 4, passage("nm", 7)),
        suf,
    )
    return CU.substring_spans(
        docs.select("doc_id", text.alias("text")), w=8, s=4
    )


def q_vector_index_search(spark, sf_dir):
    """Persisted IVF+PQ index round trip (functions/vecindex.py): build
    the index from the embeddings table into a /tmp directory (seeded
    centroids + seeded codebooks — the deterministic quantizers every
    similarity contract uses), READ IT BACK, and run the nprobe=2 ADC
    search for the first-10-vector queries against the loaded tables.
    The persisted layout is a pass-through (codes partitioned by
    cell_id), so the result equals the in-memory IVF-restricted ADC
    ranking the oracle computes directly: ann_ivf's assignment CTEs
    composed with pq_topk's LUT scoring, restricted to probed cells."""
    import re as _re

    from distributed_crawl_spark.functions import vecindex as VX

    emb = _t(spark, sf_dir, "embeddings")
    tag = _re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.rstrip("/"))
    path = f"/tmp/vecindex_contract_{tag}_{__import__('os').getpid()}"  # pid-unique: concurrent harnesses must not race one index dir
    VX.write_vector_index(emb, path, n_cells=32, m=8, n_codes=16, dim=64)
    idx = VX.read_vector_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 10)
    return VX.vector_index_topk(idx, queries, k=5, nprobe=2)


def q_pii_redact(spark, sf_dir):
    """PII redaction (emails → <EMAIL>, IPv4 → <IPV4>, phones → <PHONE>)
    + per-family counts on the original text — closed-form regex chain,
    dialect-portable patterns (no lookarounds/backrefs, so Java regex and
    DuckDB's RE2 agree)."""
    docs = _t(spark, sf_dir, "documents", par=True)
    t = F.col("text")
    return docs.select(
        "doc_id",
        TS.redact_pii(t).alias("redacted"),
        TS.pii_count(t, "email").alias("n_email"),
        TS.pii_count(t, "ipv4").alias("n_ipv4"),
        TS.pii_count(t, "phone").alias("n_phone"),
    )


def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition profile: duplicate-line fraction (closed
    form over the line array) + top word-2-gram share (one shuffle keyed
    by (doc, gram) with map-side partial counts)."""
    return TS.repetition_stats(_t(spark, sf_dir, "documents", par=True))


def q_corpus_split(spark, sf_dir):
    """Deterministic hash train/val/test split (90/5/5): a document's
    assignment depends only on md5(doc_id), so it survives repartitioning
    and corpus growth — the only correct split for an evolving corpus."""
    return CU.corpus_split(_t(spark, sf_dir, "documents"))


def q_source_rollup(spark, sf_dir):
    """Per-source corpus health: doc/token/char volume + how many of the
    source's documents exactly duplicate ANY corpus document — the
    crawl-prioritization signal (digest census ⋈ docs → source rollup)."""
    return CU.source_rollup(_t(spark, sf_dir, "documents"))


def q_corpus_sample(spark, sf_dir):
    """Seeded deterministic mixing sample: per-source keep fractions
    (src0 25%, src1 75%, default 50%) via md5(seed:doc_id) hash
    threshold — reproducible across repartitioning/corpus growth, and a
    rate increase is a superset of the old sample. Zero shuffle."""
    return CU.corpus_sample(
        _t(spark, sf_dir, "documents"),
        rates={"src0": 0.25, "src1": 0.75},
        default_rate=0.5,
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C rule): flag train-split
    docs sharing any word 8-gram with a val/test-split doc. The bench
    gram set is DISTINCT + broadcast, so the 100-TB train side never
    shuffles its grams — explode, semi-probe, and per-doc hit count all
    stay partition-local."""
    docs = _t(spark, sf_dir, "documents", par=True)
    b = CU.split_bucket(F.col("doc_id"))
    train = docs.filter(b < 9000)
    bench = docs.filter(b >= 9000)
    return CU.decontaminate(train, bench, n=8)


def q_span_scrub(spark, sf_dir):
    """Duplicated-span scrub (fixed-window approximation of Lee et al.
    2022 exact-substring dedup): drop every 20-word chunk occurring in
    ≥2 distinct docs, reassemble survivors in order. Two uniform digest
    shuffles + an anti-join against the (small) duplicated-digest set —
    no pairwise comparisons at any scale."""
    return CU.span_scrub(_t(spark, sf_dir, "documents"), w=20, min_docs=2)


def q_mix_report(spark, sf_dir):
    """Training-mix accounting: the seeded per-source sample (src0 25%,
    src1 75%, default 50%) × 90/5/5 hash split rolled up to (source,
    split) doc/token/char totals — the planning table for mixture
    weights. Zero-shuffle filter + projection into ONE map-side-
    combinable census over ≤ sources×splits keys."""
    return CU.mix_report(
        _t(spark, sf_dir, "documents"),
        rates={"src0": 0.25, "src1": 0.75},
        default_rate=0.5,
    )


def q_mix_plan(spark, sf_dir):
    """Mixture planning: target weights 3:2:1 (src0:src1:rest) → the
    per-source basis-point sampling rates that realize the mix at the
    largest one-pass size the corpus supports (bottleneck source at
    100%). DECIMAL(38,0) integral division end-to-end — float rates
    would be engine-dependent. One census shuffle + a 1-row argmin."""
    return CU.mix_plan(
        _t(spark, sf_dir, "documents"),
        weights={"src0": 3, "src1": 2},
    )


def q_incremental_dedup(spark, sf_dir):
    """Continual-crawl dedup: bucket ≥ 8000 docs act as today's
    increment, probed against the dedup_index (distinct exact digests +
    MinHash LSH band buckets) of the bucket < 8000 corpus. The corpus is
    never re-read or re-shuffled — the increment computes its own
    signatures and left-semi probes the index; cost is O(increment),
    not O(corpus)."""
    docs = _t(spark, sf_dir, "documents", par=True)
    b = CU.split_bucket(F.col("doc_id"))
    idx = DD.dedup_index(docs.filter(b < 8000))
    return DD.incremental_dedup(docs.filter(b >= 8000), idx)


def q_error_backoff(spark, sf_dir):
    """Adaptive politeness: per-host failure census (host = user_id
    mod 37, failure = every 5th event — the synthesize-the-structure
    trick) → exponential budget backoff (base 1024 halved per failure,
    shift capped at 6, floor 1). Census is one combinable shuffle; the
    backoff itself is a pure projection that feeds rank_frontier's
    host_budgets broadcast hook."""
    from distributed_crawl_spark.operators.politeness import (
        error_backoff_budgets,
    )

    ev = _t(spark, sf_dir, "events")
    failures = (
        ev.select(
            F.concat(F.lit("h"), (F.col("user_id") % 37).cast("string"))
            .alias("host"),
            (F.col("event_id") % 5 == 0).cast("long").alias("__f"),
        )
        .groupBy("host")
        .agg(F.sum("__f").alias("n_failures"))
    )
    out = error_backoff_budgets(failures, base_budget=1024)
    return out.join(
        failures.select("host", "n_failures"), "host"
    ).select("host", "n_failures", "budget")


def q_corpus_diff(spark, sf_dir):
    """Snapshot diff over two bucket-derived corpus views: buckets
    <2000 exist only in the old snapshot (removed), 2000–5999 are
    byte-identical (same), 6000–7999 get a ' v2' suffix in the new
    snapshot (changed), ≥8000 only exist in the new one (added) — all
    four statuses exercised; the oracle states them in closed form by
    bucket while the engine runs the generic digest full-outer join."""
    docs = _t(spark, sf_dir, "documents")
    b = CU.split_bucket(F.col("doc_id"))
    old = docs.filter(b < 8000).select("doc_id", "text")
    new = docs.filter(b >= 2000).select(
        "doc_id",
        F.when(
            (b >= 6000) & (b < 8000), F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return CU.corpus_diff(old, new)


def q_pack_examples(spark, sf_dir):
    """GPT-style fixed-length example packing: writer token streams cut
    into 512-token examples, docs SPLIT across boundaries (no padding
    waste) — one span row per (doc × example overlapped), all
    closed-form arithmetic over pack_shards' running offsets."""
    return CU.pack_examples(
        _t(spark, sf_dir, "documents"), seq_len=512, n_writers=8
    )


def q_url_strip_tracking(spark, sf_dir):
    """Tracking-parameter stripping on three deterministic URL shapes:
    no query at all (doc_id%3==0), mixed kept+tracking params (%3==1 —
    surviving order must be preserved), and all-tracking (%3==2 — the
    '?' disappears entirely). The oracle runs the same generic
    split/filter/rejoin in DuckDB, not a shape-special-case."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
        d.cast("string"),
    )
    url = (
        F.when(d % 3 == 0, base)
        .when(
            d % 3 == 1,
            F.concat(
                base, F.lit("?id="), d.cast("string"),
                F.lit("&utm_source=s"), (d % 7).cast("string"),
                F.lit("&page=2&gclid=g"), d.cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                base, F.lit("?utm_campaign=c&fbclid=f"), d.cast("string")
            )
        )
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        U.strip_tracking_params(url).alias("clean_url"),
    )


def q_shard_manifest(spark, sf_dir):
    """Shard integrity manifest: doc/token totals + a commutative
    (order-free) content digest per planned training shard — the
    reproducibility artifact shipped with a packed corpus. One id join
    + one combinable shard rollup over the pack_shards plan."""
    return CU.shard_manifest(
        _t(spark, sf_dir, "documents"), shard_tokens=2048, n_writers=8
    )


def q_pack_shards(spark, sf_dir):
    """Deterministic shuffle + token-budget shard planning: seeded hash
    routes each doc to one of 8 writer lanes (uniform — no skew
    possible), each lane independently orders by the same hash and packs
    a 2048-token running budget. One uniform shuffle + per-lane sort;
    lane size is set by the writer count, not by any data property."""
    return CU.pack_shards(
        _t(spark, sf_dir, "documents"), shard_tokens=2048, n_writers=8
    )


def q_train_corpus_full(spark, sf_dir):
    """The whole curation pipeline as ONE plan — per train-split doc,
    every gate's verdict side by side: MinHash-LSH near-dup canonical
    pick, the full Gopher bounds, the per-source quality-median gate,
    benchmark decontamination (vs the val/test split), and the
    self-trained unigram-LM fluency cut (model fit on the train split
    only — eval text never shapes the model; fixed integer threshold
    ≈ the corpus p10 so the contract stays engine-exact where a
    percentile_approx sketch would not be), plus the conjunction. This
    is curate.py's flag stage expressed as a contract query: five
    independent gate families, each scale-shaped as audited
    individually, sharing one scan of the corpus."""
    docs = _t(spark, sf_dir, "documents", par=True)
    b = CU.split_bucket(F.col("doc_id"))
    train = docs.filter(b < 9000)
    bench = docs.filter(b >= 9000)
    comp = DD.near_dup_components(DD.minhash_lsh_pairs(train))
    nd_drop = comp.filter(F.col("component_id") != F.col("doc_id")).select(
        "doc_id", F.lit(True).alias("__nd")
    )
    feats = TS.gopher_features(
        F.col("text"), stopwords=sorted(["a", *TS.LANG_MARKERS["en"]])
    )
    qg = CU.quality_quantile_gate(train, p=0.5).select(
        "doc_id", F.col("keep").alias("keep_quantile")
    )
    dec = CU.decontaminate(train, bench, n=8).select(
        "doc_id", (~F.col("contaminated")).alias("keep_decontam")
    )
    lm = TS.unigram_logprob(train).select(
        "doc_id",
        (F.col("logprob_q") >= F.lit(-3_410_000)).alias("keep_lm"),
    )
    return (
        train.select("doc_id", TS.gopher_keep(feats).alias("keep_gopher"))
        .join(nd_drop, "doc_id", "left")
        .withColumn("keep_canonical", F.col("__nd").isNull())
        .drop("__nd")
        .join(qg, "doc_id")
        .join(dec, "doc_id")
        .join(lm, "doc_id")
        .withColumn(
            "keep",
            F.col("keep_canonical") & F.col("keep_gopher")
            & F.col("keep_quantile") & F.col("keep_decontam")
            & F.col("keep_lm"),
        )
    )


def q_top_ngrams(spark, sf_dir):
    """Per-source heavy-hitter trigrams ranked by document reach — the
    boilerplate census. One combinable (source, gram) shuffle; the
    per-source top-k window gets a map-side partial WindowGroupLimit
    from Catalyst (same measured property as source_cap)."""
    return CU.top_ngrams(_t(spark, sf_dir, "documents", par=True), n=3, k=10)


def q_doc_keywords(spark, sf_dir):
    """Per-doc top-5 TF-IDF keywords (integer-quantized idf, exact
    BIGINT scores — float tf-idf could never hash-match an oracle).
    Two combinable censuses + one token join (AQE-splittable skew) +
    a WindowGroupLimit'd per-doc top-k."""
    return TS.doc_keywords(_t(spark, sf_dir, "documents"), k=5)


def q_normalize_nfc(spark, sf_dir):
    """Unicode NFC normalization (UAX #15 canonical composition) — the
    first step of real web-text cleaning. The ASCII corpus is already
    NFC, so decomposed sequences are planted deterministically
    (synthesize-the-structure trick, same as multimodal/markdown):
    doc_id%3 copies of e+COMBINING-ACUTE and doc_id%2 of o+COMBINING-
    DIAERESIS — both engines then do real composition work on 5/6 of
    the rows and must agree byte-for-byte."""
    from distributed_crawl_spark.functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" "),
            F.expr("repeat('e\u0301', pmod(doc_id, 3))"),
            F.expr("repeat('o\u0308', pmod(doc_id, 2))"),
        ).alias("text"),
    )
    return normalize_text(planted)


def q_url_trap_filter(spark, sf_dir):
    """Crawl-trap detection (Mercator frontier hygiene): per-URL repeated-
    segment / depth / param-count / path-length signals + the is_trap
    predicate. Trap-shaped URLs are synthesized deterministically from
    documents (repeated '/sec/cal' runs scaled by doc_id%6, param tails
    by doc_id%12 on every third doc) so both engines evaluate real
    calendar-trap and param-explosion cases. Pure projection — array
    HOFs bounded by each URL's own segment count, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org"),
        F.expr("repeat('/sec/cal', pmod(doc_id, 6))"),
        F.lit("/page"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("?a=1"),
                     F.expr("repeat('&b=2', pmod(doc_id, 12))")),
        ).otherwise(F.lit("")),
    )
    planted = docs.select("doc_id", url.alias("url"))
    f = U.trap_features(F.col("url"))
    return planted.select(
        "doc_id",
        f["path_depth"].alias("path_depth"),
        f["max_seg_repeat"].alias("max_seg_repeat"),
        f["n_params"].alias("n_params"),
        f["path_len"].alias("path_len"),
        U.is_trap(F.col("url")).alias("trap"),
    )


def q_canonical_dedup(spark, sf_dir):
    """Canonical-URL dedup groups: pages synthesized in groups of 3
    (doc_id%3==1 declares an absolute <link rel=canonical>, ==2 a
    RELATIVE one — exercising the UDF's absolutization — and ==0 none,
    i.e. self-canonical). The Spark side REALLY parses the html through
    the with_meta extract struct; the oracle knows the planted structure
    in closed form."""
    from distributed_crawl_spark.functions.text import make_extract_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    g = (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(3))).cast("string")
    link = (
        F.when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit('<link rel="canonical" href="https://canon.test/d/'),
                     g, F.lit('">')),
        )
        .when(
            F.col("doc_id") % 3 == 2,
            F.concat(F.lit('<link rel="canonical" href="/d/'), g,
                     F.lit('"/>')),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(F.lit("<html><head>"), link,
                    F.lit("</head><body>x</body></html>"))
    pages = docs.select(
        F.concat(F.lit("https://canon.test/d/"), did).alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )
    extract = make_extract_udf(max_links=0, with_meta=True)
    parsed = pages.select(
        "url",
        extract(F.col("url"), F.col("html")).alias("ex"),
    ).select("url", F.col("ex.canonical_url").alias("canonical_url"))
    return DD.canonical_groups(parsed)


def q_sitemap_parse(spark, sf_dir):
    """Sitemap XML → crawl entries, 100% JVM-side (decode + regexp +
    posexplode — no UDF). Sitemap bodies are synthesized
    deterministically from documents (every 10th doc is a
    <sitemapindex> of 3 child sitemaps, the rest <urlset>s of
    doc_id%7+1 page locs, with whitespace padding inside <loc> to
    exercise the protocol's trim)."""
    from distributed_crawl_spark.operators.robots import sitemap_entries

    docs = _t(spark, sf_dir, "documents")
    base = F.concat(F.lit("https://"), F.col("source"),
                    F.lit(".example.org"))
    n = (F.col("doc_id") % 7 + 1).cast("int")
    urlset = F.concat(
        F.lit("<urlset>"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat(
                    F.lit("<loc> "), base, F.lit("/d/"),
                    F.col("doc_id").cast("string"), F.lit("/"),
                    i.cast("string"), F.lit(" </loc>"),
                ),
            ),
            "",
        ),
        F.lit("</urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex>"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda i: F.concat(
                    F.lit("<loc>"), base, F.lit("/sitemap-"),
                    F.col("doc_id").cast("string"), F.lit("-"),
                    i.cast("string"), F.lit(".xml</loc>"),
                ),
            ),
            "",
        ),
        F.lit("</sitemapindex>"),
    )
    xml = F.when(F.col("doc_id") % 10 == 0, index).otherwise(urlset)
    pages = docs.select(
        F.concat(base, F.lit("/sitemap-"),
                 F.col("doc_id").cast("string"), F.lit(".xml"))
        .alias("url"),
        F.encode(xml, "utf-8").alias("html"),
    )
    return sitemap_entries(pages)


def q_sitemap_lastmod(spark, sf_dir):
    """Full <url>-block sitemap parse (lastmod + priority recrawl
    hints): doc_id%7+1 entries per synthesized urlset; entry i carries
    lastmod 2024-01-<(doc_id+i)%28+1> unless (doc_id+i)%3==0 and
    priority 0.<i%10> unless (doc_id+i)%4==0 — both absence patterns
    and the date/priority quantization are exercised. JVM-side DOTALL
    block regexp + posexplode, scan-speed."""
    from distributed_crawl_spark.operators.robots import sitemap_url_entries

    docs = _t(spark, sf_dir, "documents", par=True)
    d = F.col("doc_id")
    base = F.concat(F.lit("https://"), F.col("source"),
                    F.lit(".example.org"))
    n = (d % 7 + 1).cast("int")
    block = lambda i: F.concat(  # noqa: E731
        F.lit("<url><loc> "), base, F.lit("/d/"), d.cast("string"),
        F.lit("/"), i.cast("string"), F.lit(" </loc>"),
        F.when((d + i) % 3 != 0, F.concat(
            F.lit("<lastmod>2024-01-"),
            F.lpad(((d + i) % 28 + 1).cast("string"), 2, "0"),
            F.lit("</lastmod>"))).otherwise(F.lit("")),
        F.when((d + i) % 4 != 0, F.concat(
            F.lit("<priority>0."), (i % 10).cast("string"),
            F.lit("</priority>"))).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    xml = F.concat(
        F.lit("<urlset>\n"),
        F.array_join(F.transform(F.sequence(F.lit(1), n), block), "\n"),
        F.lit("\n</urlset>"),
    )
    pages = docs.select(
        F.concat(base, F.lit("/sitemap-"), d.cast("string"),
                 F.lit(".xml")).alias("url"),
        F.encode(xml, "utf-8").alias("html"),
    )
    return sitemap_url_entries(pages)


def q_dedup_doc_lines(spark, sf_dir):
    """Within-doc duplicate-line removal (C4-style cleaner). The
    synthetic corpus has no newlines, so the query first reshapes each
    text into one-word-per-line (same trick as multimodal/markdown:
    synthesize the structure deterministically so the oracle sees real
    dedup work), then drops repeated lines keeping first occurrence.
    Zero shuffle — pure array projection at scan speed."""
    docs = _t(spark, sf_dir, "documents")
    lined = F.array_join(F.split(F.trim(F.col("text")), r"\s+"), "\n")
    lines = F.split(lined, "\n")
    return docs.select(
        "doc_id",
        TS.dedup_lines(lined).alias("clean_text"),
        (F.size(lines) - F.size(F.array_distinct(lines)))
        .cast("long").alias("n_removed"),
    )


def q_dedup_lines_global(spark, sf_dir):
    """CROSS-document keep-first line dedup (CCNet/RefinedWeb line
    filter): a line duplicated across documents survives only at its
    lexicographically-first (doc_id, pos) occurrence. The corpus has no
    newlines, so texts are reshaped into 8-word lines first (the
    synthesize-the-structure trick) — duplicated texts then share every
    line, and the planted exact-dup docs exercise real cross-doc
    removal. Three uniform digest/doc-keyed shuffles; the winner census
    is map-side combinable (see dedup.global_line_dedup)."""
    docs = _t(spark, sf_dir, "documents", par=True)
    lined = F.array_join(
        F.transform(CU.span_chunks(F.col("text"), 8), lambda s: s.chunk),
        "\n",
    )
    return DD.global_line_dedup(
        docs.select("doc_id", lined.alias("text"))
    )


def q_quality_quantile_gate(spark, sf_dir):
    """Adaptive per-source quality gate: keep docs at/above their own
    source's median integer quality. Exact percentile is scale-safe
    here (bounded score domain -> bounded partial-agg maps); thresholds
    broadcast back — no window, no per-source sort."""
    return CU.quality_quantile_gate(_t(spark, sf_dir, "documents"), p=0.5)


def q_host_rank(spark, sf_dir):
    """Host-graph PageRank for frontier prioritization: a deterministic
    37-host multigraph synthesized from documents (src = doc_id mod 37,
    dst = hash mod 37 — same synthesize-the-structure trick as
    multimodal/markdown), ranked by 3 integer-quantized power
    iterations. Integer micro-unit arithmetic makes the result
    bit-identical across engines and layouts — float PageRank is
    summation-order-dependent and could never hash-match an oracle."""
    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string"))
        .alias("src"),
        F.concat(
            F.lit("h"),
            (DD.md5_int48(F.col("doc_id").cast("string")) % 37)
            .cast("string"),
        ).alias("dst"),
    )
    return GR.host_rank(edges, iters=3)


def _host_rank_sql(iters: int = 3) -> str:
    """DuckDB twin of q_host_rank: the power iteration unrolled as one
    chained CTE per step (all-integer arithmetic, so it hash-matches)."""
    s = f"""
        WITH e AS (
          SELECT 'h' || (doc_id % 37)::VARCHAR AS src,
                 'h' || ({_MD5I48.format(x="doc_id::VARCHAR")} % 37)::VARCHAR
                   AS dst
          FROM documents
        ),
        nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
        od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS pr FROM nodes),"""
    for i in range(iters):
        s += f"""
        c{i} AS (
          SELECT e.dst, CAST(sum(r{i}.pr // od.outdeg) AS BIGINT) AS s
          FROM e JOIN od USING (src) JOIN r{i} ON r{i}.host = e.src
          GROUP BY e.dst
        ),
        r{i + 1} AS (
          SELECT nodes.host,
                 CAST(150000 + (850 * COALESCE(c{i}.s, 0)) // 1000 AS BIGINT)
                   AS pr
          FROM nodes LEFT JOIN c{i} ON c{i}.dst = nodes.host
        ),"""
    return s.rstrip(",") + f"""
        SELECT host, pr AS pr_x1e6 FROM r{iters}"""


def _label_communities_sql(iters: int = 4) -> str:
    """DuckDB twin of q_host_communities: synchronous self-inclusive
    label propagation unrolled one CTE pair (census incl. the self
    vote, mode pick) per iteration — the mode is the same (count DESC,
    label ASC) row_number pick Spark runs, so string labels hash-match
    exactly."""
    md5i = _MD5I48.format(x="doc_id::VARCHAR")
    md5ix = _MD5I48.format(x="'x' || doc_id::VARCHAR")
    s = f"""
        WITH e0 AS (
          SELECT 'h' || (doc_id % 40)::VARCHAR AS src,
                 'h' || (((doc_id % 40) - (doc_id % 40) % 5)
                         + {md5i} % 5)::VARCHAR AS dst
          FROM documents
          UNION ALL
          SELECT 'h' || (doc_id % 40)::VARCHAR,
                 'h' || ({md5ix} % 40)::VARCHAR
          FROM documents WHERE doc_id % 31 = 0
        ),
        u AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e0 WHERE src != dst
            UNION ALL
            SELECT dst, src FROM e0 WHERE src != dst)
        ),
        nodes AS (SELECT src AS host FROM e0 UNION SELECT dst FROM e0),
        l0 AS (SELECT host, host AS community FROM nodes),"""
    for i in range(iters):
        s += f"""
        c{i} AS (
          SELECT host, community, count(*) AS n FROM (
            SELECT u.src AS host, l{i}.community
            FROM u JOIN l{i} ON l{i}.host = u.dst
            UNION ALL
            SELECT host, community FROM l{i}
          ) GROUP BY 1, 2
        ),
        l{i + 1} AS (
          SELECT host, community FROM (
            SELECT host, community,
                   row_number() OVER (PARTITION BY host
                                      ORDER BY n DESC, community) AS rn
            FROM c{i}) WHERE rn = 1
        ),"""
    return s.rstrip(",") + f"""
        SELECT host, community FROM l{iters}"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events stream (30-min
    inactivity): one user-keyed window carries both the lag gap test
    and the running session counter — single sort, single exchange."""
    return EV.sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


def q_session_stats(spark, sf_dir):
    """Per-session rollup (count/start/end/duration) over sessionize —
    the follow-on groupBy keys on session_id, finer than user_id, so
    it is strictly better-distributed than the window that made it."""
    return EV.session_stats(_t(spark, sf_dir, "events"), gap_minutes=30)


# shared sessionization CTE prefix (30-min gap, (ts, event_id) ordering)
# for the sessionize / session_stats oracles
_SESSIONIZE_SQL = """
            WITH s AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR date_diff('second', lag(ts) OVER w, ts) > 1800
                          THEN 1 ELSE 0 END AS st
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            x AS (
              SELECT event_id, user_id, ts, st,
                     CAST(SUM(st) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS seq
              FROM s
            )"""


def q_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: binary payload → mapInPandas metadata extraction
    (decode stubbed deterministically; Spark-side schema/batching real)."""
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.concat(F.col("text"), F.lit("|"), F.col("doc_id").cast("string")), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
    return image_metadata(media, fake=True)


def q_image_dhash(spark, sf_dir):
    """Perceptual image dHash over the fake-decode luminance stream
    (payload bytes, documented): the Arrow batch path and the
    two-32-bit-half emission are value-checked — the oracle recomputes
    every comparison from the synthesized ascii payload."""
    from distributed_crawl_spark.operators.multimodal import image_dhash

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.concat(F.col("text"), F.lit("|"),
                          F.col("doc_id").cast("string")), "UTF-8")
        .alias("payload"),
        F.lit("image/fake").alias("mime"),
    )
    return image_dhash(media, fake=True)


def q_image_neardup(spark, sf_dir):
    """End-to-end image near-dup: perceptual dHash (mapInPandas over
    the fake-decode byte stream) → the generic 64-bit pigeonhole
    hamming-pair machinery (hamming_pairs64 — the same engine
    simhash_pairs64 uses, fed precomputed prints). Each doc emits its
    base payload AND a one-byte-edited twin (position 20 spliced) — the
    twin's hash differs in ≤2 of 64 comparisons, so every (2i, 2i+1)
    pair lands inside the hamming-3 ball; cross-doc collisions are
    verified away by bit_count. The DuckDB oracle recomputes both the
    hashes and the full pair verify."""
    from distributed_crawl_spark.functions.dedup import hamming_pairs64
    from distributed_crawl_spark.operators.multimodal import image_dhash

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = F.concat(F.col("text"), F.lit("|"), d.cast("string"))
    twin = F.concat(F.substring(s, 1, 20), F.lit("~"),
                    F.substring(s, 22, 1 << 20))
    row = lambda i, v: F.struct(  # noqa: E731
        (d * 2 + i).alias("media_id"), v.alias("s"))
    media = docs.select(
        F.explode(F.array(row(0, s), row(1, twin))).alias("r")
    ).select(
        F.col("r.media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("r.s"), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
    )
    return hamming_pairs64(image_dhash(media, fake=True),
                           id_col="media_id",
                           hi_col="dhash_hi", lo_col="dhash_lo")


def q_audio_chunks(spark, sf_dir):
    """Audio plumbing end-to-end: binary payloads → mapInPandas
    audio_metadata (deterministic fake decode: sr/samples/channels from
    payload length) → closed-form ASR chunk plan (25 ms windows, last
    chunk ragged). The oracle recomputes the whole chain from the
    synthesized payload length, so the Arrow batch path AND the chunk
    arithmetic are value-checked."""
    from distributed_crawl_spark.operators.multimodal import (
        audio_chunk_plan,
        audio_metadata,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode(
            F.concat(F.col("text"), F.lit("|"), F.col("doc_id").cast("string")),
            "UTF-8",
        ).alias("payload"),
        F.lit("audio/wav").alias("mime"),
    )
    return audio_chunk_plan(audio_metadata(media, fake=True), chunk_ms=25)


def q_surt_key(spark, sf_dir):
    """SURT index keys (web-archive canonical sort key; CDX field 1) on
    deliberately messy synthesized URLs — mixed-case scheme/host/path,
    a leading WWW. (doc_id%3==0), an explicit :8080 port (%5==0), a
    query whose param order must survive verbatim (%4==0), and a
    fragment to drop (%6==0). The oracle states the expected key in
    closed form from the same (source, doc_id) recipe. Zero shuffle —
    pure codegen regex/split/reverse projections."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("http://")),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.org"),
        F.when(d % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/D/"),
        (d % 7).cast("string"),
        F.lit("/Page-"),
        d.cast("string"),
        F.when(d % 4 == 0, F.lit("?B=2&a=1")).otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit("#Sec")).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id", url.alias("url"), U.surt_key(url).alias("surt")
    )


def q_fix_mojibake(spark, sf_dir):
    """ftfy-style mojibake repair: every document gets a known non-ASCII
    tail (' café — ' + doc_id%3 Cyrillic 'я's), the whole
    string is mangled by the sloppy-cp1252 corrupter (the exact
    UTF-8-read-as-windows-1252 error legacy pipelines produce), and the
    repair UDF must recover the original byte-for-byte — the oracle
    states the clean form in closed form. Two Arrow crossings, zero
    shuffle; the repaired column hash-matching DuckDB proves the
    corrupt→repair round trip is the identity."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.lit(" café — "),
        F.repeat(F.lit("я"), (d % 3).cast("int")),
    )
    mangled = T.mojibake_text_udf(planted)
    return docs.select(
        "doc_id",
        T.fix_mojibake_udf(mangled).alias("fixed"),
        (T.fix_mojibake_udf(mangled) != mangled).alias("was_mangled"),
    )


def q_boilerplate_lines(spark, sf_dir):
    """Host-scoped boilerplate removal (CCNet/trafilatura chrome
    filter): every doc gets a per-source nav header (in 100% of the
    host's docs → removed everywhere), unique 8-word body lines (kept),
    and a 'Promo day' line on even doc_ids (≈50% of each host's docs —
    sits exactly on the frac=0.5 boundary, so odd-sized hosts keep it
    and even-sized hosts drop it; both engines must agree from the same
    census). All shuffles uniform; host totals broadcast."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    lined = F.concat(
        F.lit("Home | About | "), F.col("source"), F.lit("\n"),
        F.array_join(
            F.transform(CU.span_chunks(F.col("text"), 8), lambda s: s.chunk),
            "\n",
        ),
        F.when(d % 2 == 0, F.lit("\nPromo day")).otherwise(F.lit("")),
    )
    return DD.host_boilerplate(
        docs.select("doc_id", "source", lined.alias("text"))
    )


def q_quality_classifier(spark, sf_dir):
    """Hashed-linear-classifier quality gate (DCLM/fineweb-edu model
    step) with deterministic stub weights: bucket = md5_48(token) mod
    2^16, weight = Knuth-mix milli-units in [-1000,1000], keep iff the
    integer mean comparison score_int >= thr_milli·n_tokens. Zero shuffle —
    one closed-form aggregate per doc; the trained-weights path (same
    results via explode + broadcast weight join) is pytest-verified."""
    return TS.quality_classifier(_t(spark, sf_dir, "documents"))


def q_c4_clean(spark, sf_dir):
    """C4 (Raffel et al. 2020) line+doc rules on synthesized structure:
    8-word lines get terminal punctuation by (pos+doc_id)%4 (one in four
    lines has none → removed), planted javascript/cookie-banner lines
    (%5/%11), a code line with '{' (%13 — line loses terminal punct AND
    the doc fails the brace rule), and a lorem-ipsum sentence (%17 —
    line itself is clean, only the DOC gate trips, separating the two
    rule tiers). Zero shuffle — split → HOF filter → rejoin, all
    codegen; DuckDB runs the same lambda."""
    docs = _t(spark, sf_dir, "documents", par=True)
    d = F.col("doc_id")
    chunks = F.transform(
        CU.span_chunks(F.col("text"), 8),
        lambda s: F.concat(
            s.chunk,
            F.when((s.pos + d) % 4 == 0, F.lit("."))
            .when((s.pos + d) % 4 == 1, F.lit("!"))
            .when((s.pos + d) % 4 == 2, F.lit('?"'))
            .otherwise(F.lit("")),
        ),
    )
    lined = F.concat(
        F.array_join(chunks, "\n"),
        F.when(d % 5 == 0,
               F.lit("\nplease enable javascript to continue."))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0,
               F.lit("\nthis site uses cookies for analytics."))
        .otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit("\nif (x) { return; }"))
        .otherwise(F.lit("")),
        F.when(d % 17 == 0,
               F.lit("\nLorem ipsum dolor sit amet, consectetur "
                     "adipiscing elit."))
        .otherwise(F.lit("")),
    )
    return CU.c4_clean(docs.select("doc_id", lined.alias("text")))


def q_recrawl_priority(spark, sf_dir):
    """Adaptive recrawl scheduling (functions/recrawl.py): Poisson
    change-rate estimation + staleness priority over a revisit log —
    the signal a CONTINUOUS crawler ranks its re-fetch frontier by (the
    reference crawls each URL once per session, webcrawleranalyzer.py's
    single visited set; this is the incremental-crawler extension,
    Cho & Garcia-Molina VLDB'00). The visit log is synthesized from
    events: page = user_id mod 40, visit ts = event ts, content digest
    = event_type (revisits where the type flips count as changes).
    Integer-quantized λ (x1e9) and p_stale (x1e6), so the result
    hash-matches the oracle."""
    ev = _t(spark, sf_dir, "events")
    visits = ev.select(
        F.concat(F.lit("p"), (F.col("user_id") % 40).cast("string"))
        .alias("page"),
        F.col("ts"),
        F.col("event_type").alias("digest"),
        "event_id",
    )
    return RC.recrawl_priority(visits, order_col="event_id")


def q_bm25_search(spark, sf_dir):
    """Inverted-index BM25 top-k (functions/search.py): the corpus
    retrieval surface — postings census + floor-quantized IDF + fully
    integer TF normalization (k1 = 6/5, b = 3/4 chosen so the BM25
    denominator clears to one bigint div), global top-20 for a
    3-term query via TakeOrdered."""
    docs = _t(spark, sf_dir, "documents")
    return SE.bm25_topk(docs, ["join", "vector", "stream"], k=20)


def q_bm25_index_search(spark, sf_dir):
    """Persisted inverted-index round trip (functions/search.py): build
    the BM25 text index into /tmp (postings PARTITIONED BY term hash
    bucket — the partition layout IS the inverted file), READ IT BACK,
    and search the same 3-term query against the loaded tables with the
    scan pruned to the query terms' buckets. The persisted layout is a
    pass-through, so the result equals bm25_topk computed directly —
    the oracle scores the corpus in place."""
    import re as _re

    docs = _t(spark, sf_dir, "documents", par=True)
    tag = _re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.rstrip("/"))
    path = f"/tmp/textindex_contract_{tag}_{__import__('os').getpid()}"  # pid-unique: concurrent harnesses must not race one index dir
    SE.write_text_index(docs, path)
    idx = SE.read_text_index(spark, path)
    return SE.text_index_topk(idx, ["join", "vector", "stream"], k=20)


def q_source_entropy(spark, sf_dir):
    """Per-language source-diversity census (curation.source_entropy):
    integer-quantized Shannon entropy of the source mix per language —
    the memorization-risk diagnostic a mix planner reads next to
    mix_report. Census groupBy (≤ langs×sources keys, map-side
    combinable) + broadcast per-lang rollup; every exchange is
    census-sized at any corpus scale."""
    return CU.source_entropy(_t(spark, sf_dir, "documents"))


def q_source_similarity(spark, sf_dir):
    """Source-vocabulary redundancy matrix (curation.source_similarity):
    exact pairwise Jaccard between each source's distinct word-3-gram
    vocabulary — the mix planner's diversity-discount input next to
    source_entropy. Posting-list plan with the list bounded by |sources|
    by construction (collect_set dedups map-side), so the one shingle
    shuffle is the only corpus-sized exchange at any scale."""
    return CU.source_similarity(_t(spark, sf_dir, "documents", par=True))


def q_dup_rate_by_source(spark, sf_dir):
    """Per-source near-duplication rate (curation.dup_rate_by_source
    over the simhash64→components chain): the basis-point fraction of
    each source's docs a keep-one dedup would drop — the health number
    that discounts a source's raw token count in mix planning. One
    doc-id join (components is pair-output-bound) + a |sources|-bounded
    census."""
    docs = _t(spark, sf_dir, "documents", par=True)
    comp = DD.near_dup_components(
        DD.simhash_pairs64(docs, max_hamming=3)
    )
    return CU.dup_rate_by_source(docs, comp)


def q_decontaminate_semantic(spark, sf_dir):
    """Semantic benchmark decontamination (curation.decontaminate_semantic):
    flag corpus vectors whose best cosine against ANY benchmark vector
    reaches 0.35 — the paraphrase-leak complement of the 8-gram
    `decontaminate` rule. Bench split is modular (vec_id % 10 == 0) so it
    is non-empty at every sf. The bench suite collapses to ONE
    collect_list row and broadcasts; the corpus side computes |bench|
    codegen'd dot products per row (transform + array_max over the
    broadcast array) with ZERO exchanges — the bounded 1-row
    broadcast-nested-loop pattern mix_plan already uses. Scores quantize
    to cosine milli-units BEFORE the argmax; ties pick the smallest
    bench id."""
    emb = _t(spark, sf_dir, "embeddings", par=True)
    return CU.decontaminate_semantic(
        emb.filter(F.col("vec_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
        threshold_m=350,
    )


def q_bigram_logprob(spark, sf_dir):
    """Interpolated-bigram LM quality score (textstats.bigram_logprob):
    one rung up the CCNet ladder from unigram_logprob — word-order
    sensitive fluency, Lidstone-interpolated with unigram backoff,
    per-pair log-prob evaluated by one double expression written
    identically in both engines and floor-quantized."""
    return TS.bigram_logprob(_t(spark, sf_dir, "documents", par=True))


def q_hits_scores(spark, sf_dir):
    """HITS hubs/authorities (graph.hits_scores) over the same
    deterministic 37-host multigraph as host_rank — the second
    link-graph signal a frontier scheduler uses (hubs drive discovery,
    authorities drive corpus value). Two max-renormalized integer
    power iterations; bit-identical to the unrolled-CTE oracle."""
    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string"))
        .alias("src"),
        F.concat(
            F.lit("h"),
            (DD.md5_int48(F.col("doc_id").cast("string")) % 37)
            .cast("string"),
        ).alias("dst"),
    )
    return GR.hits_scores(edges, iters=2)


def q_mix_temperature(spark, sf_dir):
    """Temperature-scaled mixture planning (curation.mix_temperature,
    α = 0.3): the mT5/XLM-R sampling standard p_s ∝ t_s^α — small
    sources upweighted, the smallest source IS the bottleneck and
    samples at 100%. One float (the per-source floor(t^α·1e6)
    quantization), then DECIMAL(38,0) integral division end-to-end;
    census + two 1-row broadcasts, no exchange above |sources| rows."""
    return CU.mix_temperature(
        _t(spark, sf_dir, "documents"), alpha_bp=3000
    )


def q_quality_drift(spark, sf_dir):
    """Snapshot-over-snapshot quality-distribution PSI
    (curation.quality_drift): old = split buckets < 8000, new =
    buckets ≥ 2000 with the 6000–7999 band's text DOUBLED — a planted
    length-distribution shift, so high length bands gain mass and the
    per-bucket PSI terms are non-trivial. Buckets are length deciles
    min(len/50, 9). Two |bucket|-row censuses + a 1-row totals
    broadcast; one-sided buckets report NULL psi with counts visible
    (no epsilon smoothing)."""
    docs = _t(spark, sf_dir, "documents")
    b = CU.split_bucket(F.col("doc_id"))
    old = docs.filter(b < 8000).select(
        F.least(
            F.floor(F.length("text") / 50).cast("long"),
            F.lit(9).cast("bigint"),
        ).alias("bucket")
    )
    new = docs.filter(b >= 2000).select(
        F.when(
            (b >= 6000) & (b < 8000),
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        ).otherwise(F.col("text")).alias("text")
    ).select(
        F.least(
            F.floor(F.length("text") / 50).cast("long"),
            F.lit(9).cast("bigint"),
        ).alias("bucket")
    )
    return CU.quality_drift(old, new)


def q_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (curation.chunk_documents,
    win=32 stride=24): the prep step between a curated corpus and
    context-window training / retrieval indexing. Chunk c covers tokens
    [24c, 24c+32); a start survives only while it adds tokens beyond
    its predecessor (start < n - win + stride), so the tail chunk may
    be short but is never redundant. Pure projection + explode — zero
    shuffle at any corpus size."""
    return CU.chunk_documents(
        _t(spark, sf_dir, "documents"), win=32, stride=24
    )


def q_blocklist_mine(spark, sf_dir):
    """Blocklist candidate mining (curation.blocklist_mine over the
    Gopher gate): per-source fail-rate census — sources whose
    gate-failure rate ≥ 52% on ≥ 20 docs are promoted to blocklist
    candidates, which is how UT1/FineWeb-style domain blocklists are
    grown from corpus evidence. Gate is a zero-shuffle projection; the
    only exchange is the |sources|-bounded census groupBy."""
    docs = _t(spark, sf_dir, "documents", par=True)
    feats = TS.gopher_features(
        F.col("text"), stopwords=sorted(["a", *TS.LANG_MARKERS["en"]])
    )
    return CU.blocklist_mine(
        docs, TS.gopher_keep(feats), min_docs=20, min_fail_bp=5200
    )


def q_importance_sample(spark, sf_dir):
    """Quality-weighted downsampling (curation.importance_sample over
    quality_score_int, 10 rank-deciles, linear ramp alpha=1.0, 500 bp
    floor): bucket b keeps 500 + floor(9500·(b+1)/10) basis points via
    the same seeded hash threshold as corpus_sample — the DCLM-style
    quality axis next to mix_temperature's source axis. The linear
    ramp keeps the oracle bit-exact (pow(x,1)=x is exact IEEE; the
    remaining ops are correctly-rounded mul/div, identical across
    engines). Distinct-score census + broadcast bucket map +
    zero-shuffle hash filter."""
    docs = _t(spark, sf_dir, "documents", par=True)
    return CU.importance_sample(
        docs, TS.quality_score_int(F.col("text")),
        n_buckets=10, alpha_bp=10000, floor_bp=500,
    )


def q_robots_audit(spark, sf_dir):
    """Robots-compliance audit (robots.robots_audit): per-host count of
    FETCHED urls the host's robots.txt disallowed — the post-hoc twin
    of the pre-fetch gate; >0 names a gate bypass. Fixture: every host
    except src0 (absent from robots → allowed-all fallback) publishes
    'Disallow: /d/3/', so urls with doc_id%5==3 are violations; Spark
    runs the REAL robotparser (Arrow-batched) while the oracle mirrors
    the planted rule's prefix semantics — the query cross-validates
    robotparser on prefix rules. One broadcast join + |hosts| census."""
    docs = _t(spark, sf_dir, "documents")
    url = _doc_url_col()
    fetched = docs.select(
        U.url_host(url).alias("host"), url.alias("url")
    )
    robots = (
        fetched.select("host").distinct()
        .filter(F.col("host") != "src0.example.org")
        .withColumn(
            "robots_txt",
            F.lit("User-agent: *\nDisallow: /d/3/"),
        )
    )
    return RO.robots_audit(fetched, robots)


def q_dedup_cluster_stats(spark, sf_dir):
    """Near-dup cluster-size census (dedup.cluster_stats over the
    simhash64→components chain): n_clusters and corpus mass per
    cluster size, plus the singleton row (docs in no component) so
    n_docs sums to the corpus — the first table of every dedup report
    (is one template dominating, or is it a size-2 tail?). Component
    census is output-bound like the pair set; the singleton row is two
    1-row aggregates joined lazily."""
    docs = _t(spark, sf_dir, "documents", par=True)
    comp = DD.near_dup_components(
        DD.simhash_pairs64(docs, max_hamming=3)
    )
    return DD.cluster_stats(comp, docs)


def q_sitemap_coverage(spark, sf_dir):
    """Sitemap-vs-crawl coverage audit (robots.sitemap_coverage):
    per-host declared-vs-fetched census — coverage basis points over
    the sitemap set and the unlisted-fetched count (stale/ignored
    sitemaps vs off-map discovery). Fixture: sitemap lists doc_id%2==0
    URLs, the crawl fetched doc_id%3!=0 URLs, so every host has both
    misses and unlisted fetches. Two url-keyed distincts + co-
    partitioned SEMI/ANTI joins + |hosts| censuses."""
    docs = _t(spark, sf_dir, "documents")
    url = _doc_url_col()
    host = U.url_host(url)
    sitemap = docs.filter(F.col("doc_id") % 2 == 0).select(
        host.alias("host"), url.alias("url")
    )
    fetched = docs.filter(F.col("doc_id") % 3 != 0).select(
        host.alias("host"), url.alias("url")
    )
    return RO.sitemap_coverage(sitemap, fetched)


def q_drain_plan(spark, sf_dir):
    """Frontier drain forecast (politeness.drain_plan): queued-URL
    census per host ÷ per-host politeness budget → ceil-division
    rounds-to-drain, sorted worst-first — the crawl-horizon bound that
    executor count cannot move. Hosts = the synthetic URL space;
    budgets = 1 + md5int48(host) % 4 (hash-portable), with one host
    deliberately absent to exercise the default_budget fallback. One
    census + |hosts|-keyed join; zero corpus-sized exchange after the
    census."""
    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        U.url_host(_doc_url_col()).alias("host")
    )
    budgets = (
        frontier.distinct()
        .filter(F.col("host") != "src0.example.org")
        .select(
            "host",
            (F.lit(1) + F.pmod(DD.md5_int48(F.col("host")), F.lit(4)))
            .cast("long").alias("budget"),
        )
    )
    return PO.drain_plan(frontier, budgets, default_budget=2)


def q_gate_agreement(spark, sf_dir):
    """Gate confusion census (curation.gate_agreement): verdict-cell
    counts + basis-point share for {Gopher keep, quality_score_int ≥
    57000 (the corpus median), lang_id == labeled lang} — the tuning
    diagnostic that shows which mass two gates disagree on before one
    replaces or conjoins the other. All gates evaluate in one
    zero-shuffle projection; census ≤ 2³ cells; share via 1-row
    broadcast total."""
    docs = _t(spark, sf_dir, "documents", par=True)
    t = F.col("text")
    feats = TS.gopher_features(
        t, stopwords=sorted(["a", *TS.LANG_MARKERS["en"]])
    )
    return CU.gate_agreement(docs, {
        "keep_gopher": TS.gopher_keep(feats),
        "keep_quality": TS.quality_score_int(t) >= 57000,
        "lang_ok": TS.lang_id(t) == F.col("lang"),
    })


def q_politeness_audit(spark, sf_dir):
    """Politeness-compliance audit (politeness.politeness_audit over
    the events log as a fetch log, host = 'h'||user_id%16, delay
    1800 s): per-host inter-fetch gap census vs the delay the crawler
    was configured to honor — the operational close of the W1 loop
    (planned politeness vs observed fetch behaviour). ONE host-keyed
    window exchange (lag with seq tie-break) + a map-side census;
    sessionize's plan shape and skew story."""
    log = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 16).cast("string"))
        .alias("host"),
        "ts", "event_id",
    )
    return PO.politeness_audit(log, delay_s=1800)


def q_mirror_detect(spark, sf_dir):
    """Host-mirror detection (dedup.mirror_detect): host pairs whose
    distinct-content overlap (shared md5 digests, normalized by the
    SMALLER host's digest count) marks one as a partial mirror of the
    other — the above-document dedup pass that removes every future
    fetch from a mirror at once. Planted fixture: each source's docs
    live on <source>.example.org; every 5th doc is mirrored onto
    m-<source>.example.org (a true partial mirror → 10000 bp) and
    every 7th onto a shared cdn.example.org host (boilerplate decoy —
    fails the share threshold, and its cross pairs fail min_shared).
    Posting-list plan: one digest shuffle, per-digest host lists
    bounded by max_df, pair census output-bound, totals broadcast."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.concat(F.col("source"), F.lit(".example.org")).alias("host"),
        "text",
    )
    m = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.concat(F.lit("m-"), F.col("source"), F.lit(".example.org"))
        .alias("host"),
        "text",
    )
    cdn = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.lit("cdn.example.org").alias("host"), "text"
    )
    return DD.mirror_detect(
        base.unionByName(m).unionByName(cdn),
        min_shared=2, min_share_bp=2500,
    )


def q_url_template_mine(spark, sf_dir):
    """URL-template mining (url.url_template_mine): long-hex runs →
    {h}, digit runs → {n}; (host, template) census + per-host share in
    basis points (scale-free thresholds); templates owning ≥ 25% of a
    host's URLs on ≥ 5 URLs are trap/explosion candidates — the
    corpus-evidence complement of the per-URL is_trap heuristics. One
    census groupBy (bounded by distinct templates) + |hosts|-row
    broadcast rollup."""
    docs = _t(spark, sf_dir, "documents")
    return U.url_template_mine(
        docs.select(_doc_url_col().alias("url")),
        min_urls=5, min_share_bp=2500,
    )


def q_tokenizer_stats(spark, sf_dir):
    """Per-language tokenizer census (textstats.tokenizer_stats):
    UTF-8 bytes per BPE pre-token ×100 (compression) and pre-tokens
    per whitespace word ×1e4 (fertility — the cross-language
    tokenizer-fairness metric), over exact integral DIV of per-language
    sums. One zero-shuffle projection + one |langs|-bounded map-side
    combinable groupBy."""
    return TS.tokenizer_stats(_t(spark, sf_dir, "documents"))


def q_bitext_mine(spark, sf_dir):
    """Margin-based bitext mining (similarity.bitext_mine — the
    CCMatrix/WikiMatrix parallel-pair miner): mutual nearest pairs
    between two embedding shards under the Artetxe & Schwenk ratio
    margin (cosine normalized by the mean of both rows' top-k
    neighbourhood cosines), everything floor-quantized to shifted
    milli-cosines / basis-point margins so the argmaxes are
    integer-exact.  Shards split by vec_id parity so both are non-empty
    at every sf.  Four zero-corpus-exchange broadcast passes + one
    |tgt|-bounded mutual join; the scale path runs the same scorer on a
    persisted-IVF shortlist instead of the broadcast array."""
    emb = _t(spark, sf_dir, "embeddings", par=True)
    return SIM.bitext_mine(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4, threshold_bp=10500,
    )


def q_bitext_mine_ivf(spark, sf_dir):
    """IVF-shortlist bitext mining (similarity.bitext_mine_ivf — the
    100-TB path of bitext_mine): identical ratio-margin contract, but
    every row scores only its IVF shortlist (two ivf_topk passes through
    the shared seeded coarse quantizer), neighbourhood sums are rank<=k
    shortlist aggregates, and the margin is exact long `div` arithmetic.
    No full-side broadcast arrays — both shards stream; the sum/mutual
    joins are side-bounded hash joins AQE is free to broadcast."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.bitext_mine_ivf(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4, threshold_bp=10500, shortlist=8, n_cells=32, nprobe=4,
    )


def q_phrase_search(spark, sf_dir):
    """Exact-phrase BM25 top-k (search.phrase_topk): documents containing
    the token phrase "hash join" (bag-of-words BM25 cannot tell it from
    "join ... hash"), scored with the phrase as a unit term under the
    same integer-exact k1=1.2/b=0.75 normalization as bm25_search.
    Anchor-coverage plan: matching tokens vote for compatible phrase
    START positions via a |phrase|-row broadcast offset join, a
    (doc, anchor) census keeps starts covered by all offsets — one
    posexplode + two uniform censuses, no arrays, no per-doc state."""
    return SE.phrase_topk(_t(spark, sf_dir, "documents"),
                          "hash join", k=20)


def q_phrase_index_search(spark, sf_dir):
    """Exact-phrase search against the PERSISTED positional index
    (search.text_index_phrase): build the index with positions=True
    into /tmp, read it back, and answer the same "hash join" query with
    the corpus never re-read — postings scan pruned to the phrase
    terms' hash buckets, positions re-exploded into the same
    anchor-coverage census, dl riding the postings, n_docs/avgdl from
    the 1-row stats table. Equals phrase_topk computed directly, so the
    oracle scores the corpus in place."""
    import re as _re

    docs = _t(spark, sf_dir, "documents", par=True)
    tag = _re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.rstrip("/"))
    path = f"/tmp/textindex_pos_contract_{tag}_{__import__('os').getpid()}"  # pid-unique: concurrent harnesses must not race one index dir
    SE.write_text_index(docs, path, positions=True)
    idx = SE.read_text_index(spark, path)
    return SE.text_index_phrase(idx, "hash join", k=20)


def q_focused_frontier(spark, sf_dir):
    """Focused-crawl frontier (graph.focused_scores → focused_frontier,
    shark-search shape): link targets scored by inbound-anchor topic
    matches (rel_q = Σ n × |distinct topic terms in the anchor|, pure
    integer) over the SAME synthetic anchor pages as anchor_census (the
    real Arrow parse path), then emitted as FRONTIER_SCHEMA rows with
    seq = -rel_q so the unchanged politeness window drains
    most-relevant-first. Topic = ['go', '7', '13']: every 'go N' anchor
    matches once, N ∈ {7,13} matches twice, 'see N' only via N — so the
    census, tokenizer, and weighting all show up in the hash."""
    docs = _t(spark, sf_dir, "documents", par=True)
    d = F.col("doc_id")
    x = (d % 97).cast("string")
    y = ((d * 31 + 7) % 97).cast("string")
    clean = F.regexp_replace(F.col("text"), "[<>&]", "")
    url = F.concat(F.lit("https://anchors.test/doc/"), d.cast("string"))
    html = F.concat(
        F.lit("<p>"), clean, F.lit('</p><a href="/d/'), x,
        F.lit('">go <b>'), x, F.lit('</b></a><a href="/d/'), y,
        F.lit('">see '), y,
        F.lit('</a><a href="#frag">skip</a><a href="/icon/'), x,
        F.lit('"></a>'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    census = GR.anchor_census(pages, k=3)
    return GR.focused_frontier(
        GR.focused_scores(census, ["go", "7", "13"])
    )


def q_index_neardup(spark, sf_dir):
    """Incremental semantic near-dup against the persisted IVF+PQ index
    (vecindex.index_neardup — the vector twin of incremental_dedup):
    index built from vec_id % 13 != 0, increment = % 13 == 0; each
    increment vector takes an ADC shortlist from the probed cells
    (codes stream from the index partitions) and an exact-cosine
    re-rank against the full-precision corpus decides dup_of/is_dup at
    cos >= 0.35. Probed-cells-empty increments keep a NULL/false row,
    so the verdict is total. The oracle composes the seeded IVF+PQ
    CTEs (vector_index_search) with the rerank tail (pq_rerank)."""
    import re as _re

    from distributed_crawl_spark.functions import vecindex as VX

    emb = _t(spark, sf_dir, "embeddings", par=True)
    corpus = emb.filter(F.col("vec_id") % 13 != 0)
    inc = emb.filter(F.col("vec_id") % 13 == 0)
    tag = _re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.rstrip("/"))
    path = f"/tmp/vecindex_neardup_contract_{tag}_{__import__('os').getpid()}"  # pid-unique: concurrent harnesses must not race one index dir
    VX.write_vector_index(corpus, path, n_cells=32, m=8, n_codes=16, dim=64)
    idx = VX.read_vector_index(spark, path)
    return VX.index_neardup(idx, inc, corpus, threshold_m=350,
                            nprobe=2, shortlist=20)


def q_link_spam_signals(spark, sf_dir):
    """Per-host link-spam audit (graph.link_spam_signals): in-link
    concentration + duplicated-anchor rate in integer basis points over
    a deterministic anchored host graph (src = doc_id mod 97, dst =
    md5 mod 37 — the host_rank synthesis plus an anchor column), with a
    PLANTED link farm: every doc_id % 5 == 0 edge retargets to
    'spamtarget' from one of two 'farm*' hosts carrying the identical
    anchor — so the flag fires exactly where the signals say it should
    (farm anchors 100% duplicated) while the 37 organic hosts spread
    ~97 sources × 13 anchors and stay under both 80% thresholds."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = (d % 5) == 0
    edges = docs.select(
        F.when(planted, F.concat(F.lit("farm"), (d % 2).cast("string")))
        .otherwise(F.concat(F.lit("h"), (d % 97).cast("string")))
        .alias("src"),
        F.when(planted, F.lit("spamtarget"))
        .otherwise(F.concat(
            F.lit("h"),
            (DD.md5_int48(d.cast("string")) % 37).cast("string"),
        )).alias("dst"),
        F.when(planted, F.lit("buy cheap widgets"))
        .otherwise(F.concat(F.lit("a"), ((d * 7 + 3) % 13).cast("string")))
        .alias("anchor"),
    )
    return GR.link_spam_signals(edges, min_inlinks=10)


_TRUST_SEEDS = ["h0", "h1", "h2"]


def q_trust_rank(spark, sf_dir):
    """TrustRank (graph.trust_rank): seed-biased integer PageRank over
    the SAME deterministic 37-host multigraph as host_rank, trusted
    seeds {h0,h1,h2}, 3 quantized iterations — trust decays with link
    distance from the seeds instead of spreading uniformly (hosts no
    seed transitively endorses would read 0; this dense md5 graph
    reaches everything by depth 3, so the hash exercises the decay
    gradient — seed ~203k micro-units down to ~24k at the fringe —
    while the zero regime is pytest-covered on a disconnected graph)."""
    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string"))
        .alias("src"),
        F.concat(
            F.lit("h"),
            (DD.md5_int48(F.col("doc_id").cast("string")) % 37)
            .cast("string"),
        ).alias("dst"),
    )
    return GR.trust_rank(edges, _TRUST_SEEDS, iters=3)


def _trust_rank_sql(iters: int = 3, scaled: bool = False) -> str:
    """DuckDB twin of q_trust_rank: _host_rank_sql's unrolled power
    iteration with the teleport CASE-gated onto the seed set. With
    ``scaled`` the seed init/teleport multiply by |hosts| // |seeds|
    (the spam_mass normalization) via a 1-row cross-joined CTE."""
    seeds = ", ".join(f"'{s}'" for s in _TRUST_SEEDS)
    n_seeds = len(_TRUST_SEEDS)
    sc = "sc.k" if scaled else "1"
    xsc = " CROSS JOIN sc" if scaled else ""
    s = f"""
        WITH e AS (
          SELECT 'h' || (doc_id % 37)::VARCHAR AS src,
                 'h' || ({_MD5I48.format(x="doc_id::VARCHAR")} % 37)::VARCHAR
                   AS dst
          FROM documents
        ),
        nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
        sc AS (
          SELECT greatest(1, count(*) // {n_seeds}) AS k FROM nodes
        ),
        od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        r0 AS (
          SELECT host,
                 CAST(CASE WHEN host IN ({seeds}) THEN 1000000 * {sc}
                      ELSE 0 END AS BIGINT) AS t
          FROM nodes{xsc}
        ),"""
    for i in range(iters):
        s += f"""
        c{i} AS (
          SELECT e.dst, CAST(sum(r{i}.t // od.outdeg) AS BIGINT) AS s
          FROM e JOIN od USING (src) JOIN r{i} ON r{i}.host = e.src
          GROUP BY e.dst
        ),
        r{i + 1} AS (
          SELECT nodes.host,
                 CAST(CASE WHEN nodes.host IN ({seeds})
                      THEN 150000 * {sc} ELSE 0 END
                      + (850 * COALESCE(c{i}.s, 0)) // 1000 AS BIGINT) AS t
          FROM nodes LEFT JOIN c{i} ON c{i}.dst = nodes.host{xsc}
        ),"""
    return s.rstrip(",") + f"""
        SELECT host, t AS trust_x1e6 FROM r{iters}"""


def q_spam_mass(spark, sf_dir):
    """Relative spam mass (graph.spam_mass, Gyöngyi VLDB'06): PageRank
    and teleport-SCALED TrustRank (seed mass × |hosts|//|seeds|, the
    paper's same-total-mass normalization) over the SAME 37-host md5
    multigraph (seeds {h0,h1,h2}, 3 iterations each), joined per host
    into max(0, (pr - trust)/pr) basis points — the verdict ratio of
    the spam stack. Both power iterations are integer-quantized, so the
    composed clamped ratio hash-matches the oracle's two unrolled CTE
    chains exactly."""
    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string"))
        .alias("src"),
        F.concat(
            F.lit("h"),
            (DD.md5_int48(F.col("doc_id").cast("string")) % 37)
            .cast("string"),
        ).alias("dst"),
    )
    return GR.spam_mass(edges, _TRUST_SEEDS, iters=3)


def _spam_mass_sql(iters: int = 3) -> str:
    """DuckDB twin of q_spam_mass: the host_rank and SCALED trust_rank
    unrolled chains as parenthesized WITH-subqueries, joined per host,
    mass clamped at 0 (scaled trust can exceed a host's PageRank)."""
    return f"""
        SELECT p.host, p.pr_x1e6, t.trust_x1e6,
               CAST(greatest(0, 10000 * (p.pr_x1e6 - t.trust_x1e6)
                                // p.pr_x1e6) AS BIGINT) AS spam_mass_bp
        FROM ({_host_rank_sql(iters)}) p
        JOIN ({_trust_rank_sql(iters, scaled=True)}) t USING (host)"""


def q_reciprocal_links(spark, sf_dir):
    """Per-host reciprocal-link rate (graph.reciprocal_link_rate,
    Fetterly-style link-exchange statistics) over the md5 host graph
    PLUS a planted mutual pair: every doc_id % 7 == 0 edge alternates
    rA→rB / rB→rA by (doc_id div 7) parity, so both ring hosts read
    exactly 10000 bp while the 37 organic hosts show whatever
    asymmetric reciprocity the hash happens to produce — the full bp
    gradient lands in the value hash."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = (d % 7) == 0
    flip = F.expr("(doc_id div 7) % 2 = 0")
    edges = docs.select(
        F.when(planted, F.when(flip, F.lit("rA")).otherwise(F.lit("rB")))
        .otherwise(F.concat(F.lit("h"), (d % 37).cast("string")))
        .alias("src"),
        F.when(planted, F.when(flip, F.lit("rB")).otherwise(F.lit("rA")))
        .otherwise(F.concat(
            F.lit("h"),
            (DD.md5_int48(d.cast("string")) % 37).cast("string"),
        )).alias("dst"),
    )
    return GR.reciprocal_link_rate(edges)


def q_host_language_mix(spark, sf_dir):
    """Per-source language-mix census (textstats.host_language_mix) over
    the documents table's REAL source/lang columns: majority-language
    share in basis points (ties n DESC, lang ASC via the min-struct
    carrier) and Shannon entropy in floor-quantized micro-nats — the
    CCNet-style mixed-language-host signal, one census + bounded
    rollups, corpus touched once."""
    return TS.host_language_mix(_t(spark, sf_dir, "documents"))


def q_dedup_containment(spark, sf_dir):
    """ASYMMETRIC shingle containment ≥ 0.8 (dedup.ngram_containment_pairs,
    Broder 1997's resemblance/containment split): the quote/aggregator
    case Jaccard misses. The corpus is documents PLUS a planted 12-token
    quote of every doc_id % 20 == 0 document (ids offset by 1e7) — each
    quote's shingles are a strict subset of its source's, so containment
    reads 1.0 where Jaccard(quote, source) is tiny. Same posting-list
    plan and max_df=64 skew bound as dedup_ngram_jaccard."""
    docs = _t(spark, sf_dir, "documents", par=True)
    quotes = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.array_join(F.slice(DD.tokens(F.col("text")), 1, 12), " ")
        .alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(quotes)
    return DD.ngram_containment_pairs(corpus, threshold=0.8, max_df=64)


def q_host_communities(spark, sf_dir):
    """Synchronous label-propagation communities (graph.label_communities,
    Raghavan et al. 2007) on a planted-partition host graph: 40 hosts in
    8 groups of 5, intra-group edges from every document (dst slot by
    md5), sparse cross-group edges from every 31st doc — so LPA must
    recover the groups THROUGH the majority vote (cross edges are the
    minority label a mode pick has to out-vote; connected components
    would collapse everything the cross edges touch)."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    g = d % 40
    grp = g - (g % 5)
    intra = docs.select(
        F.concat(F.lit("h"), g.cast("string")).alias("src"),
        F.concat(
            F.lit("h"),
            (grp + DD.md5_int48(d.cast("string")) % 5).cast("string"),
        ).alias("dst"),
    )
    cross = docs.filter(d % 31 == 0).select(
        F.concat(F.lit("h"), g.cast("string")).alias("src"),
        F.concat(
            F.lit("h"),
            (DD.md5_int48(F.concat(F.lit("x"), d.cast("string"))) % 40)
            .cast("string"),
        ).alias("dst"),
    )
    return GR.label_communities(intra.unionByName(cross), iters=4)


def q_video_frames(spark, sf_dir):
    """Video plumbing end-to-end (the ``video`` twin of audio_chunks):
    binary payloads → mapInPandas video_metadata (deterministic fake
    decode: width/fps/frames from payload length) → closed-form
    frame-sample plan (400 ms stride, ≤8 samples per video, frame index
    clamped to the real frame range). The oracle recomputes the chain
    from the synthesized payload length, so the Arrow batch path AND
    the sampling arithmetic are value-checked."""
    from distributed_crawl_spark.operators.multimodal import (
        video_frame_plan,
        video_metadata,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(
            F.concat(F.col("text"), F.lit("|"), F.col("doc_id").cast("string")),
            "UTF-8",
        ).alias("payload"),
        F.lit("video/mp4").alias("mime"),
    )
    return video_frame_plan(
        video_metadata(media, fake=True), every_ms=400, max_samples=8
    )


def q_pii_cc_luhn(spark, sf_dir):
    """Credit-card PII stats with Luhn validation (textstats.cc_luhn_stats):
    candidate digit runs from two fixed-shape patterns, then the Luhn
    double-and-fold checksum as pure HOF arithmetic — the precision
    split a real scrubbing pass needs (random digit runs pass Luhn at
    ~10%). Planted: a valid grouped VISA test number (%5), an invalid
    grouped run (%7), and a valid contiguous form (%11); the oracle
    recomputes candidates AND the checksum digit-for-digit."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(d % 5 == 0, F.lit(" card 4111 1111 1111 1111 ok"))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit(" num 1234 5678 9012 3456"))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit(" id 4111111111111111 end"))
        .otherwise(F.lit("")),
    )
    nc, nv = TS.cc_luhn_stats(t)
    return docs.select(
        "doc_id",
        nc.alias("n_cc_candidates"),
        nv.alias("n_cc_valid"),
    )


def _redirect_edges(spark, sf_dir):
    """Deterministic redirect graph over documents: a 21-hop ladder
    L21→…→L0 (so the max_hops=8 cap fires on a TERMINATING chain —
    L8 resolves in exactly 8 hops, L9+ get cut), a planted 3-cycle
    c0→c1→c2→c0 plus a feeder x0→c0 (never resolve), and the organic
    u_d → u_{d div 7} forest whose roots u0..u20 are terminals."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    src = (
        F.when(d < 21, F.concat(F.lit("L"), (d + 1).cast("string")))
        .when(d % 1000 == 111, F.lit("c0"))
        .when(d % 1000 == 222, F.lit("c1"))
        .when(d % 1000 == 333, F.lit("c2"))
        .when(d % 1000 == 444, F.lit("x0"))
        .otherwise(F.concat(F.lit("u"), d.cast("string")))
    )
    dst = (
        F.when(d < 21, F.concat(F.lit("L"), d.cast("string")))
        .when(d % 1000 == 111, F.lit("c1"))
        .when(d % 1000 == 222, F.lit("c2"))
        .when(d % 1000 == 333, F.lit("c0"))
        .when(d % 1000 == 444, F.lit("c0"))
        .otherwise(
            F.concat(F.lit("u"), F.expr("doc_id div 7").cast("string"))
        )
    )
    return docs.select(src.alias("src"), dst.alias("dst"))


def q_redirect_resolve(spark, sf_dir):
    """Pointer-doubling redirect resolution (redirects.resolve_redirects):
    log2(max_hops) self-joins on a |nodes|-row mapping table instead of
    one join per hop. The synthetic graph plants every regime the
    resolver distinguishes: exact-cap resolution (L8, hops=8,
    resolved), over-long chains (L9..L21, cut at 8 hops mid-ladder), a
    3-cycle and its feeder (final = stepwise position 8 mod 3 into the
    cycle, unresolved), and shallow organic chains ending at terminal
    forest roots. Oracle walks the same edges ONE hop at a time with a
    recursive CTE — doubling vs stepping must agree on final node, hop
    count, and resolved flag for every source."""
    return RD.resolve_redirects(_redirect_edges(spark, sf_dir), max_hops=8)


def q_redirect_aliases(spark, sf_dir):
    """Alias-group census (redirects.redirect_aliases): resolved sources
    grouped by terminal URL — the fetch-savings report of redirect
    canonicalization (n_aliases − 1 skipped fetches per terminal).
    Unresolved cycle members are excluded by contract."""
    return RD.redirect_aliases(
        RD.resolve_redirects(_redirect_edges(spark, sf_dir), max_hops=8)
    )


def q_lane_assign(spark, sf_dir):
    """Rendezvous host→lane pinning (politeness.lane_assignment,
    Thaler-Ravishankar HRW hashing): 211 synthetic hosts over 16
    fetcher lanes, argmax of md5_int48(host:lane). The minimal-
    disruption property (resize moves only the changed-argmax hosts) is
    pytest-verified; here the oracle recomputes every candidate score
    and the top-1 pick bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 211).cast("string"))
        .alias("host")
    )
    return PO.lane_assignment(hosts, n_lanes=16)


def q_lane_load(spark, sf_dir):
    """Per-lane load census (politeness.lane_load): the 211-host
    rendezvous assignment weighted by each host's queued-doc count —
    the skew report a fetch fleet reads before resizing. 16 output
    rows; weights ride one |hosts|-keyed join."""
    docs = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("h"), (F.col("doc_id") % 211).cast("string")
    ).alias("host")
    hosts = docs.select(host)
    weights = docs.select(host).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    return PO.lane_load(
        PO.lane_assignment(hosts, n_lanes=16), weights
    )


def _soft404_pages(spark, sf_dir):
    """Deterministic soft-404 corpus over documents: every 10th doc is
    the SHARED error template (the per-host dominant digest a template
    pick must find), every 10th+1 is a unique-text error page (flagged,
    but digests all distinct, so it can never win the template slot),
    the rest keep their real document text. 11 hosts."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(F.lit("http://h"), (d % 11).cast("string"),
                   F.lit(".test/p"), d.cast("string"))
    text = (
        F.when(d % 10 == 0, F.lit(
            "Error 404 not found. The page you requested does not exist."
        ))
        .when(d % 10 == 1, F.concat(
            F.lit("Sorry, item "), d.cast("string"),
            F.lit(" is no longer available."),
        ))
        .otherwise(F.col("text"))
    )
    return docs.select(url.alias("url"), text.alias("text"))


def q_soft404_flags(spark, sf_dir):
    """Per-page soft-404 verdict (pagehealth.soft404_flags): Bar-Yossef
    WWW'04 signals as closed-form predicates — error-phrase hit AND
    word_count <= 80 over 200-status pages. Zero-shuffle projection;
    the oracle recomputes phrase regex, whitespace word count, host
    parse, and md5 digest per row."""
    return PH.soft404_flags(_soft404_pages(spark, sf_dir))


def q_soft404_hosts(spark, sf_dir):
    """Per-host soft-404 census + error-template pick
    (pagehealth.soft404_hosts): rate in integral basis points and the
    dominant flagged digest (ties toward smaller digest) — the artifact
    that lets ingest drop a host's known error template without a
    fetch. Census groupBys + a map-side WindowGroupLimit top-1."""
    return PH.soft404_hosts(
        PH.soft404_flags(_soft404_pages(spark, sf_dir)), min_pages=3
    )


def q_strippable_params(spark, sf_dir):
    """Content-evidence tracking-param inference
    (pagehealth.strippable_params, the DustBuster/IRLbot DUST rule):
    URLs differing only in one param's value that served identical
    content argue for stripping it; ONE counter-example on the host
    vetoes. Synthetic corpus plants both regimes — utm (3 values, never
    changes the digest) must come out strippable on every host, page
    (4 values, digest-bearing) must not. The oracle re-parses the same
    URL strings with DuckDB list lambdas and replays the census."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("http://h"), (d % 5).cast("string"), F.lit(".test/p"),
        (d % 7).cast("string"), F.lit("?page="), (d % 4).cast("string"),
        F.lit("&utm="), (d % 3).cast("string"),
    )
    text = F.concat(
        F.lit("c "), (d % 5).cast("string"), F.lit(" "),
        (d % 7).cast("string"), F.lit(" "), (d % 4).cast("string"),
    )
    return PH.strippable_params(
        docs.select(url.alias("url"), text.alias("text"))
    )


def _rank_edges(spark, sf_dir):
    """The q_host_rank 37-host multigraph, shared by the degree census."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string"))
        .alias("src"),
        F.concat(
            F.lit("h"),
            (DD.md5_int48(F.col("doc_id").cast("string")) % 37)
            .cast("string"),
        ).alias("dst"),
    )


def q_degree_census(spark, sf_dir):
    """Per-host in/out degree census (graph.degree_census) over the
    host_rank multigraph: edge counts AND distinct-neighbor counts per
    direction, full-outer merged so pure sources/sinks read 0. Two
    map-side censuses + one |hosts| join."""
    return GR.degree_census(_rank_edges(spark, sf_dir))


def q_degree_histogram(spark, sf_dir):
    """Log2-bucketed degree distribution (graph.degree_histogram, the
    Broder WWW'00 power-law census): bucket = length(bin(d)) - 1 —
    integer-exact floor(log2), never the float log — so the histogram
    hash-matches DuckDB's format('{:b}') twin. The top buckets name
    the hosts skew mitigation must absorb."""
    return GR.degree_histogram(
        GR.degree_census(_rank_edges(spark, sf_dir))
    )


def q_canonical_urls(spark, sf_dir):
    """DUST canonicalization end-to-end (pagehealth.canonicalize_urls
    composed with strippable_params learned from the SAME corpus): utm
    is learned strippable and disappears from every canonical URL,
    page survives, members sort canonically. Zero-shuffle rewrite + a
    |hosts|-row broadcast of learned drop sets; the oracle replays the
    learning SQL and the list rebuild."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("http://h"), (d % 5).cast("string"), F.lit(".test/p"),
        (d % 7).cast("string"), F.lit("?page="), (d % 4).cast("string"),
        F.lit("&utm="), (d % 3).cast("string"),
    )
    text = F.concat(
        F.lit("c "), (d % 5).cast("string"), F.lit(" "),
        (d % 7).cast("string"), F.lit(" "), (d % 4).cast("string"),
    )
    pages = docs.select(url.alias("url"), text.alias("text"))
    return PH.canonicalize_urls(pages, PH.strippable_params(pages))


def q_cluster_split(spark, sf_dir):
    """Leakage-aware split (curation.cluster_split over the simhash64
    near-dup components): the CLUSTER id hashes, so a duplicate family
    can never straddle train/test — the Lee-et-al contamination mode a
    plain hash split leaves open. Singletons hash by their own id,
    making this a strict superset of corpus_split. The oracle chains
    the dedup_components recursive CTE into the split hash."""
    docs = _t(spark, sf_dir, "documents", par=True)
    comps = DD.near_dup_components(
        DD.simhash_pairs64(docs, max_hamming=3)
    )
    return CU.cluster_split(docs, comps)


def q_domain_rollup(spark, sf_dir):
    """Registrable-domain rollup (graph.domain_rollup over
    degree_census): 24 subdomain-bearing hosts (wW.domK.test) collapse
    to 6 sites; n_hosts is the wildcard-subdomain multiplier a crawl
    planner budgets against. Census-sized groupBy on the depth-2
    suffix; the oracle recomputes the suffix from the same host
    strings and replays both censuses."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h = DD.md5_int48(d.cast("string"))
    edges = docs.select(
        F.concat(F.lit("w"), (d % 4).cast("string"), F.lit(".dom"),
                 (d % 6).cast("string"), F.lit(".test")).alias("src"),
        F.concat(F.lit("w"), (h % 4).cast("string"), F.lit(".dom"),
                 (h % 6).cast("string"), F.lit(".test")).alias("dst"),
    )
    return GR.domain_rollup(GR.degree_census(edges))


def q_collocations(spark, sf_dir):
    """Top-25 PMI collocations (textstats.collocations, Church & Hanks
    1990): bigram census >= min_count, unigram joins, one 1-row total
    broadcast, global TakeOrdered top-k. The floor-ln quantization is
    ONE double expression written identically in both engines (the
    bigram_logprob pattern), so ranking and tie-breaks (pmi DESC, w1,
    w2) hash-match exactly."""
    return TS.collocations(
        _t(spark, sf_dir, "documents"), k=25, min_count=5
    )


def q_contract_edges(spark, sf_dir):
    """Alias contraction of the host graph (graph.contract_edges): the
    37-host multigraph with hosts h30..h36 declared aliases of
    h20..h26 (a 7-row mapping) — merged multiplicities in weight,
    contraction-created self-loops dropped, so rank mass stops
    splitting across aliases. Two |mapping| joins + one edge census."""
    edges = _rank_edges(spark, sf_dir)
    rows = [(f"h{n}", f"h{n - 10}") for n in range(30, 37)]
    mapping = spark.createDataFrame(rows, "src string, final string")
    return GR.contract_edges(edges, mapping)


def q_tfidf_keywords(spark, sf_dir):
    """Per-doc top-3 TF-IDF keywords (search.topk_terms): saturated tf
    × micro-unit BM25+ idf, both integers, ties (score DESC, term ASC).
    Postings explode+census, a vocabulary-sized idf join on the term
    key, and a per-doc row_number()<=k window (map-side
    WindowGroupLimit). The oracle replays the census and the floor-ln
    quantization — the same float-crossing pattern bm25_search proved
    hash-exact."""
    return SE.topk_terms(_t(spark, sf_dir, "documents"), k=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "url_slug": q_url_slug,
        "content_hash": q_content_hash,
        "url_normalize": q_url_normalize,
        "blocked_ext_filter": q_blocked_ext_filter,
        "geo_block_detect": q_geo_block_detect,
        "seen_anti_join": q_seen_anti_join,
        "link_dedup_cap": q_link_dedup_cap,
        "politeness_window": q_politeness_window,
        "frontier_fifo": q_frontier_fifo,
        "level_stats": q_level_stats,
        "error_histogram": q_error_histogram,
        "content_stats": q_content_stats,
        "seed_join": q_seed_join,
        "text_metadata": q_text_metadata,
        "truncate_content": q_truncate_content,
        "clean_markdown": q_clean_markdown,
        "pricing_summary": q_pricing_summary,
        "hourly_events": q_hourly_events,
        "session_counters": q_session_counters,
        "frontier_expand": q_frontier_expand,
        "dedup_exact": q_dedup_exact,
        "dedup_exact_norm": q_dedup_exact_norm,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash64": q_dedup_simhash64,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "semdedup": q_semdedup,
        "pq_encode": q_pq_encode,
        "pq_topk": q_pq_topk,
        "pq_rerank": q_pq_rerank,
        "dedup_components": q_dedup_components,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "unigram_logprob": q_unigram_logprob,
        "blocklist_filter": q_blocklist_filter,
        "ccnet_buckets": q_ccnet_buckets,
        "script_profile": q_script_profile,
        "analyze_stub": q_analyze_stub,
        "train_corpus_filter": q_train_corpus_filter,
        "stream_dedup": q_stream_dedup,
        "multimodal_meta": q_multimodal_meta,
        "image_dhash": q_image_dhash,
        "image_neardup": q_image_neardup,
        "audio_chunks": q_audio_chunks,
        "corpus_split": q_corpus_split,
        "corpus_sample": q_corpus_sample,
        "decontaminate": q_decontaminate,
        "span_scrub": q_span_scrub,
        "mix_report": q_mix_report,
        "mix_plan": q_mix_plan,
        "incremental_dedup": q_incremental_dedup,
        "pack_shards": q_pack_shards,
        "url_strip_tracking": q_url_strip_tracking,
        "pack_examples": q_pack_examples,
        "corpus_diff": q_corpus_diff,
        "error_backoff": q_error_backoff,
        "shard_manifest": q_shard_manifest,
        "dedup_doc_lines": q_dedup_doc_lines,
        "dedup_lines_global": q_dedup_lines_global,
        "quality_quantile_gate": q_quality_quantile_gate,
        "host_rank": q_host_rank,
        "train_corpus_full": q_train_corpus_full,
        "top_ngrams": q_top_ngrams,
        "doc_keywords": q_doc_keywords,
        "normalize_nfc": q_normalize_nfc,
        "url_trap_filter": q_url_trap_filter,
        "sitemap_parse": q_sitemap_parse,
        "sitemap_lastmod": q_sitemap_lastmod,
        "canonical_dedup": q_canonical_dedup,
        "surt_key": q_surt_key,
        "fix_mojibake": q_fix_mojibake,
        "boilerplate_lines": q_boilerplate_lines,
        "quality_classifier": q_quality_classifier,
        "c4_clean": q_c4_clean,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "source_rollup": q_source_rollup,
        "pii_redact": q_pii_redact,
        "quality_repetition": q_quality_repetition,
        "train_corpus_neardup": q_train_corpus_neardup,
        "train_corpus_neardup_minhash": q_train_corpus_neardup_minhash,
        "markdown_extract": q_markdown_extract,
        "anchor_census": q_anchor_census,
        "train_corpus_gopher": q_train_corpus_gopher,
        "source_cap": q_source_cap,
        "substring_dedup": q_substring_dedup,
        "vector_index_search": q_vector_index_search,
        "recrawl_priority": q_recrawl_priority,
        "bm25_search": q_bm25_search,
        "bigram_logprob": q_bigram_logprob,
        "hits_scores": q_hits_scores,
        "bm25_index_search": q_bm25_index_search,
        "source_entropy": q_source_entropy,
        "decontaminate_semantic": q_decontaminate_semantic,
        "source_similarity": q_source_similarity,
        "dup_rate_by_source": q_dup_rate_by_source,
        "mix_temperature": q_mix_temperature,
        "quality_drift": q_quality_drift,
        "chunk_documents": q_chunk_documents,
        "blocklist_mine": q_blocklist_mine,
        "tokenizer_stats": q_tokenizer_stats,
        "url_template_mine": q_url_template_mine,
        "politeness_audit": q_politeness_audit,
        "mirror_detect": q_mirror_detect,
        "gate_agreement": q_gate_agreement,
        "drain_plan": q_drain_plan,
        "dedup_cluster_stats": q_dedup_cluster_stats,
        "sitemap_coverage": q_sitemap_coverage,
        "robots_audit": q_robots_audit,
        "importance_sample": q_importance_sample,
        "bitext_mine": q_bitext_mine,
        "bitext_mine_ivf": q_bitext_mine_ivf,
        "phrase_search": q_phrase_search,
        "phrase_index_search": q_phrase_index_search,
        "focused_frontier": q_focused_frontier,
        "index_neardup": q_index_neardup,
        "link_spam_signals": q_link_spam_signals,
        "trust_rank": q_trust_rank,
        "spam_mass": q_spam_mass,
        "reciprocal_links": q_reciprocal_links,
        "host_language_mix": q_host_language_mix,
        "dedup_containment": q_dedup_containment,
        "host_communities": q_host_communities,
        "video_frames": q_video_frames,
        "pii_cc_luhn": q_pii_cc_luhn,
        "redirect_resolve": q_redirect_resolve,
        "redirect_aliases": q_redirect_aliases,
        "lane_assign": q_lane_assign,
        "lane_load": q_lane_load,
        "soft404_flags": q_soft404_flags,
        "soft404_hosts": q_soft404_hosts,
        "strippable_params": q_strippable_params,
        "tfidf_keywords": q_tfidf_keywords,
        "degree_census": q_degree_census,
        "degree_histogram": q_degree_histogram,
        "canonical_urls": q_canonical_urls,
        "contract_edges": q_contract_edges,
        "collocations": q_collocations,
        "cluster_split": q_cluster_split,
        "domain_rollup": q_domain_rollup,
    }
    # The correctness driver samples the FIRST 50 entries in registration
    # order.  Queries are appended to `base` oldest-first as they are built,
    # so returning the reversed dict registers newest-first: each round the
    # driver's 50-query sample covers the least-recently-validated operators
    # (the older rows have multiple prior green CORRECTNESS_r* records).
    return dict(reversed(list(base.items())))


# ---------------------------------------------------------------------------
# oracle_sql — DuckDB equivalents
# ---------------------------------------------------------------------------

def _slug_sql(url: str) -> str:
    """DuckDB twin of functions.url.page_slug (P3)."""
    return f"""
    WITH u AS (SELECT doc_id, {url} AS url FROM documents),
    parts AS (
      SELECT doc_id, url,
        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1) AS netloc,
        regexp_replace(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)', 1),
                       '^/+|/+$', '', 'g') AS path
      FROM u
    ),
    d AS (
      SELECT doc_id, url, netloc, path,
        translate(regexp_replace(regexp_replace(netloc, 'www\\.', '', 'g'),
                                 '[^a-zA-Z0-9.\\-]', '', 'g'), '.', '_') AS domain,
        (string_split(path, '/'))[-1] AS last_seg
      FROM parts
    ),
    pg AS (
      SELECT doc_id, url, netloc, domain, path,
        CASE WHEN path = '' THEN 'index'
             WHEN regexp_replace(last_seg, '\\.[^.]*$', '') = ''
               THEN regexp_replace(translate(path, '/', '_'), '^_+|_+$', '', 'g')
             ELSE regexp_replace(last_seg, '\\.[^.]*$', '') END AS page_raw
      FROM d
    ),
    pg2 AS (
      SELECT doc_id, url, netloc, domain,
        regexp_replace(regexp_replace(regexp_replace(page_raw, '[^a-zA-Z0-9\\-_]', '_', 'g'),
                       '_+', '_', 'g'), '^_+|_+$', '', 'g') AS page0
      FROM pg
    )
    SELECT doc_id, url,
      regexp_replace(substr(domain || '_' || CASE WHEN page0 = '' THEN 'page' ELSE page0 END, 1, 50),
                     '^_+|_+$', '', 'g') AS slug,
      lower(netloc) AS host,
      TRUE AS is_valid
    FROM pg2
    """


def _minhash_params_sql() -> str:
    rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(DD.MINHASH_PARAMS))
    return f"params(i, a, b) AS (VALUES {rows})"


def _hits_sql(iters: int = 2) -> str:
    """DuckDB twin of q_hits_scores: each half-step (sum over edges,
    max-renormalize to micro-units) unrolled as chained CTEs — all
    integer floor arithmetic, so it hash-matches."""
    s = f"""
        WITH e AS (
          SELECT 'h' || (doc_id % 37)::VARCHAR AS src,
                 'h' || ({_MD5I48.format(x="doc_id::VARCHAR")} % 37)::VARCHAR
                   AS dst
          FROM documents
        ),
        nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
        h0 AS (SELECT host, CAST(1000000 AS BIGINT) AS hub FROM nodes)"""
    prev_h = "h0"
    for i in range(iters):
        s += f""",
        ar{i} AS (
          SELECT e.dst AS host, CAST(sum({prev_h}.hub) AS BIGINT) AS raw
          FROM e JOIN {prev_h} ON {prev_h}.host = e.src GROUP BY e.dst
        ),
        am{i} AS (
          SELECT max(COALESCE(raw, 0)) AS mx
          FROM nodes LEFT JOIN ar{i} USING (host)
        ),
        a{i} AS (
          SELECT nodes.host,
                 CAST(CASE WHEN mx > 0
                      THEN (COALESCE(raw, 0) * 1000000) // mx
                      ELSE 0 END AS BIGINT) AS auth
          FROM nodes LEFT JOIN ar{i} USING (host) CROSS JOIN am{i}
        ),
        hr{i} AS (
          SELECT e.src AS host, CAST(sum(a{i}.auth) AS BIGINT) AS raw
          FROM e JOIN a{i} ON a{i}.host = e.dst GROUP BY e.src
        ),
        hm{i} AS (
          SELECT max(COALESCE(raw, 0)) AS mx
          FROM nodes LEFT JOIN hr{i} USING (host)
        ),
        h{i + 1} AS (
          SELECT nodes.host,
                 CAST(CASE WHEN mx > 0
                      THEN (COALESCE(raw, 0) * 1000000) // mx
                      ELSE 0 END AS BIGINT) AS hub
          FROM nodes LEFT JOIN hr{i} USING (host) CROSS JOIN hm{i}
        )"""
        prev_h = f"h{i + 1}"
    return s + f"""
        SELECT nodes.host, {prev_h}.hub AS hub_x1e6,
               a{iters - 1}.auth AS auth_x1e6
        FROM nodes JOIN {prev_h} USING (host)
        JOIN a{iters - 1} USING (host)"""


def oracle_sql() -> dict[str, str]:
    markers = {
        lang: "\\b(" + "|".join(ws) + ")\\b" for lang, ws in TS.LANG_MARKERS.items()
    }
    all_stop = "\\b(" + "|".join(sorted({w for ws in TS.LANG_MARKERS.values() for w in ws})) + ")\\b"
    langs = sorted(markers)
    score_cols = ",\n        ".join(
        f"len(regexp_extract_all(lower(text), '{markers[lang]}')) AS score_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred_case = "CASE " + " ".join(
        f"WHEN score_{lang} > 0 AND score_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    gopher_stop_sql = " + ".join(
        "CASE WHEN regexp_matches(lower(text), '\\b%s\\b') THEN 1 ELSE 0 END" % w
        for w in sorted(["a", *TS.LANG_MARKERS["en"]])
    )
    # One boolean expression = the full Gopher conjunction over a row of
    # (text, toks, lines) — shared by blocklist_mine / gate_agreement so
    # the rule set is written once (train_corpus_gopher keeps its named
    # per-feature CTE because it EMITS the feature columns).
    gopher_keep_sql = f"""
            (CAST(len(toks) AS BIGINT) BETWEEN 50 AND 100000
             AND CAST(floor(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                  * 100 / greatest(len(toks), 1)) AS BIGINT) BETWEEN 300 AND 1000
             AND CAST(floor(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                  * 10000 / greatest(len(toks), 1)) AS BIGINT) BETWEEN 0 AND 1000
             AND CAST(floor(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))
                  * 10000 / greatest(len(lines), 1)) AS BIGINT) BETWEEN 0 AND 9000
             AND CAST(floor(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                  * 10000 / greatest(len(lines), 1)) AS BIGINT) BETWEEN 0 AND 3000
             AND CAST(floor(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                  * 10000 / greatest(len(toks), 1)) AS BIGINT) BETWEEN 8000 AND 10000
             AND CAST({gopher_stop_sql} AS BIGINT) BETWEEN 2 AND 8
             AND CAST(CASE WHEN len(lines) > 0
                  THEN floor((len(lines) - len(list_distinct(lines))) * 10000 / len(lines))
                  ELSE 0 END AS BIGINT) BETWEEN 0 AND 3000)"""

    out = {
        "url_slug": _slug_sql(_URL_SQL),
        "content_hash": """
            SELECT doc_id, substr(sha256(text), 1, 16) AS md_hash,
                   md5(text) AS md5_hash FROM documents""",
        "url_normalize": f"""
            WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
            r AS (SELECT doc_id,
                         CASE WHEN doc_id % 4 = 0 THEN substr(url, 9) ELSE url END AS raw_url
                  FROM u),
            s AS (SELECT doc_id, raw_url,
                         CASE WHEN raw_url LIKE 'http://%' OR raw_url LIKE 'https://%'
                              THEN raw_url ELSE 'https://' || raw_url END AS with_scheme
                  FROM r)
            SELECT doc_id, raw_url, with_scheme,
                   regexp_replace(with_scheme, '#.*$', '') AS normalized
            FROM s""",
        "blocked_ext_filter": f"""
            SELECT doc_id, url FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents)
            WHERE NOT regexp_matches(lower(url), '\\.(pdf|doc|docx|xls|xlsx|zip|rar|exe|dmg|pkg)$')""",
        "geo_block_detect": """
            SELECT doc_id,
              (lower(text) LIKE '%your location not permitted%'
               OR lower(text) LIKE '%not available in your region%'
               OR lower(text) LIKE '%geo-blocked%'
               OR lower(text) LIKE '%location not supported%'
               OR lower(text) LIKE '%access denied from your location%'
               OR lower(text) LIKE '%content not available in your country%'
               OR lower(text) LIKE '%vpn detected%'
               OR lower(text) LIKE '%proxy detected%') AS geo_blocked
            FROM documents""",
        "seen_anti_join": """
            SELECT o_orderkey FROM orders
            WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""",
        "link_dedup_cap": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS token,
                     generate_subscripts({_TOKS_SQL}, 1) AS pos
              FROM documents
            ),
            first AS (
              SELECT doc_id, token, min(pos) AS first_pos FROM toks GROUP BY 1, 2
            )
            SELECT doc_id,
                   row_number() OVER (PARTITION BY doc_id ORDER BY first_pos) AS link_pos,
                   token
            FROM first
            QUALIFY link_pos <= 10""",
        "politeness_window": f"""
            SELECT source AS host, {_URL_SQL} AS url, doc_id AS seq
            FROM documents
            QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 8""",
        "frontier_fifo": """
            SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str FROM events
            ORDER BY ts, event_id LIMIT 100""",
        "level_stats": """
            SELECT l_linenumber AS level, count(*) AS n_total,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY 1""",
        "error_histogram": """
            SELECT event_type, substr(props, 1, 8) AS props_prefix, count(*) AS n
            FROM events GROUP BY 1, 2""",
        "content_stats": """
            SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(floor(sum(n_chars) / count(*) * 10000) AS BIGINT) AS avg_chars_x1e4,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents""",
        "seed_join": """
            SELECT r_name, n_name, count(*) AS n_customers,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2""",
        "text_metadata": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKS_SQL}) END AS word_count,
                   length(text) AS char_count,
                   len(string_split(text, chr(10))) AS line_count,
                   regexp_extract(text, '(?m)^[^\\S\\n]*#+[^\\S\\n]*(.*?)[^\\S\\n]*$', 1) AS title
            FROM documents""",
        "truncate_content": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS w FROM documents)
            SELECT doc_id,
                   CASE WHEN len(w) > 50
                        THEN array_to_string(w[1:50], ' ') || chr(10) || chr(10) || '[Content truncated...]'
                        ELSE text END AS truncated
            FROM t""",
        "clean_markdown": """
            WITH m AS (
              SELECT doc_id,
                     '# Title  ' || chr(10) || chr(10) || chr(10) || chr(10) || text
                     || '   ' || chr(10) || 'end  ' || chr(10) || chr(10) || ' ' || chr(10) AS messy
              FROM documents
            )
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(messy,
                '[ \\t]+(\\n|$)', '\\1', 'g'),
                '\\n{3,}', chr(10) || chr(10), 'g'),
                '^\\n+|\\n+$', '', 'g') AS cleaned
            FROM m""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2""",
        "hourly_events": """
            SELECT strftime(ts, '%Y-%m-%d %H') AS hour_str, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2""",
        "session_counters": """
            SELECT count(*) AS total,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(count(*)
                     - sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     - sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
                   CAST(floor(
                     (sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                      + sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END))
                     / count(*) * 10000) AS BIGINT) AS success_rate_x1e4
            FROM events""",
        "frontier_expand": f"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            seeds AS (
              SELECT doc_id AS seq, source, {_URL_SQL} AS url
              FROM documents WHERE doc_id < 20
            ),
            links AS (
              SELECT s.url AS parent_url, s.seq AS parent_seq, k.k AS link_pos,
                     'https://' || s.source || '.example.org/d/'
                       || (((s.seq * 7 + k.k) % nn.n) % 5)::VARCHAR
                       || '/page-' || ((s.seq * 7 + k.k) % nn.n)::VARCHAR
                       || '.html' AS url
              FROM seeds s CROSS JOIN (VALUES (1), (2), (3)) k(k) CROSS JOIN nn
            ),
            dedup AS (
              SELECT url, parent_url, parent_seq, link_pos,
                     row_number() OVER (PARTITION BY url
                                        ORDER BY parent_seq, link_pos) AS rn
              FROM links
            )
            SELECT url, parent_url, parent_seq, link_pos FROM dedup
            WHERE rn = 1 AND url NOT IN (SELECT url FROM seeds)""",
        "dedup_exact": """
            SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1""",
        "dedup_exact_norm": """
            WITH v AS (
              SELECT doc_id * 3 AS doc_id, text FROM documents
              UNION ALL
              SELECT doc_id * 3 + 1,
                     CASE WHEN doc_id % 2 = 0 THEN upper(text) || ' !!!'
                          ELSE text || ' 123' END
              FROM documents
              UNION ALL
              SELECT doc_id * 3 + 2,
                     CASE WHEN doc_id % 2 = 0
                          THEN '"' || translate(text, 'ae', 'àé') || '"'
                          ELSE text || ' 987.' END
              FROM documents
            ),
            n AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(regexp_replace(
                       translate(lower(text),
                                 'àáâäãåèéêëìíîïòóôöõùúûüçñýÿ',
                                 'aaaaaaeeeeiiiiooooouuuucnyy'),
                       '[0-9]', '0', 'g'),
                       '[.,;:!?"''()\\[\\]{}<>/\\\\|@#$%^&*_+=~-]', '', 'g'),
                       '\\s+', ' ', 'g')) AS norm
              FROM v
            )
            SELECT md5(norm) AS digest, min(doc_id) AS canonical_id,
                   count(*) AS n_copies
            FROM n GROUP BY 1""",
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLES_CTE},
            rare AS (
              SELECT shingle FROM ds GROUP BY 1 HAVING count(*) <= 64
            ),
            dsf AS (SELECT ds.* FROM ds JOIN rare USING (shingle)),
            cnt AS (SELECT doc_id, count(*) AS n_sh FROM dsf GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM dsf a JOIN dsf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, n_inter, ca.n_sh AS n_a, cb.n_sh AS n_b,
                   CAST(floor(n_inter / (ca.n_sh + cb.n_sh - n_inter) * 1000000) AS BIGINT) AS jaccard_u
            FROM inter
            JOIN cnt ca ON ca.doc_id = id_a
            JOIN cnt cb ON cb.doc_id = id_b
            WHERE n_inter / (ca.n_sh + cb.n_sh - n_inter) >= 0.5""",
        "dedup_minhash_lsh": f"""
            WITH {_SHINGLES_CTE},
            {_minhash_params_sql()},
            x AS (SELECT doc_id, {_MD5I48.format(x='shingle')} % {P31} AS x FROM ds),
            sig AS (
              SELECT doc_id, i, min((a * x + b) % {P31}) AS mh
              FROM x CROSS JOIN params GROUP BY 1, 2
            ),
            band AS (
              SELECT doc_id, i // {DD.LSH_ROWS} AS band,
                     md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS band_key
              FROM sig GROUP BY 1, 2
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
            FROM band a
            JOIN band b ON a.band = b.band AND a.band_key = b.band_key
                        AND a.doc_id < b.doc_id
            GROUP BY 1, 2""",
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf,
                     {_MD5I48.format(x='tok')} % 4294967296 AS h
              FROM toks GROUP BY 1, 2
            ),
            bits AS (
              SELECT doc_id, j,
                     sum(CASE WHEN (h >> j) & 1 = 1 THEN tf ELSE -tf END) AS w
              FROM tf CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j)
              GROUP BY 1, 2
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY 1""",
        "dedup_simhash64": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf,
                     CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS hlo,
                     CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS hhi
              FROM toks GROUP BY 1, 2
            ),
            bits AS (
              SELECT doc_id, j,
                     sum(CASE WHEN ((CASE WHEN j >= 32 THEN hhi ELSE hlo END)
                                    >> (j % 32)) & 1 = 1
                         THEN tf ELSE -tf END) AS w
              FROM tf CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)
              GROUP BY 1, 2
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN w > 0 AND j >= 32
                            THEN (1::BIGINT << (j - 32)) ELSE 0 END) AS BIGINT) AS sh_hi,
                   CAST(sum(CASE WHEN w > 0 AND j < 32
                            THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sh_lo
            FROM bits GROUP BY 1""",
        "dedup_simhash_pairs": f"""
            WITH {_SH64_PAIRS_CTES}
            SELECT id_a, id_b,
                   CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS INT) AS hamming
            FROM cand
            WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3""",
        "dedup_components": f"""
            WITH RECURSIVE {_SH64_PAIRS_CTES},
            p AS (
              SELECT id_a, id_b FROM cand
              WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
            ),
            e AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p
            ),
            reach AS (
              SELECT DISTINCT src AS id, src AS r FROM e
              UNION
              SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src
            )
            SELECT id AS doc_id, min(r) AS component_id
            FROM reach GROUP BY 1""",
        "dedup_embedding": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(floor(list_cosine_similarity(a.e, b.e) * 1000) AS BIGINT) AS cos_m
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.4""",
        "dedup_embedding_lsh": f"""
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            comp AS (
              SELECT vec_id, unnest(e) AS val, generate_subscripts(e, 1) - 1 AS d FROM v
            ),
            {_LSH_MT_BUCKETS_CTE}
            , pair AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM bucket a
              JOIN bucket b ON a.t = b.t AND a.bucket = b.bucket
                            AND a.vec_id < b.vec_id
            )
            SELECT id_a, id_b,
                   CAST(floor(list_cosine_similarity(va.e, vb.e) * 1000) AS BIGINT) AS cos_m
            FROM pair
            JOIN v va ON va.vec_id = id_a
            JOIN v vb ON vb.vec_id = id_b
            WHERE list_cosine_similarity(va.e, vb.e) >= 0.4""",
        "ann_topk": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     list_cosine_similarity(q.e, c.e) AS cos
              FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id != q.vec_id
            )
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
                   CAST(floor(cos * 1000) AS BIGINT) AS cos_m
            FROM scored
            QUALIFY rank <= 5""",
        "ann_lsh": f"""
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            comp AS (
              SELECT vec_id, unnest(e) AS val, generate_subscripts(e, 1) - 1 AS d FROM v
            ),
            {_LSH_MT_BUCKETS_CTE}
            , cand AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
              FROM bucket q
              JOIN bucket c ON q.t = c.t AND q.bucket = c.bucket
                            AND c.vec_id != q.vec_id
              WHERE q.vec_id < 10
            ),
            scored AS (
              SELECT query_id, cand.vec_id,
                     list_cosine_similarity(qv.e, cv.e) AS cos
              FROM cand
              JOIN v qv ON qv.vec_id = query_id
              JOIN v cv ON cv.vec_id = cand.vec_id
            )
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
                   CAST(floor(cos * 1000) AS BIGINT) AS cos_m
            FROM scored
            QUALIFY rank <= 5""",
        "ann_ivf": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            cent AS (
              SELECT vec_id AS cell_id, e AS ce FROM v
              ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 32
            ),
            cand AS (
              SELECT vec_id, e, cell_id FROM (
                SELECT v.vec_id, v.e, c.cell_id,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.cell_id) AS rn
                FROM v CROSS JOIN cent c)
              WHERE rn = 1
            ),
            qs AS (
              SELECT vec_id AS query_id, e, cell_id FROM (
                SELECT v.vec_id, v.e, c.cell_id,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.cell_id) AS rn
                FROM v CROSS JOIN cent c WHERE v.vec_id < 10)
              WHERE rn <= 4
            ),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(q.e, c.e) AS cos
              FROM cand c JOIN qs q USING (cell_id)
              WHERE c.vec_id != q.query_id
            )
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
                   CAST(floor(cos * 1000) AS BIGINT) AS cos_m
            FROM scored
            QUALIFY rank <= 5""",
        "pq_encode": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            seeds AS (
              SELECT e,
                     row_number() OVER (ORDER BY md5(vec_id::VARCHAR),
                                        vec_id) - 1 AS code_id
              FROM v ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
            ),
            cb AS (
              SELECT s.sub, code_id,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS c
              FROM seeds, (SELECT unnest(range(8)) AS sub) s
            ),
            subs AS (
              SELECT vec_id, s.sub,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
              FROM v, (SELECT unnest(range(8)) AS sub) s
            ),
            scored AS (
              SELECT vec_id, sub, code_id, c,
                     list_sum(list_transform(range(1, 9),
                       i -> (sv[i] - c[i]) * (sv[i] - c[i]))) AS d
              FROM subs JOIN cb USING (sub)
            ),
            best AS (
              SELECT vec_id, sub, code_id, c FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                             ORDER BY d, code_id) AS rn
                FROM scored) WHERE rn = 1
            ),
            agg AS (
              SELECT vec_id,
                     string_agg(code_id::VARCHAR, ',' ORDER BY sub)
                       AS codes,
                     flatten(list(c ORDER BY sub)) AS recon
              FROM best GROUP BY vec_id
            )
            SELECT v.vec_id, agg.codes,
                   CAST(floor(list_cosine_similarity(v.e, agg.recon)
                              * 1000) AS BIGINT) AS recon_cos_m
            FROM v JOIN agg USING (vec_id)""",
        "pq_topk": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            seeds AS (
              SELECT e,
                     row_number() OVER (ORDER BY md5(vec_id::VARCHAR),
                                        vec_id) - 1 AS code_id
              FROM v ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
            ),
            cb AS (
              SELECT s.sub, code_id,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS c
              FROM seeds, (SELECT unnest(range(8)) AS sub) s
            ),
            subs AS (
              SELECT vec_id, s.sub,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
              FROM v, (SELECT unnest(range(8)) AS sub) s
            ),
            dsc AS (
              SELECT vec_id, sub, code_id,
                     list_sum(list_transform(range(1, 9),
                       i -> (sv[i] - c[i]) * (sv[i] - c[i]))) AS d
              FROM subs JOIN cb USING (sub)
            ),
            codes AS (
              SELECT vec_id, sub, code_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                             ORDER BY d, code_id) AS rn
                FROM dsc) WHERE rn = 1
            ),
            lut AS (
              SELECT s.vec_id AS query_id, s.sub, cb.code_id,
                     CAST(floor(list_sum(list_transform(range(1, 9),
                       i -> (s.sv[i] - cb.c[i]) * (s.sv[i] - cb.c[i])))
                       * 1000000) AS BIGINT) AS part_q
              FROM subs s JOIN cb USING (sub)
              WHERE s.vec_id < 10
            ),
            sc AS (
              SELECT query_id, vec_id,
                     CAST(sum(part_q) AS BIGINT) AS adist_q
              FROM codes JOIN lut USING (sub, code_id)
              WHERE vec_id != query_id
              GROUP BY 1, 2
            )
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adist_q, vec_id) AS rank,
                   adist_q
            FROM sc QUALIFY rank <= 5""",
        "pq_rerank": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            seeds AS (
              SELECT e,
                     row_number() OVER (ORDER BY md5(vec_id::VARCHAR),
                                        vec_id) - 1 AS code_id
              FROM v ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
            ),
            cb AS (
              SELECT s.sub, code_id,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS c
              FROM seeds, (SELECT unnest(range(8)) AS sub) s
            ),
            subs AS (
              SELECT vec_id, s.sub,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
              FROM v, (SELECT unnest(range(8)) AS sub) s
            ),
            dsc AS (
              SELECT vec_id, sub, code_id,
                     list_sum(list_transform(range(1, 9),
                       i -> (sv[i] - c[i]) * (sv[i] - c[i]))) AS d
              FROM subs JOIN cb USING (sub)
            ),
            codes AS (
              SELECT vec_id, sub, code_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                             ORDER BY d, code_id) AS rn
                FROM dsc) WHERE rn = 1
            ),
            lut AS (
              SELECT s.vec_id AS query_id, s.sub, cb.code_id,
                     CAST(floor(list_sum(list_transform(range(1, 9),
                       i -> (s.sv[i] - cb.c[i]) * (s.sv[i] - cb.c[i])))
                       * 1000000) AS BIGINT) AS part_q
              FROM subs s JOIN cb USING (sub)
              WHERE s.vec_id < 10
            ),
            sc AS (
              SELECT query_id, vec_id,
                     CAST(sum(part_q) AS BIGINT) AS adist_q
              FROM codes JOIN lut USING (sub, code_id)
              WHERE vec_id != query_id
              GROUP BY 1, 2
            ),
            short AS (
              SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY adist_q, vec_id) AS srn
                FROM sc) WHERE srn <= 100
            ),
            rr AS (
              SELECT s.query_id, s.vec_id,
                     list_cosine_similarity(q.e, c.e) AS cos
              FROM short s
              JOIN v q ON q.vec_id = s.query_id
              JOIN v c ON c.vec_id = s.vec_id
            )
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, vec_id) AS rank,
                   CAST(floor(cos * 1000) AS BIGINT) AS cos_m
            FROM rr QUALIFY rank <= 5""",
        "semdedup": """
            WITH RECURSIVE v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            cent AS (
              SELECT vec_id AS cell_id, e AS ce FROM v
              ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 32
            ),
            asg AS (
              SELECT vec_id, e, cell_id FROM (
                SELECT v.vec_id, v.e, c.cell_id,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY list_cosine_similarity(v.e, c.ce) DESC,
                                  c.cell_id) AS rn
                FROM v CROSS JOIN cent c)
              WHERE rn = 1
            ),
            p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM asg a JOIN asg b
                ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.e, b.e) >= 0.4
            ),
            ed AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p
            ),
            reach AS (
              SELECT DISTINCT src AS id, src AS r FROM ed
              UNION
              SELECT reach.id, ed.dst FROM reach JOIN ed ON reach.r = ed.src
            ),
            comp AS (SELECT id AS vec_id, min(r) AS cid FROM reach GROUP BY 1)
            SELECT asg.vec_id, asg.cell_id,
                   coalesce(comp.cid, asg.vec_id) AS component_id,
                   coalesce(comp.cid, asg.vec_id) = asg.vec_id AS keep
            FROM asg LEFT JOIN comp USING (vec_id)""",
        "lang_id": f"""
            WITH s AS (
              SELECT doc_id,
        {score_cols}
              FROM documents
            )
            SELECT doc_id, {pred_case} AS lang_pred,
                   {", ".join(f"score_{lang}" for lang in langs)}
            FROM s""",
        "quality_score": f"""
            WITH b AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS wc,
                     length(text) AS cc,
                     len(regexp_extract_all(text, '[.,;:!?]')) AS punct,
                     len(regexp_extract_all(lower(text), '{all_stop}')) AS stop,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha
              FROM documents
            )
            SELECT doc_id, wc AS word_count, cc AS char_count,
                   CAST(floor((cc - wc + 1) / greatest(wc, 1) * 10000) AS BIGINT) AS mean_word_len_x1e4,
                   CAST(floor(punct / greatest(cc, 1) * 10000) AS BIGINT) AS punct_ratio_x1e4,
                   CAST(floor(stop / greatest(wc, 1) * 10000) AS BIGINT) AS stop_ratio_x1e4,
                   CAST(floor(alpha / greatest(cc, 1) * 10000) AS BIGINT) AS alpha_ratio_x1e4
            FROM b""",
        "token_count": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
            FROM documents""",
        "doc_fingerprint": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok,
                     generate_subscripts({_TOKS_SQL}, 1) AS pos
              FROM documents
            )
            SELECT doc_id,
                   CAST(sum((({_MD5I48.format(x='tok')} % {P31}) * ((pos * 2654435761) % {P31})) % {P31}) % {P31} AS BIGINT) AS fingerprint
            FROM toks GROUP BY 1""",
        "script_profile": """
            WITH s AS (
              SELECT doc_id,
                     CAST(0 AS BIGINT) AS n_arabic,
                     CAST(doc_id % 5 AS BIGINT) AS n_cyrillic,
                     CAST(doc_id % 3 AS BIGINT) AS n_han,
                     CAST(0 AS BIGINT) AS n_hangul,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]'))
                          AS BIGINT) AS n_latin
              FROM documents
            ),
            g AS (
              SELECT *, greatest(n_arabic, n_cyrillic, n_han, n_hangul,
                                 n_latin) AS best
              FROM s
            )
            SELECT doc_id, n_arabic, n_cyrillic, n_han, n_hangul, n_latin,
                   CASE WHEN best = 0 THEN 'und'
                        WHEN n_arabic = best THEN 'arabic'
                        WHEN n_cyrillic = best THEN 'cyrillic'
                        WHEN n_han = best THEN 'han'
                        WHEN n_hangul = best THEN 'hangul'
                        ELSE 'latin' END AS main_script
            FROM g""",
        "unigram_logprob": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            census AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM census),
            vocab AS (
              SELECT tok,
                     CAST(floor(ln(c / t.t) * 1000000) AS BIGINT) AS qlp
              FROM census, tot t ORDER BY c DESC, tok LIMIT 50000
            ),
            s AS (
              SELECT toks.doc_id,
                     coalesce(v.qlp,
                              CAST(floor(ln(1.0 / t.t) * 1000000) AS BIGINT))
                       AS qlp,
                     CASE WHEN v.qlp IS NULL THEN 1 ELSE 0 END AS oov
              FROM toks LEFT JOIN vocab v USING (tok), tot t
            ),
            a AS (
              SELECT doc_id, count(*) AS n_tokens, sum(oov) AS n_oov,
                     CAST(floor(sum(qlp) / count(*)) AS BIGINT) AS logprob_q
              FROM s GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
                   coalesce(a.logprob_q, 0) AS logprob_q
            FROM documents d LEFT JOIN a USING (doc_id)""",
        "blocklist_filter": """
            WITH bl AS (
              SELECT replace(lower(n_name), ' ', '-') || '.example' AS domain,
                     CASE WHEN n_regionkey % 2 = 0 THEN 'adult'
                          ELSE 'gambling' END AS category
              FROM nation
            ),
            u AS (
              SELECT d.doc_id,
                     CASE d.doc_id % 4
                       WHEN 0 THEN 'https://www.'
                                   || replace(lower(n.n_name), ' ', '-')
                                   || '.example/'
                       WHEN 1 THEN 'https://'
                                   || replace(lower(n.n_name), ' ', '-')
                                   || '.example/page'
                       WHEN 2 THEN 'https://ok' || d.doc_id
                                   || '.org/casino-news'
                       ELSE 'https://ok' || d.doc_id || '.org'
                            || CASE WHEN d.doc_id % 3 = 0
                                    THEN '/free-casino-poker.html'
                                    ELSE '/clean' END
                     END AS url
              FROM documents d
              JOIN nation n ON d.doc_id % 25 = n.n_nationkey
            ),
            h AS (
              SELECT doc_id, url,
                     lower(regexp_extract(
                       url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1))
                       AS host,
                     CAST(len(regexp_extract_all(lower(url), 'casino'))
                        + len(regexp_extract_all(lower(url), 'porn'))
                        + len(regexp_extract_all(lower(url), 'xxx'))
                        + len(regexp_extract_all(lower(url), 'escort'))
                        + len(regexp_extract_all(lower(url), 'poker'))
                        + len(regexp_extract_all(lower(url), 'viagra'))
                        AS BIGINT) AS kw_hits
              FROM u
            ),
            s AS (
              SELECT h.*, string_split(host, '.') AS labels
              FROM h
            ),
            j AS (
              SELECT s.doc_id, s.url, s.host, s.kw_hits,
                     coalesce(b5.domain, b4.domain, b3.domain, b2.domain)
                       AS matched_domain,
                     coalesce(b5.category, b4.category, b3.category,
                              b2.category) AS category
              FROM s
              LEFT JOIN bl b5 ON len(labels) >= 5 AND array_to_string(
                labels[len(labels)-4:len(labels)], '.') = b5.domain
              LEFT JOIN bl b4 ON len(labels) >= 4 AND array_to_string(
                labels[len(labels)-3:len(labels)], '.') = b4.domain
              LEFT JOIN bl b3 ON len(labels) >= 3 AND array_to_string(
                labels[len(labels)-2:len(labels)], '.') = b3.domain
              LEFT JOIN bl b2 ON len(labels) >= 2 AND array_to_string(
                labels[len(labels)-1:len(labels)], '.') = b2.domain
            )
            SELECT doc_id, url, host, kw_hits, matched_domain, category,
                   matched_domain IS NULL AND kw_hits < 2 AS keep
            FROM j""",
        "ccnet_buckets": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            census AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM census),
            vocab AS (
              SELECT tok,
                     CAST(floor(ln(c / t.t) * 1000000) AS BIGINT) AS qlp
              FROM census, tot t ORDER BY c DESC, tok LIMIT 50000
            ),
            s AS (
              SELECT toks.doc_id,
                     coalesce(v.qlp,
                              CAST(floor(ln(1.0 / t.t) * 1000000) AS BIGINT))
                       AS qlp
              FROM toks LEFT JOIN vocab v USING (tok), tot t
            ),
            a AS (
              SELECT doc_id,
                     CAST(floor(sum(qlp) / count(*)) AS BIGINT) AS logprob_q
              FROM s GROUP BY doc_id
            ),
            scored AS (
              SELECT d.doc_id, d.lang, coalesce(a.logprob_q, 0) AS logprob_q
              FROM documents d LEFT JOIN a USING (doc_id)
            ),
            counts AS (
              SELECT lang, logprob_q, count(*) AS c
              FROM scored GROUP BY lang, logprob_q
            ),
            cdf AS (
              SELECT lang, logprob_q, c,
                     sum(c) OVER (PARTITION BY lang ORDER BY logprob_q) AS cum,
                     sum(c) OVER (PARTITION BY lang) AS tot
              FROM counts
            ),
            q AS (
              SELECT lang,
                     min(CASE WHEN 3 * cum >= tot THEN logprob_q END) AS q1,
                     min(CASE WHEN 3 * cum >= 2 * tot THEN logprob_q END) AS q2
              FROM cdf GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.logprob_q, q.q1, q.q2,
                   CASE WHEN s.logprob_q > q.q2 THEN 'head'
                        WHEN s.logprob_q > q.q1 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored s JOIN q USING (lang)""",
        "analyze_stub": f"""
            WITH t AS (SELECT doc_id, substr(text, 1, 4000) AS t4 FROM documents),
            w AS (
              SELECT doc_id, t4,
                     CASE WHEN trim(t4) = '' THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(trim(t4), '\\s+') END AS w
              FROM t
            ),
            x AS (
              SELECT doc_id, w, len(w) AS n,
                     regexp_extract(t4, '(?m)^[^\\S\\n]*#+[^\\S\\n]*(.*?)[^\\S\\n]*$', 1) AS title
              FROM w
            )
            SELECT doc_id,
                   CASE WHEN title <> '' THEN title
                        WHEN n > 0 THEN w[1] ELSE 'unknown' END AS main_topic,
                   CASE WHEN n > 300 THEN 'article'
                        WHEN n > 50 THEN 'page' ELSE 'snippet' END AS content_type,
                   array_to_string(w[1:least(n, 30)], ' ') AS summary,
                   CAST(n % 11 AS BIGINT) AS score_x10
            FROM x""",
        "train_corpus_filter": f"""
            WITH s AS (
              SELECT doc_id, md5(text) AS digest,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS wc,
                     length(text) AS cc,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha,
        {score_cols}
              FROM documents
            ),
            canon AS (SELECT digest, min(doc_id) AS doc_id FROM s GROUP BY digest)
            SELECT s.doc_id, {pred_case} AS lang_pred, wc AS word_count,
                   CAST(floor(alpha / greatest(cc, 1) * 10000) AS BIGINT) AS alpha_x1e4
            FROM s JOIN canon USING (digest, doc_id)
            WHERE {pred_case} = 'en' AND wc >= 50
              AND floor(alpha / greatest(cc, 1) * 10000) >= 6000""",
        "train_corpus_neardup": f"""
            WITH RECURSIVE {_SH64_PAIRS_CTES},
            p AS (
              SELECT id_a, id_b FROM cand
              WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
            ),
            e AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p
            ),
            reach AS (
              SELECT DISTINCT src AS id, src AS r FROM e
              UNION
              SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src
            ),
            comp AS (SELECT id AS doc_id, min(r) AS component_id
                     FROM reach GROUP BY 1),
            s AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS wc,
                     length(text) AS cc,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha,
        {score_cols}
              FROM documents
            )
            SELECT s.doc_id, {pred_case} AS lang_pred, wc AS word_count,
                   CAST(floor(alpha / greatest(cc, 1) * 10000) AS BIGINT) AS alpha_x1e4
            FROM s LEFT JOIN comp ON s.doc_id = comp.doc_id
            WHERE (comp.doc_id IS NULL OR comp.component_id = s.doc_id)
              AND {pred_case} = 'en' AND wc >= 50
              AND floor(alpha / greatest(cc, 1) * 10000) >= 6000""",
        "markdown_extract": """
            WITH c AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(text, '[<>&]', '', 'g'),
                                         '\s+', ' ', 'g')) AS body
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     '# Doc ' || doc_id
                     || CASE WHEN body <> '' THEN chr(10) || body ELSE '' END
                     || chr(10) || '[next ' || doc_id || '](https://md.test/next/'
                     || doc_id || ')' AS markdown
              FROM c
            )
            SELECT doc_id, markdown,
                   CAST(len(string_split(markdown, chr(10))) AS BIGINT) AS n_blocks
            FROM m""",
        "anchor_census": """
            WITH p AS (
              SELECT 'https://anchors.test/d/' || (doc_id % 97)
                       AS target_url,
                     'go ' || (doc_id % 97) AS anchor
              FROM documents
              UNION ALL
              SELECT 'https://anchors.test/d/' || ((doc_id * 31 + 7) % 97),
                     'see ' || ((doc_id * 31 + 7) % 97)
              FROM documents
            ),
            c AS (
              SELECT target_url, anchor, CAST(count(*) AS BIGINT) AS n
              FROM p GROUP BY 1, 2
            )
            SELECT target_url, anchor, n,
                   row_number() OVER (PARTITION BY target_url
                                      ORDER BY n DESC, anchor) AS rank
            FROM c QUALIFY rank <= 3""",
        "train_corpus_gopher": f"""
            WITH tk AS (
              SELECT doc_id, text,
                     CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE {_TOKS_SQL} END AS toks,
                     string_split(text, chr(10)) AS lines
              FROM documents
            ),
            f AS (
              SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS word_count,
                CAST(floor(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                     * 100 / greatest(len(toks), 1)) AS BIGINT) AS mean_word_len_x100,
                CAST(floor(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                     * 10000 / greatest(len(toks), 1)) AS BIGINT) AS symbol_word_ratio_x1e4,
                CAST(floor(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))
                     * 10000 / greatest(len(lines), 1)) AS BIGINT) AS bullet_line_frac_x1e4,
                CAST(floor(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                     * 10000 / greatest(len(lines), 1)) AS BIGINT) AS ellipsis_line_frac_x1e4,
                CAST(floor(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                     * 10000 / greatest(len(toks), 1)) AS BIGINT) AS alpha_word_frac_x1e4,
                CAST({gopher_stop_sql} AS BIGINT) AS n_gopher_stopwords,
                CAST(CASE WHEN len(lines) > 0
                     THEN floor((len(lines) - len(list_distinct(lines))) * 10000 / len(lines))
                     ELSE 0 END AS BIGINT) AS dup_line_frac_x1e4
              FROM tk
            )
            SELECT * FROM f
            WHERE word_count BETWEEN 50 AND 100000
              AND mean_word_len_x100 BETWEEN 300 AND 1000
              AND symbol_word_ratio_x1e4 BETWEEN 0 AND 1000
              AND bullet_line_frac_x1e4 BETWEEN 0 AND 9000
              AND ellipsis_line_frac_x1e4 BETWEEN 0 AND 3000
              AND alpha_word_frac_x1e4 BETWEEN 8000 AND 10000
              AND n_gopher_stopwords BETWEEN 2 AND 8
              AND dup_line_frac_x1e4 BETWEEN 0 AND 3000""",
        "train_corpus_neardup_minhash": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            {_minhash_params_sql()},
            x AS (SELECT doc_id, {_MD5I48.format(x='shingle')} % {P31} AS x FROM ds),
            sig AS (
              SELECT doc_id, i, min((a * x + b) % {P31}) AS mh
              FROM x CROSS JOIN params GROUP BY 1, 2
            ),
            band AS (
              SELECT doc_id, i // {DD.LSH_ROWS} AS band,
                     md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS band_key
              FROM sig GROUP BY 1, 2
            ),
            p AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM band a
              JOIN band b ON a.band = b.band AND a.band_key = b.band_key
                          AND a.doc_id < b.doc_id
            ),
            e AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p
            ),
            reach AS (
              SELECT DISTINCT src AS id, src AS r FROM e
              UNION
              SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src
            ),
            comp AS (SELECT id AS doc_id, min(r) AS component_id
                     FROM reach GROUP BY 1),
            s AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS wc,
                     length(text) AS cc,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha,
        {score_cols}
              FROM documents
            )
            SELECT s.doc_id, {pred_case} AS lang_pred, wc AS word_count,
                   CAST(floor(alpha / greatest(cc, 1) * 10000) AS BIGINT) AS alpha_x1e4
            FROM s LEFT JOIN comp ON s.doc_id = comp.doc_id
            WHERE (comp.doc_id IS NULL OR comp.component_id = s.doc_id)
              AND {pred_case} = 'en' AND wc >= 50
              AND floor(alpha / greatest(cc, 1) * 10000) >= 6000""",
        "stream_dedup": """
            SELECT DISTINCT 'https://docs.test/' || (doc_id % 97) AS url
            FROM documents""",
        "image_neardup": """
            WITH base AS (
              SELECT doc_id,
                     text || '|' || CAST(doc_id AS VARCHAR) AS s
              FROM documents
            ),
            m AS (
              SELECT doc_id * 2 AS media_id, s FROM base
              UNION ALL
              SELECT doc_id * 2 + 1,
                     substr(s, 1, 20) || '~' || substr(s, 22)
              FROM base
            ),
            b AS (SELECT media_id, s, strlen(s) AS n FROM m),
            h AS (
              SELECT media_id,
                     CAST(coalesce(list_sum(list_transform(range(32, 64),
                       j -> CASE WHEN ascii(substr(s, CAST(j % n AS INT) + 1, 1))
                                 > ascii(substr(s, CAST((j+1) % n AS INT) + 1, 1))
                            THEN CAST(1 AS BIGINT) << (j - 32)
                            ELSE 0 END)), 0) AS BIGINT) AS hi,
                     CAST(coalesce(list_sum(list_transform(range(0, 32),
                       j -> CASE WHEN ascii(substr(s, CAST(j % n AS INT) + 1, 1))
                                 > ascii(substr(s, CAST((j+1) % n AS INT) + 1, 1))
                            THEN CAST(1 AS BIGINT) << j
                            ELSE 0 END)), 0) AS BIGINT) AS lo
              FROM b
            )
            SELECT a.media_id AS id_a, c.media_id AS id_b,
                   CAST(bit_count(xor(a.hi, c.hi))
                        + bit_count(xor(a.lo, c.lo)) AS BIGINT) AS hamming
            FROM h a JOIN h c ON a.media_id < c.media_id
            WHERE bit_count(xor(a.hi, c.hi))
                  + bit_count(xor(a.lo, c.lo)) <= 3""",
        "image_dhash": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     text || '|' || CAST(doc_id AS VARCHAR) AS s
              FROM documents
            ),
            b AS (SELECT media_id, s, strlen(s) AS n FROM m)
            SELECT media_id,
                   CAST(n AS BIGINT) AS n_bytes,
                   CAST(coalesce(list_sum(list_transform(range(32, 64),
                     j -> CASE WHEN ascii(substr(s, CAST(j % n AS INT) + 1, 1))
                               > ascii(substr(s, CAST((j+1) % n AS INT) + 1, 1))
                          THEN CAST(1 AS BIGINT) << (j - 32)
                          ELSE 0 END)), 0) AS BIGINT) AS dhash_hi,
                   CAST(coalesce(list_sum(list_transform(range(0, 32),
                     j -> CASE WHEN ascii(substr(s, CAST(j % n AS INT) + 1, 1))
                               > ascii(substr(s, CAST((j+1) % n AS INT) + 1, 1))
                          THEN CAST(1 AS BIGINT) << j
                          ELSE 0 END)), 0) AS BIGINT) AS dhash_lo
            FROM b""",
        "multimodal_meta": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     octet_length(encode(text || '|' || doc_id::VARCHAR)) AS n
              FROM documents
            )
            SELECT media_id, n AS n_bytes,
                   16 + n % 240 AS width,
                   16 + (n // 7) % 240 AS height,
                   1 + n % 3 AS channels
            FROM m""",
        "audio_chunks": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     octet_length(encode(text || '|' || doc_id::VARCHAR)) AS n
              FROM documents
            ),
            a AS (
              SELECT media_id,
                     (4 * n * 1000) // (8000 * (1 + n % 6)) AS dur
              FROM m
            ),
            c AS (
              SELECT media_id, dur,
                     greatest(CAST(ceil(dur / 25.0) AS INT), 1) AS n_chunks
              FROM a
            )
            SELECT media_id,
                   unnest(generate_series(0, n_chunks - 1)) AS chunk_index,
                   unnest(generate_series(0, n_chunks - 1)) * CAST(25 AS BIGINT)
                     AS start_ms,
                   least((unnest(generate_series(0, n_chunks - 1)) + 1) * 25,
                         dur)::BIGINT AS end_ms
            FROM c""",
        "corpus_split": """
            WITH b AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 12) AS BIGINT)
                       % 10000 AS bucket
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN bucket < 9000 THEN 'train'
                        WHEN bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split,
                   bucket
            FROM b""",
        "corpus_sample": """
            WITH s AS (
              SELECT doc_id, source,
                     CAST('0x' || substr(md5('s42:' || doc_id::VARCHAR), 1, 12)
                          AS BIGINT) % 10000 AS sample_key,
                     CASE source WHEN 'src0' THEN 2500
                                 WHEN 'src1' THEN 7500
                                 ELSE 5000 END AS t
              FROM documents
            )
            SELECT doc_id, source, sample_key FROM s WHERE sample_key < t""",
        "mix_report": """
            WITH s AS (
              SELECT source,
                     CAST('0x' || substr(md5('s42:' || doc_id::VARCHAR), 1, 12)
                          AS BIGINT) % 10000 AS skey,
                     CASE source WHEN 'src0' THEN 2500
                                 WHEN 'src1' THEN 7500
                                 ELSE 5000 END AS t,
                     CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 12) AS BIGINT)
                       % 10000 AS bucket,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS w,
                     length(text) AS c
              FROM documents
            )
            SELECT source,
                   CASE WHEN bucket < 9000 THEN 'train'
                        WHEN bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS n_tokens,
                   CAST(sum(c) AS BIGINT) AS n_chars
            FROM s WHERE skey < t GROUP BY 1, 2""",
        "mix_plan": """
            WITH c AS (
              SELECT source,
                     CAST(sum(CASE WHEN trim(text) = '' THEN 0
                              ELSE len(regexp_split_to_array(trim(text),
                                                             '\\s+'))
                              END) AS BIGINT) AS n_tokens,
                     CAST(CASE source WHEN 'src0' THEN 3
                                      WHEN 'src1' THEN 2
                                      ELSE 1 END AS BIGINT) AS weight
              FROM documents GROUP BY source
            ),
            star AS (
              SELECT n_tokens AS t_star, weight AS w_star
              FROM c WHERE weight > 0 AND n_tokens > 0
              ORDER BY CAST(n_tokens AS DOUBLE) / weight, source LIMIT 1
            ),
            r AS (
              SELECT c.source, c.n_tokens, c.weight,
                     CASE WHEN c.weight > 0 AND c.n_tokens > 0 THEN
                       CAST((10000::HUGEINT * s.t_star * c.weight)
                            // greatest(s.w_star::HUGEINT * c.n_tokens, 1)
                            AS BIGINT)
                     ELSE 0 END AS rate_bp
              FROM c, star s
            )
            SELECT source, n_tokens, weight, rate_bp,
                   CAST((n_tokens * rate_bp) // 10000 AS BIGINT)
                     AS planned_tokens
            FROM r""",
        "incremental_dedup": f"""
            WITH {_SHINGLES_CTE},
            {_minhash_params_sql()},
            x AS (SELECT doc_id, {_MD5I48.format(x='shingle')} % {P31} AS x FROM ds),
            sig AS (
              SELECT doc_id, i, min((a * x + b) % {P31}) AS mh
              FROM x CROSS JOIN params GROUP BY 1, 2
            ),
            band AS (
              SELECT doc_id, i // {DD.LSH_ROWS} AS band,
                     md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS band_key
              FROM sig GROUP BY 1, 2
            ),
            bk AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 12) AS BIGINT)
                       % 10000 AS bucket
              FROM documents
            ),
            old_digest AS (
              SELECT DISTINCT md5(d.text) AS dg
              FROM documents d JOIN bk USING (doc_id) WHERE bucket < 8000
            ),
            old_band AS (
              SELECT DISTINCT b.band, b.band_key
              FROM band b JOIN bk USING (doc_id) WHERE bucket < 8000
            ),
            newd AS (
              SELECT d.doc_id, md5(d.text) AS dg
              FROM documents d JOIN bk USING (doc_id) WHERE bucket >= 8000
            ),
            ex AS (
              SELECT doc_id FROM newd WHERE dg IN (SELECT dg FROM old_digest)
            ),
            nr AS (
              SELECT DISTINCT b.doc_id
              FROM band b
              JOIN bk USING (doc_id)
              JOIN old_band ob ON b.band = ob.band AND b.band_key = ob.band_key
              WHERE bk.bucket >= 8000
            )
            SELECT n.doc_id,
                   n.doc_id IN (SELECT doc_id FROM ex) AS exact_dup,
                   n.doc_id IN (SELECT doc_id FROM nr) AS near_dup,
                   NOT (n.doc_id IN (SELECT doc_id FROM ex)
                        OR n.doc_id IN (SELECT doc_id FROM nr)) AS keep
            FROM newd n""",
        "url_strip_tracking": """
            WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.example.com/p/' || doc_id
                       AS base,
                     doc_id % 3 AS shape, doc_id % 7 AS s7
              FROM documents
            ),
            built AS (
              SELECT doc_id,
                     CASE shape
                       WHEN 0 THEN base
                       WHEN 1 THEN base || '?id=' || doc_id
                                 || '&utm_source=s' || s7
                                 || '&page=2&gclid=g' || doc_id
                       ELSE base || '?utm_campaign=c&fbclid=f' || doc_id
                     END AS url
              FROM u
            ),
            s AS (
              SELECT doc_id, url,
                     substr(url, 1,
                            CASE WHEN instr(url, '?') > 0
                                 THEN instr(url, '?') - 1
                                 ELSE length(url) END) AS base,
                     list_filter(
                       string_split(regexp_extract(url, '\\?(.*)', 1), '&'),
                       p -> length(p) > 0 AND NOT regexp_matches(p,
                         '^(utm_[^=&]*|fbclid|gclid|msclkid)(=|$)')
                     ) AS kept
              FROM built
            )
            SELECT doc_id, url,
                   CASE WHEN instr(url, '?') > 0 AND len(kept) > 0
                        THEN base || '?' || array_to_string(kept, '&')
                        ELSE base END AS clean_url
            FROM s""",
        "shard_manifest": """
            WITH t AS (
              SELECT doc_id, text,
                     CAST('0x' || substr(md5('p42:' || doc_id::VARCHAR), 1, 12)
                          AS BIGINT) AS okey,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_tokens
              FROM documents
            ),
            o AS (
              SELECT doc_id, text, okey % 8 AS writer, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY okey % 8 ORDER BY okey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS offset_tokens
              FROM t
            )
            SELECT writer * 1048576 + offset_tokens // 2048 AS shard_id,
                   writer,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(sum(CAST('0x' || substr(md5(text), 1, 12) AS BIGINT)
                            % 2147483647) % 2147483647 AS BIGINT)
                     AS content_digest
            FROM o GROUP BY 1, 2""",
        "error_backoff": """
            WITH f AS (
              SELECT 'h' || (user_id % 37) AS host,
                     CAST(sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_failures
              FROM events GROUP BY 1
            )
            SELECT host, n_failures,
                   CAST(greatest(1, 1024 >> least(n_failures, 6))
                        AS BIGINT) AS budget
            FROM f""",
        "corpus_diff": """
            WITH b AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 12) AS BIGINT)
                       % 10000 AS bucket
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN bucket < 2000 THEN 'removed'
                        WHEN bucket < 6000 THEN 'same'
                        WHEN bucket < 8000 THEN 'changed'
                        ELSE 'added' END AS status
            FROM b""",
        "pack_examples": """
            WITH t AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5('p42:' || doc_id::VARCHAR), 1, 12)
                          AS BIGINT) AS okey,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_tokens
              FROM documents
            ),
            o AS (
              SELECT doc_id, okey % 8 AS writer, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY okey % 8 ORDER BY okey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS off
              FROM t
            ),
            s AS (
              SELECT doc_id, writer, n_tokens, off,
                     unnest(generate_series(off // 512,
                                            (off + n_tokens - 1) // 512))
                       AS ex
              FROM o WHERE n_tokens > 0
            )
            SELECT doc_id, writer,
                   CAST(writer * 1048576 + ex AS BIGINT) AS example_id,
                   CAST(greatest(ex * 512 - off, 0) AS BIGINT)
                     AS start_in_doc,
                   CAST(least((ex + 1) * 512, off + n_tokens)
                        - greatest(ex * 512, off) AS BIGINT)
                     AS n_in_example
            FROM s""",
        "pack_shards": """
            WITH t AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5('p42:' || doc_id::VARCHAR), 1, 12)
                          AS BIGINT) AS okey,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_tokens
              FROM documents
            ),
            o AS (
              SELECT doc_id, okey % 8 AS writer, okey, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY okey % 8 ORDER BY okey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS offset_tokens
              FROM t
            )
            SELECT doc_id, writer,
                   writer * 1048576 + offset_tokens // 2048 AS shard_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   offset_tokens
            FROM o""",
        "train_corpus_full": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            {_minhash_params_sql()},
            bk AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 12) AS BIGINT)
                       % 10000 AS bucket
              FROM documents
            ),
            x AS (SELECT doc_id, {_MD5I48.format(x='shingle')} % {P31} AS x FROM ds),
            sig AS (
              SELECT doc_id, i, min((a * x + b) % {P31}) AS mh
              FROM x CROSS JOIN params GROUP BY 1, 2
            ),
            band AS (
              SELECT doc_id, i // {DD.LSH_ROWS} AS band,
                     md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS band_key
              FROM sig GROUP BY 1, 2
            ),
            p AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM band a
              JOIN band b ON a.band = b.band AND a.band_key = b.band_key
                          AND a.doc_id < b.doc_id
              JOIN bk ka ON ka.doc_id = a.doc_id
              JOIN bk kb ON kb.doc_id = b.doc_id
              WHERE ka.bucket < 9000 AND kb.bucket < 9000
            ),
            e AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p
            ),
            reach AS (
              SELECT DISTINCT src AS id, src AS r FROM e
              UNION
              SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src
            ),
            comp AS (SELECT id AS doc_id, min(r) AS component_id
                     FROM reach GROUP BY 1),
            tk AS (
              SELECT doc_id, text,
                     CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE {_TOKS_SQL} END AS toks,
                     string_split(text, chr(10)) AS lines
              FROM documents
            ),
            f AS (
              SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS word_count,
                CAST(floor(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                     * 100 / greatest(len(toks), 1)) AS BIGINT) AS mean_word_len_x100,
                CAST(floor(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                     * 10000 / greatest(len(toks), 1)) AS BIGINT) AS symbol_word_ratio_x1e4,
                CAST(floor(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))
                     * 10000 / greatest(len(lines), 1)) AS BIGINT) AS bullet_line_frac_x1e4,
                CAST(floor(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                     * 10000 / greatest(len(lines), 1)) AS BIGINT) AS ellipsis_line_frac_x1e4,
                CAST(floor(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                     * 10000 / greatest(len(toks), 1)) AS BIGINT) AS alpha_word_frac_x1e4,
                CAST({gopher_stop_sql} AS BIGINT) AS n_gopher_stopwords,
                CAST(CASE WHEN len(lines) > 0
                     THEN floor((len(lines) - len(list_distinct(lines))) * 10000 / len(lines))
                     ELSE 0 END AS BIGINT) AS dup_line_frac_x1e4
              FROM tk
            ),
            gf AS (
              SELECT doc_id,
                     (word_count BETWEEN 50 AND 100000
                      AND mean_word_len_x100 BETWEEN 300 AND 1000
                      AND symbol_word_ratio_x1e4 BETWEEN 0 AND 1000
                      AND bullet_line_frac_x1e4 BETWEEN 0 AND 9000
                      AND ellipsis_line_frac_x1e4 BETWEEN 0 AND 3000
                      AND alpha_word_frac_x1e4 BETWEEN 8000 AND 10000
                      AND n_gopher_stopwords BETWEEN 2 AND 8
                      AND dup_line_frac_x1e4 BETWEEN 0 AND 3000) AS keep_gopher
              FROM f
            ),
            qq AS (
              SELECT doc_id, source,
                     CAST(5 * floor(alpha / greatest(cc, 1) * 10000)
                        + 3 * least(floor(stop / greatest(wc, 1) * 10000) * 5, 10000)
                        + 2 * least(wc * 100, 10000) AS BIGINT) AS quality
              FROM (
                SELECT d.doc_id, d.source,
                       CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS wc,
                       length(text) AS cc,
                       len(regexp_extract_all(lower(text), '{all_stop}')) AS stop,
                       len(regexp_extract_all(text, '[A-Za-z]')) AS alpha
                FROM documents d JOIN bk USING (doc_id) WHERE bucket < 9000
              )
            ),
            qt AS (
              SELECT source, quantile_cont(quality, 0.5) AS thr
              FROM qq GROUP BY source
            ),
            qgate AS (
              SELECT qq.doc_id, qq.quality >= qt.thr AS keep_quantile
              FROM qq JOIN qt USING (source)
            ),
            db AS (
              SELECT d.doc_id, bk.bucket, {_TOKS_SQL} AS t
              FROM documents d JOIN bk USING (doc_id)
            ),
            grams AS (
              SELECT doc_id, bucket,
                     unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
                                           i -> array_to_string(t[i:i+7], ' '))) AS gram
              FROM db
            ),
            bench AS (SELECT DISTINCT gram FROM grams WHERE bucket >= 9000),
            hits AS (
              SELECT doc_id, count(DISTINCT gram) AS n
              FROM grams
              WHERE bucket < 9000 AND gram IN (SELECT gram FROM bench)
              GROUP BY 1
            ),
            lmt AS (
              SELECT d.doc_id, unnest({_TOKS_SQL}) AS tok
              FROM documents d JOIN bk USING (doc_id) WHERE bucket < 9000
            ),
            lmc AS (SELECT tok, count(*) AS c FROM lmt GROUP BY tok),
            lmtot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM lmc),
            lmv AS (
              SELECT tok, CAST(floor(ln(c / t.t) * 1000000) AS BIGINT) AS qlp
              FROM lmc, lmtot t
            ),
            lms AS (
              SELECT lmt.doc_id,
                     coalesce(v.qlp,
                              CAST(floor(ln(1.0 / t.t) * 1000000) AS BIGINT))
                       AS qlp
              FROM lmt LEFT JOIN lmv v USING (tok), lmtot t
            ),
            lma AS (
              SELECT doc_id, CAST(floor(sum(qlp) / count(*)) AS BIGINT) AS lp
              FROM lms GROUP BY doc_id
            )
            SELECT d.doc_id,
                   (comp.doc_id IS NULL OR comp.component_id = d.doc_id)
                     AS keep_canonical,
                   gf.keep_gopher,
                   qgate.keep_quantile,
                   coalesce(hits.n, 0) = 0 AS keep_decontam,
                   coalesce(lma.lp, 0) >= -3410000 AS keep_lm,
                   ((comp.doc_id IS NULL OR comp.component_id = d.doc_id)
                    AND gf.keep_gopher AND qgate.keep_quantile
                    AND coalesce(hits.n, 0) = 0
                    AND coalesce(lma.lp, 0) >= -3410000) AS keep
            FROM documents d
            JOIN bk USING (doc_id)
            LEFT JOIN comp USING (doc_id)
            JOIN gf USING (doc_id)
            JOIN qgate USING (doc_id)
            LEFT JOIN hits USING (doc_id)
            LEFT JOIN lma USING (doc_id)
            WHERE bk.bucket < 9000""",
        "host_rank": _host_rank_sql(3),
        "trust_rank": _trust_rank_sql(3),
        "spam_mass": _spam_mass_sql(3),
        "host_language_mix": """
        WITH c AS (
          SELECT source AS host, lang, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY source, lang
        ),
        r AS (
          SELECT host, CAST(sum(n) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_langs
          FROM c GROUP BY host
        ),
        t AS (
          SELECT host, lang AS top_lang, n AS top_n,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY n DESC, lang) AS rn
          FROM c QUALIFY rn = 1
        ),
        e AS (
          SELECT c.host,
                 CAST(sum(c.n * CAST(floor(ln(r.n_docs::DOUBLE / c.n)
                                           * 1000000) AS BIGINT))
                      // any_value(r.n_docs) AS BIGINT)
                   AS lang_entropy_micro
          FROM c JOIN r USING (host) GROUP BY c.host
        )
        SELECT r.host, r.n_docs, r.n_langs, t.top_lang,
               CAST(10000 * t.top_n // r.n_docs AS BIGINT) AS top_share_bp,
               e.lang_entropy_micro
        FROM r JOIN t USING (host) JOIN e USING (host)""",
        "reciprocal_links": f"""
        WITH p AS (
          SELECT DISTINCT
                 CASE WHEN doc_id % 7 = 0
                      THEN CASE WHEN (doc_id // 7) % 2 = 0
                                THEN 'rA' ELSE 'rB' END
                      ELSE 'h' || (doc_id % 37)::VARCHAR END AS a,
                 CASE WHEN doc_id % 7 = 0
                      THEN CASE WHEN (doc_id // 7) % 2 = 0
                                THEN 'rB' ELSE 'rA' END
                      ELSE 'h' || ({_MD5I48.format(x="doc_id::VARCHAR")}
                                   % 37)::VARCHAR END AS b
          FROM documents
        ),
        pp AS (SELECT a, b FROM p WHERE a != b),
        r AS (
          SELECT pp.a, pp.b FROM pp
          WHERE EXISTS (SELECT 1 FROM pp q
                        WHERE q.a = pp.b AND q.b = pp.a)
        ),
        o AS (SELECT a, CAST(count(*) AS BIGINT) AS out_hosts
              FROM pp GROUP BY a),
        rc AS (SELECT a, CAST(count(*) AS BIGINT) AS reciprocal_hosts
               FROM r GROUP BY a)
        SELECT o.a AS host, o.out_hosts,
               CAST(COALESCE(rc.reciprocal_hosts, 0) AS BIGINT)
                 AS reciprocal_hosts,
               CAST(10000 * COALESCE(rc.reciprocal_hosts, 0) // o.out_hosts
                    AS BIGINT) AS reciprocal_bp
        FROM o LEFT JOIN rc ON rc.a = o.a""",
        "sessionize": _SESSIONIZE_SQL + """
            SELECT event_id, user_id, ts,
                   CAST(user_id * 1048576 + seq - 1 AS BIGINT) AS session_id,
                   st = 1 AS is_session_start
            FROM x""",
        "session_stats": _SESSIONIZE_SQL + """
            SELECT CAST(user_id * 1048576 + seq - 1 AS BIGINT) AS session_id,
                   user_id, count(*) AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts,
                   date_diff('second', min(ts), max(ts)) AS duration_s
            FROM x GROUP BY 1, 2""",
        "top_ngrams": f"""
            WITH g AS (
              SELECT source, doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                           i -> array_to_string(t[i:i+2], ' '))) AS gram
              FROM (SELECT source, doc_id, {_TOKS_SQL} AS t FROM documents)
            ),
            c AS (
              SELECT source, gram, CAST(count(*) AS BIGINT) AS n_total,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM g GROUP BY 1, 2
            )
            SELECT source, gram, n_total, n_docs,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_docs DESC, n_total DESC, gram)
                     AS rank
            FROM c QUALIFY rank <= 10""",
        "doc_keywords": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
            ),
            df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            s AS (
              SELECT tf.doc_id, tf.tok, tf.tf,
                     CAST(floor(ln(n.n / df.df) * 1000000) AS BIGINT) AS idf_u
              FROM tf JOIN df USING (tok) CROSS JOIN n
            )
            SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, idf_u,
                   CAST(tf * idf_u AS BIGINT) AS score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tf * idf_u DESC, tok) AS rank
            FROM s QUALIFY rank <= 5""",
        "surt_key": """
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://'
                         ELSE 'http://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || source || '.Example.org'
                   || (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END)
                   || '/D/' || (doc_id % 7) || '/Page-' || doc_id
                   || (CASE WHEN doc_id % 4 = 0 THEN '?B=2&a=1' ELSE '' END)
                   || (CASE WHEN doc_id % 6 = 0 THEN '#Sec' ELSE '' END)
                     AS url,
                   'org,example,' || lower(source) || ')/d/'
                   || (doc_id % 7) || '/page-' || doc_id
                   || (CASE WHEN doc_id % 4 = 0 THEN '?b=2&a=1' ELSE '' END)
                     AS surt
            FROM documents""",
        "fix_mojibake": """
            SELECT doc_id,
                   text || ' café — '
                        || repeat('я', CAST(doc_id % 3 AS INT)) AS fixed,
                   true AS was_mangled
            FROM documents""",
        "quality_classifier": f"""
            SELECT doc_id,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                   CAST(list_sum(list_transform({_TOKS_SQL},
                        t -> (({_MD5I48.format(x='t')} % 65536)
                              * 2654435761) % {P31} % 2001 - 1000))
                        AS BIGINT) AS score_int,
                   CAST(list_sum(list_transform({_TOKS_SQL},
                        t -> (({_MD5I48.format(x='t')} % 65536)
                              * 2654435761) % {P31} % 2001 - 1000))
                        AS BIGINT) >= 0 AS keep
            FROM documents""",
        "c4_clean": f"""
            WITH w AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok,
                     unnest(range(1, len({_TOKS_SQL}) + 1)) AS i
              FROM documents
            ),
            chunk AS (
              SELECT doc_id, CAST((i - 1) // 8 + 1 AS INT) AS pos,
                     string_agg(tok, ' ' ORDER BY i) AS ln
              FROM w GROUP BY doc_id, (i - 1) // 8
            ),
            punct AS (
              SELECT doc_id, pos,
                     ln || CASE (pos + doc_id) % 4
                             WHEN 0 THEN '.'
                             WHEN 1 THEN '!'
                             WHEN 2 THEN '?"'
                             ELSE '' END AS ln
              FROM chunk
            ),
            body AS (
              SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS t
              FROM punct GROUP BY doc_id
            ),
            txt AS (
              SELECT d.doc_id,
                     b.t
                     || CASE WHEN d.doc_id % 5 = 0 THEN chr(10) ||
                        'please enable javascript to continue.'
                        ELSE '' END
                     || CASE WHEN d.doc_id % 11 = 0 THEN chr(10) ||
                        'this site uses cookies for analytics.'
                        ELSE '' END
                     || CASE WHEN d.doc_id % 13 = 0 THEN chr(10) ||
                        'if (x) {{ return; }}' ELSE '' END
                     || CASE WHEN d.doc_id % 17 = 0 THEN chr(10) ||
                        'Lorem ipsum dolor sit amet, consectetur adipiscing elit.'
                        ELSE '' END AS text
              FROM documents d JOIN body b USING (doc_id)
            ),
            k AS (
              SELECT doc_id, text,
                     string_split(text, chr(10)) AS lines,
                     list_filter(string_split(text, chr(10)), x ->
                       regexp_matches(x, '[.!?]["'']?\\s*$')
                       AND len(regexp_split_to_array(trim(x), '\\s+')) >= 3
                       AND NOT contains(lower(x), 'javascript')
                       AND NOT contains(lower(x), 'cookie policy')
                       AND NOT contains(lower(x), 'privacy policy')
                       AND NOT contains(lower(x), 'terms of use')
                       AND NOT contains(lower(x), 'uses cookies')) AS kept
              FROM txt
            )
            SELECT doc_id,
                   coalesce(array_to_string(kept, chr(10)), '')
                     AS clean_text,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   CAST(len(lines) - len(kept) AS BIGINT) AS n_removed,
                   len(kept) >= 3 AND NOT contains(text, '{{')
                     AND NOT contains(lower(text), 'lorem ipsum') AS keep
            FROM k""",
        "boilerplate_lines": f"""
            WITH w AS (
              SELECT doc_id, source, unnest({_TOKS_SQL}) AS tok,
                     unnest(range(1, len({_TOKS_SQL}) + 1)) AS i
              FROM documents
            ),
            chunk AS (
              SELECT doc_id, source, CAST((i - 1) // 8 + 1 AS INT) AS pos,
                     string_agg(tok, ' ' ORDER BY i) AS ln
              FROM w GROUP BY doc_id, source, (i - 1) // 8
            ),
            maxp AS (SELECT doc_id, max(pos) AS mp FROM chunk GROUP BY doc_id),
            l AS (
              SELECT doc_id, source, 0 AS pos,
                     'Home | About | ' || source AS ln
              FROM documents
              UNION ALL
              SELECT doc_id, source, pos, ln FROM chunk
              UNION ALL
              SELECT d.doc_id, d.source, m.mp + 1 AS pos, 'Promo day' AS ln
              FROM documents d JOIN maxp m USING (doc_id)
              WHERE d.doc_id % 2 = 0
            ),
            nd AS (SELECT source, count(*) AS n FROM documents
                   GROUP BY source),
            c AS (
              SELECT source, ln, count(DISTINCT doc_id) AS cnt
              FROM l GROUP BY source, ln
            ),
            bp AS (
              SELECT c.source, c.ln FROM c JOIN nd USING (source)
              WHERE cnt >= 2 AND cnt >= 0.5 * n
            ),
            k AS (
              SELECT l.doc_id, count(*) AS n_kept,
                     string_agg(l.ln, chr(10) ORDER BY l.pos) AS clean_text
              FROM l ANTI JOIN bp
                ON l.source = bp.source AND l.ln = bp.ln
              GROUP BY l.doc_id
            ),
            tot AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id)
            SELECT t.doc_id,
                   coalesce(k.clean_text, '') AS clean_text,
                   CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(t.n - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
            FROM tot t LEFT JOIN k USING (doc_id)""",
        "url_trap_filter": """
            WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.example.org'
                       || repeat('/sec/cal', doc_id % 6) || '/page'
                       || CASE WHEN doc_id % 3 = 0
                               THEN '?a=1' || repeat('&b=2', doc_id % 12)
                               ELSE '' END AS url
              FROM documents
            ),
            p AS (
              SELECT doc_id,
                     regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path,
                     regexp_extract(url, '\\?([^#]*)', 1) AS q
              FROM u
            ),
            s AS (
              SELECT doc_id, path, q,
                     list_filter(string_split(path, '/'), x -> x != '') AS segs
              FROM p
            ),
            f AS (
              SELECT doc_id,
                     CAST(len(segs) AS BIGINT) AS path_depth,
                     CAST(CASE WHEN len(segs) > 0
                               THEN list_max(list_transform(segs,
                                      s2 -> len(list_filter(segs, x -> x = s2))))
                               ELSE 0 END AS BIGINT) AS max_seg_repeat,
                     CAST(CASE WHEN q != '' THEN len(string_split(q, '&'))
                               ELSE 0 END AS BIGINT) AS n_params,
                     CAST(length(path) AS BIGINT) AS path_len
              FROM s
            )
            SELECT doc_id, path_depth, max_seg_repeat, n_params, path_len,
                   (max_seg_repeat >= 3 OR path_depth > 12
                    OR n_params > 8 OR path_len > 200) AS trap
            FROM f""",
        "canonical_dedup": """
            WITH u AS (
              SELECT doc_id,
                     'https://canon.test/d/' || doc_id::VARCHAR AS self,
                     'https://canon.test/d/'
                       || (doc_id - doc_id % 3)::VARCHAR AS canon
              FROM documents
            ),
            e AS (
              SELECT CASE WHEN doc_id % 3 = 0 THEN self ELSE canon END
                       AS canonical_url,
                     self AS url
              FROM u
            )
            SELECT canonical_url, min(url) AS keeper_url,
                   count(*) AS n_pages
            FROM e GROUP BY 1""",
        "sitemap_lastmod": """
            WITH x AS (
              SELECT doc_id,
                     'https://' || source || '.example.org' AS base,
                     doc_id % 7 + 1 AS n
              FROM documents
            ),
            xml AS (
              SELECT doc_id, base,
                     '<urlset>' || chr(10) || array_to_string(
                       list_transform(range(1, n + 1), i ->
                         '<url><loc> ' || base || '/d/'
                         || CAST(doc_id AS VARCHAR) || '/'
                         || CAST(i AS VARCHAR) || ' </loc>'
                         || CASE WHEN (doc_id + i) % 3 != 0
                            THEN '<lastmod>2024-01-'
                                 || lpad(CAST((doc_id + i) % 28 + 1
                                              AS VARCHAR), 2, '0')
                                 || '</lastmod>' ELSE '' END
                         || CASE WHEN (doc_id + i) % 4 != 0
                            THEN '<priority>0.'
                                 || CAST(i % 10 AS VARCHAR)
                                 || '</priority>' ELSE '' END
                         || '</url>'), chr(10))
                     || chr(10) || '</urlset>' AS body
              FROM x
            ),
            blocks AS (
              SELECT base || '/sitemap-' || CAST(doc_id AS VARCHAR)
                       || '.xml' AS sitemap_url,
                     unnest(regexp_extract_all(
                       body, '(?s)<url>(.*?)</url>', 1)) AS block,
                     unnest(range(len(regexp_extract_all(
                       body, '(?s)<url>(.*?)</url>', 1)))) AS pos
              FROM xml
            )
            SELECT sitemap_url,
                   regexp_extract(block,
                     '<loc>\\s*([^<]+?)\\s*</loc>', 1) AS url,
                   CAST(CASE WHEN regexp_extract(block,
                          '<lastmod>\\s*([^<]+?)\\s*</lastmod>', 1) != ''
                        THEN substr(regexp_extract(block,
                          '<lastmod>\\s*([^<]+?)\\s*</lastmod>', 1), 1, 10)
                        END AS DATE) AS lastmod,
                   CAST(round(CAST(nullif(regexp_extract(block,
                     '<priority>\\s*([^<]+?)\\s*</priority>', 1), '')
                     AS DOUBLE) * 1000) AS BIGINT) AS priority_milli,
                   CAST(pos AS BIGINT) AS pos
            FROM blocks
            WHERE regexp_extract(block,
                    '<loc>\\s*([^<]+?)\\s*</loc>', 1) != ''""",
        "sitemap_parse": """
            WITH x AS (
              SELECT doc_id,
                     'https://' || source || '.example.org' AS base,
                     CAST(doc_id % 7 + 1 AS INT) AS n
              FROM documents
            ),
            b AS (
              SELECT doc_id, base,
                     base || '/sitemap-' || doc_id::VARCHAR || '.xml'
                       AS sitemap_url,
                     CASE WHEN doc_id % 10 = 0 THEN
                       '<sitemapindex>' || array_to_string(
                         list_transform(generate_series(1, 3),
                           i -> '<loc>' || base || '/sitemap-'
                                || doc_id::VARCHAR || '-' || i::VARCHAR
                                || '.xml</loc>'), '')
                       || '</sitemapindex>'
                     ELSE
                       '<urlset>' || array_to_string(
                         list_transform(generate_series(1, n),
                           i -> '<loc> ' || base || '/d/'
                                || doc_id::VARCHAR || '/' || i::VARCHAR
                                || ' </loc>'), '')
                       || '</urlset>'
                     END AS xml
              FROM x
            ),
            l AS (
              SELECT sitemap_url,
                     CASE WHEN contains(xml, '<sitemapindex')
                          THEN 'sitemap' ELSE 'url' END AS kind,
                     regexp_extract_all(xml,
                       '<loc>\\s*([^<]+?)\\s*</loc>', 1) AS locs
              FROM b
            )
            SELECT sitemap_url, kind,
                   unnest(locs) AS url,
                   CAST(unnest(generate_series(0, len(locs) - 1)) AS BIGINT)
                     AS pos
            FROM l""",
        "normalize_nfc": """
            WITH p AS (
              SELECT doc_id,
                     text || ' ' || repeat('e' || chr(769), doc_id % 3)
                          || repeat('o' || chr(776), doc_id % 2) AS text
              FROM documents
            )
            SELECT doc_id, nfc_normalize(text) AS norm_text,
                   nfc_normalize(text) != text AS changed
            FROM p""",
        "dedup_doc_lines": """
            WITH l AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS lines
              FROM documents
            )
            SELECT doc_id,
                   array_to_string(
                     list_filter(lines,
                                 (x, i) -> list_position(lines, x) = i),
                     chr(10)) AS clean_text,
                   CAST(len(lines) - len(list_distinct(lines)) AS BIGINT)
                     AS n_removed
            FROM l""",
        "dedup_lines_global": f"""
            WITH w AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok,
                     unnest(range(1, len({_TOKS_SQL}) + 1)) AS i
              FROM documents
            ),
            l AS (
              SELECT doc_id, CAST((i - 1) // 8 + 1 AS INT) AS pos,
                     string_agg(tok, ' ' ORDER BY i) AS ln
              FROM w GROUP BY doc_id, (i - 1) // 8
            ),
            r AS (
              SELECT doc_id, pos, ln,
                     row_number() OVER (PARTITION BY ln
                                        ORDER BY doc_id, pos) AS rn
              FROM l
            ),
            k AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(ln, chr(10) ORDER BY pos) AS clean_text
              FROM r WHERE rn = 1 GROUP BY doc_id
            ),
            tot AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id)
            SELECT t.doc_id,
                   coalesce(k.clean_text, '') AS clean_text,
                   CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(t.n - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
            FROM tot t LEFT JOIN k USING (doc_id)""",
        "quality_quantile_gate": f"""
            WITH b AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS wc,
                     length(text) AS cc,
                     len(regexp_extract_all(lower(text), '{all_stop}')) AS stop,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha
              FROM documents
            ),
            q AS (
              SELECT doc_id, source,
                     CAST(5 * floor(alpha / greatest(cc, 1) * 10000)
                        + 3 * least(floor(stop / greatest(wc, 1) * 10000) * 5, 10000)
                        + 2 * least(wc * 100, 10000) AS BIGINT) AS quality
              FROM b
            ),
            t AS (
              SELECT source, quantile_cont(quality, 0.5) AS thr
              FROM q GROUP BY source
            )
            SELECT q.doc_id, q.source, q.quality, t.thr,
                   q.quality >= t.thr AS keep
            FROM q JOIN t USING (source)""",
        "decontaminate": f"""
            WITH b AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 12) AS BIGINT)
                       % 10000 AS bucket,
                     {_TOKS_SQL} AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, bucket,
                     unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
                                           i -> array_to_string(t[i:i+7], ' '))) AS gram
              FROM b
            ),
            bench AS (SELECT DISTINCT gram FROM grams WHERE bucket >= 9000),
            hits AS (
              SELECT doc_id, count(DISTINCT gram) AS n_hit_grams
              FROM grams
              WHERE bucket < 9000 AND gram IN (SELECT gram FROM bench)
              GROUP BY 1
            )
            SELECT b.doc_id,
                   coalesce(h.n_hit_grams, 0) AS n_hit_grams,
                   coalesce(h.n_hit_grams, 0) > 0 AS contaminated
            FROM b LEFT JOIN hits h USING (doc_id)
            WHERE b.bucket < 9000""",
        "span_scrub": f"""
            WITH n AS (
              SELECT doc_id, t,
                     greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) AS nch
              FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
            ),
            chunks AS (
              SELECT doc_id,
                     unnest(generate_series(1, nch)) AS pos,
                     unnest(list_transform(generate_series(1, nch),
                            i -> array_to_string(t[(i-1)*20+1:(i-1)*20+20], ' '))) AS chunk
              FROM n
            ),
            census AS (
              SELECT md5(chunk) AS digest, count(DISTINCT doc_id) AS n_docs
              FROM chunks GROUP BY 1
            ),
            kept AS (
              SELECT c.doc_id, c.pos, c.chunk
              FROM chunks c JOIN census ce ON md5(c.chunk) = ce.digest
              WHERE ce.n_docs < 2
            ),
            agg AS (
              SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS n_kept
              FROM kept GROUP BY 1
            )
            SELECT n.doc_id,
                   coalesce(a.clean_text, '') AS clean_text,
                   n.nch - coalesce(a.n_kept, 0) AS n_removed
            FROM n LEFT JOIN agg a USING (doc_id)""",
        "source_rollup": f"""
            WITH census AS (
              SELECT md5(text) AS digest, count(*) AS n_copies
              FROM documents GROUP BY 1
            ),
            t AS (
              SELECT source,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len({_TOKS_SQL}) END AS wc,
                     len(text) AS cc,
                     md5(text) AS digest
              FROM documents
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(wc) AS BIGINT) AS sum_tokens,
                   CAST(sum(cc) AS BIGINT) AS sum_chars,
                   CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
            FROM t JOIN census USING (digest)
            GROUP BY 1""",
        "source_cap": f"""
            WITH b AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS wc,
                     length(text) AS cc,
                     len(regexp_extract_all(lower(text), '{all_stop}')) AS stop,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha
              FROM documents
            ),
            q AS (
              SELECT doc_id, source,
                     CAST(5 * floor(alpha / greatest(cc, 1) * 10000)
                        + 3 * least(floor(stop / greatest(wc, 1) * 10000) * 5, 10000)
                        + 2 * least(wc * 100, 10000) AS BIGINT) AS quality
              FROM b
            )
            SELECT doc_id, source, quality,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY quality DESC, doc_id)
                     AS rank_in_source
            FROM q
            QUALIFY rank_in_source <= 10""",
        "pii_redact": f"""
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '{TS.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
                       '{TS.PII_PATTERNS["ipv4"]}', '<IPV4>', 'g'),
                     '{TS.PII_PATTERNS["phone"]}', '<PHONE>', 'g') AS redacted,
                   len(regexp_extract_all(text, '{TS.PII_PATTERNS["email"]}')) AS n_email,
                   len(regexp_extract_all(text, '{TS.PII_PATTERNS["ipv4"]}')) AS n_ipv4,
                   len(regexp_extract_all(text, '{TS.PII_PATTERNS["phone"]}')) AS n_phone
            FROM documents""",
        "quality_repetition": f"""
            WITH l AS (
              SELECT doc_id, string_split(text, chr(10)) AS lines
              FROM documents
            ),
            base AS (
              SELECT doc_id, len(lines) AS n_lines,
                     CASE WHEN len(lines) > 0
                          THEN CAST(floor((len(lines) - len(list_distinct(lines)))
                                          * 10000 / len(lines)) AS BIGINT)
                          ELSE 0 END AS dup_line_frac_x1e4
              FROM l
            ),
            toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(t) - 1, 0)),
                       i -> array_to_string(t[i:i+1], ' '))) AS gram
              FROM toks
            ),
            pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
            pd AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams, max(c) AS top_c
              FROM pg GROUP BY 1
            )
            SELECT b.doc_id, n_lines, dup_line_frac_x1e4,
                   COALESCE(n_grams, 0) AS n_grams,
                   CAST(COALESCE(floor(top_c * 10000 / n_grams), 0) AS BIGINT)
                     AS top_gram_share_x1e4
            FROM base b LEFT JOIN pd ON b.doc_id = pd.doc_id""",
        "substring_dedup": """
            WITH syn AS (
              SELECT doc_id, concat_ws(' ',
                array_to_string(list_transform(
                  range(1, CAST(doc_id % 7 + 2 AS BIGINT)),
                  j -> 'u' || doc_id::VARCHAR || 'w' || j::VARCHAR), ' '),
                CASE WHEN doc_id % 3 = 0 THEN array_to_string(
                  list_transform(range(1, 13),
                    j -> 'qa' || (doc_id // 60)::VARCHAR
                         || 'x' || j::VARCHAR), ' ') END,
                CASE WHEN doc_id % 6 = 0 THEN array_to_string(
                  list_transform(range(1, 13),
                    j -> 'qb' || (doc_id // 60)::VARCHAR
                         || 'x' || j::VARCHAR), ' ') END,
                CASE WHEN doc_id % 11 = 4 THEN array_to_string(
                  list_transform(range(1, 8),
                    j -> 'nm' || (doc_id // 60)::VARCHAR
                         || 'x' || j::VARCHAR), ' ') END,
                'v' || doc_id::VARCHAR || 'w1 v' || doc_id::VARCHAR
                  || 'w2 v' || doc_id::VARCHAR || 'w3') AS text
              FROM documents
            ),
            tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM syn),
            -- brute force: EVERY offset's 8-gram (the anchor plan's output
            -- is provably the merged coverage of duplicated 8-grams)
            g AS (
              SELECT doc_id,
                     CAST(unnest(range(0, greatest(len(t) - 7, 0))) AS INT)
                       AS begin,
                     unnest(list_transform(
                       range(0, greatest(len(t) - 7, 0)),
                       i -> md5(array_to_string(t[i+1:i+8], ' ')))) AS dig
              FROM tk
            ),
            dup AS (
              SELECT dig FROM g GROUP BY dig
              HAVING count(DISTINCT doc_id) >= 2
            ),
            cov AS (
              SELECT doc_id, begin, begin + 8 AS e FROM g
              WHERE dig IN (SELECT dig FROM dup)
            ),
            isl AS (
              SELECT doc_id, begin, e,
                     CASE WHEN begin <= max(e) OVER (
                            PARTITION BY doc_id ORDER BY begin, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          THEN 0 ELSE 1 END AS brk
              FROM cov
            ),
            isl2 AS (
              SELECT doc_id, begin, e,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY begin, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS grp
              FROM isl
            )
            SELECT doc_id, CAST(min(begin) AS INT) AS begin,
                   CAST(max(e) - min(begin) AS INT) AS length
            FROM isl2 GROUP BY doc_id, grp""",
        # persisted-index search == IVF-restricted ADC computed directly:
        # ann_ivf's seeded-centroid assignment CTEs composed with
        # pq_topk's seeded-codebook LUT scoring (persistence is a
        # pass-through; the Spark side builds+reads the index files)
        "vector_index_search": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings
            ),
            cent AS (
              SELECT vec_id AS cell_id, e AS ce FROM v
              ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 32
            ),
            cand AS (
              SELECT vec_id, cell_id FROM (
                SELECT v.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY list_cosine_similarity(v.e, c.ce) DESC,
                                  c.cell_id) AS rn
                FROM v CROSS JOIN cent c)
              WHERE rn = 1
            ),
            qs AS (
              SELECT vec_id AS query_id, cell_id FROM (
                SELECT v.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY list_cosine_similarity(v.e, c.ce) DESC,
                                  c.cell_id) AS rn
                FROM v CROSS JOIN cent c WHERE v.vec_id < 10)
              WHERE rn <= 2
            ),
            seeds AS (
              SELECT e,
                     row_number() OVER (ORDER BY md5(vec_id::VARCHAR),
                                        vec_id) - 1 AS code_id
              FROM v ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
            ),
            cb AS (
              SELECT s.sub, code_id,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS c
              FROM seeds, (SELECT unnest(range(8)) AS sub) s
            ),
            subs AS (
              SELECT vec_id, s.sub,
                     e[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
              FROM v, (SELECT unnest(range(8)) AS sub) s
            ),
            dsc AS (
              SELECT vec_id, sub, code_id,
                     list_sum(list_transform(range(1, 9),
                       i -> (sv[i] - c[i]) * (sv[i] - c[i]))) AS d
              FROM subs JOIN cb USING (sub)
            ),
            codes AS (
              SELECT vec_id, sub, code_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                             ORDER BY d, code_id) AS rn
                FROM dsc) WHERE rn = 1
            ),
            lut AS (
              SELECT s.vec_id AS query_id, s.sub, cb.code_id,
                     CAST(floor(list_sum(list_transform(range(1, 9),
                       i -> (s.sv[i] - cb.c[i]) * (s.sv[i] - cb.c[i])))
                       * 1000000) AS BIGINT) AS part_q
              FROM subs s JOIN cb USING (sub)
              WHERE s.vec_id < 10
            ),
            sc AS (
              SELECT q.query_id, cd.vec_id,
                     CAST(sum(l.part_q) AS BIGINT) AS adist_q
              FROM qs q
              JOIN cand c ON c.cell_id = q.cell_id
              JOIN codes cd ON cd.vec_id = c.vec_id
              JOIN lut l ON l.query_id = q.query_id AND l.sub = cd.sub
                         AND l.code_id = cd.code_id
              WHERE cd.vec_id != q.query_id
              GROUP BY 1, 2
            )
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adist_q, vec_id) AS rank,
                   adist_q
            FROM sc QUALIFY rank <= 5""",
        "recrawl_priority": """
            WITH v AS (
              SELECT 'p' || (user_id % 40)::VARCHAR AS page, ts,
                     event_type AS digest, event_id
              FROM events
            ),
            m AS (
              SELECT page, ts, digest,
                     lag(digest) OVER (PARTITION BY page
                                       ORDER BY ts, event_id) AS prev
              FROM v
            ),
            s AS (
              SELECT page,
                     CAST(count(*) AS BIGINT) AS n_visits,
                     CAST(sum(CASE WHEN prev IS NOT NULL AND digest <> prev
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                     CAST(floor(epoch(max(ts))) AS BIGINT)
                       - CAST(floor(epoch(min(ts))) AS BIGINT) AS span_s,
                     max(ts) AS last_ts
              FROM m GROUP BY page HAVING count(*) >= 2
            ),
            h AS (
              SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS horizon_s FROM v
            ),
            e AS (
              SELECT page, n_visits, n_changes,
                     span_s // (n_visits - 1) AS mean_iv_s,
                     horizon_s - CAST(floor(epoch(last_ts)) AS BIGINT) AS age_s,
                     least((n_changes * 1000) // (n_visits - 1), 999)
                       AS r_milli
              FROM s CROSS JOIN h
            ),
            l AS (
              SELECT page, n_visits, n_changes, mean_iv_s, age_s,
                     CAST(floor(-ln(1.0 - r_milli / 1000.0) / mean_iv_s
                                * 1000000000) AS BIGINT) AS lam_x1e9
              FROM e WHERE mean_iv_s > 0
            )
            SELECT page, n_visits, n_changes, mean_iv_s, lam_x1e9, age_s,
                   CAST(floor((1.0 - exp(-(lam_x1e9 * age_s) / 1000000000.0))
                              * 1000000) AS BIGINT) AS p_stale_x1e6
            FROM l""",
        "bm25_search": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
            ),
            post AS (
              SELECT term, doc_id,
                     least(CAST(count(*) AS BIGINT), 1000) AS tf
              FROM toks GROUP BY term, doc_id
            ),
            dl AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
              FROM toks GROUP BY doc_id
            ),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST((sum(dl) * 1000) // count(*) AS BIGINT) AS a
              FROM dl
            ),
            idf AS (
              SELECT term,
                     CAST(floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                                * 1000000) AS BIGINT) AS idf_q
              FROM (SELECT term, CAST(count(*) AS BIGINT) AS df
                    FROM post GROUP BY term) CROSS JOIN st
            ),
            q AS (SELECT unnest(['join', 'vector', 'stream']) AS term),
            sc AS (
              SELECT p.doc_id,
                     CAST(sum((idf_q * 22 * tf * a)
                              // (10 * a * tf + 3 * a + 9000 * dl.dl))
                          AS BIGINT) AS score_q
              FROM post p JOIN q USING (term) JOIN idf USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN st
              GROUP BY p.doc_id
            )
            SELECT doc_id, score_q,
                   CAST(row_number() OVER (ORDER BY score_q DESC, doc_id)
                        AS BIGINT) AS rank
            FROM sc ORDER BY score_q DESC, doc_id LIMIT 20""",
        "bigram_logprob": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            uni AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
            ),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
            uv AS (SELECT tok, c FROM uni ORDER BY c DESC, tok LIMIT 50000),
            bgs AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(t) - 1, 0)),
                       i -> array_to_string(t[i:i+1], ' '))) AS bg
              FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
            ),
            bv AS (
              SELECT bg, CAST(count(*) AS BIGINT) AS c12
              FROM bgs GROUP BY bg ORDER BY c12 DESC, bg LIMIT 200000
            ),
            sc AS (
              SELECT doc_id,
                     CASE WHEN bv.c12 IS NULL THEN 1 ELSE 0 END AS oov,
                     CAST(floor(ln(
                       (COALESCE(bv.c12, 0)::DOUBLE * t + COALESCE(u2.c, 1))
                       / ((COALESCE(u1.c, 1) + 1.0) * t)) * 1000000)
                       AS BIGINT) AS qlp
              FROM bgs LEFT JOIN bv USING (bg)
              LEFT JOIN uv u1 ON u1.tok = string_split(bg, ' ')[1]
              LEFT JOIN uv u2 ON u2.tok = string_split(bg, ' ')[2]
              CROSS JOIN tot
            ),
            a AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                     CAST(sum(oov) AS BIGINT) AS n_oov,
                     CAST(floor(sum(qlp) / count(*)) AS BIGINT) AS logprob_q
              FROM sc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_bigrams, 0) AS n_bigrams,
                   COALESCE(a.n_oov, 0) AS n_oov,
                   COALESCE(a.logprob_q, 0) AS logprob_q
            FROM documents d LEFT JOIN a USING (doc_id)""",
        "hits_scores": _hits_sql(iters=2),
    }
    # the persisted-index round trip scores identically to the in-place
    # BM25 (pass-through layout) - same oracle.
    out["bm25_index_search"] = out["bm25_search"]
    out["source_entropy"] = """
        WITH census AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY lang, source
        ),
        totals AS (
          SELECT lang, CAST(sum(c) AS BIGINT) AS t,
                 CAST(count(*) AS BIGINT) AS n_sources
          FROM census GROUP BY lang
        )
        SELECT census.lang AS lang,
               CAST(any_value(t) AS BIGINT) AS n_docs,
               CAST(any_value(n_sources) AS BIGINT) AS n_sources,
               CAST(sum(CAST(floor(
                 (CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                 * ln(CAST(t AS DOUBLE) / CAST(c AS DOUBLE))
                 * 1000000) AS BIGINT)) AS BIGINT) AS entropy_q
        FROM census JOIN totals USING (lang)
        GROUP BY census.lang ORDER BY lang"""
    out["decontaminate_semantic"] = """
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
          FROM embeddings
        ),
        corpus AS (SELECT * FROM v WHERE vec_id % 10 != 0),
        bench AS (SELECT * FROM v WHERE vec_id % 10 = 0),
        scored AS (
          SELECT c.vec_id AS vec_id, b.vec_id AS bench_id,
                 CAST(floor(list_cosine_similarity(c.e, b.e) * 1000)
                      AS BIGINT) AS cos_m
          FROM corpus c CROSS JOIN bench b
        ),
        ranked AS (
          SELECT vec_id, bench_id, cos_m,
                 row_number() OVER (
                   PARTITION BY vec_id ORDER BY cos_m DESC, bench_id
                 ) AS rn
          FROM scored
        )
        SELECT vec_id, bench_id AS best_bench_id, cos_m AS best_cos_m,
               cos_m >= 350 AS contaminated
        FROM ranked WHERE rn = 1"""
    out["source_similarity"] = f"""
        WITH toks AS (SELECT source, {_TOKS_SQL} AS t FROM documents),
        sh AS (
          SELECT source,
                 unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                       i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        sg AS (SELECT DISTINCT source, shingle FROM sh),
        cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh FROM sg GROUP BY 1),
        inter AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS n_inter
          FROM sg a JOIN sg b ON a.shingle = b.shingle AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT source_a, source_b, n_inter, ca.n_sh AS n_a, cb.n_sh AS n_b,
               CAST(floor(n_inter / (ca.n_sh + cb.n_sh - n_inter) * 1000000)
                    AS BIGINT) AS jaccard_u
        FROM inter
        JOIN cnt ca ON ca.source = source_a
        JOIN cnt cb ON cb.source = source_b"""
    out["dup_rate_by_source"] = f"""
        WITH RECURSIVE {_SH64_PAIRS_CTES},
        p AS (
          SELECT id_a, id_b FROM cand
          WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
        ),
        e AS (
          SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p
        ),
        reach AS (
          SELECT DISTINCT src AS id, src AS r FROM e
          UNION
          SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src
        ),
        comp AS (SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY 1),
        flags AS (
          SELECT d.source,
                 CASE WHEN c.component_id IS NOT NULL
                           AND c.component_id <> d.doc_id
                      THEN 1 ELSE 0 END AS is_dup
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(is_dup) AS BIGINT) AS n_dups,
               CAST(floor(sum(is_dup) * 10000 / count(*)) AS BIGINT) AS dup_bp
        FROM flags GROUP BY source"""
    out["mix_temperature"] = """
        WITH c AS (
          SELECT source,
                 CAST(sum(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                          END) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ),
        q AS (
          SELECT source, n_tokens,
                 CAST(floor(pow(CAST(n_tokens AS DOUBLE), 0.3) * 1000000)
                      AS HUGEINT) AS wq
          FROM c
        ),
        tot AS (SELECT CAST(COALESCE(sum(wq), 0) AS HUGEINT) AS q_tot FROM q),
        star AS (
          SELECT n_tokens AS t_star, wq AS q_star
          FROM q WHERE n_tokens > 0
          ORDER BY CAST(wq AS DOUBLE) / n_tokens DESC, source LIMIT 1
        ),
        r AS (
          SELECT q.source, q.n_tokens,
                 CAST(q.wq AS BIGINT) AS weight_q,
                 CAST((10000::HUGEINT * q.wq)
                      // greatest(t.q_tot, 1::HUGEINT) AS BIGINT)
                   AS share_bp,
                 CASE WHEN q.n_tokens > 0 THEN
                   CAST((10000::HUGEINT * q.wq * s.t_star)
                        // (s.q_star * q.n_tokens) AS BIGINT)
                 ELSE 0 END AS rate_bp
          FROM q, tot t, star s
        )
        SELECT source, n_tokens, weight_q, share_bp, rate_bp,
               CAST((n_tokens * rate_bp) // 10000 AS BIGINT)
                 AS planned_tokens
        FROM r"""
    out["quality_drift"] = """
        WITH b AS (
          SELECT text,
                 CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 12) AS BIGINT)
                   % 10000 AS bkt
          FROM documents
        ),
        old AS (
          SELECT least(length(text) // 50, 9) AS bucket
          FROM b WHERE bkt < 8000
        ),
        new AS (
          SELECT least(length(CASE WHEN bkt >= 6000 AND bkt < 8000
                                   THEN text || ' ' || text
                                   ELSE text END) // 50, 9) AS bucket
          FROM b WHERE bkt >= 2000
        ),
        co AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_old
               FROM old GROUP BY bucket),
        cn AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new
               FROM new GROUP BY bucket),
        t AS (
          SELECT CAST((SELECT COALESCE(sum(n_old), 0) FROM co) AS BIGINT)
                   AS t_old,
                 CAST((SELECT COALESCE(sum(n_new), 0) FROM cn) AS BIGINT)
                   AS t_new
        ),
        j AS (
          SELECT COALESCE(co.bucket, cn.bucket) AS bucket,
                 CAST(COALESCE(n_old, 0) AS BIGINT) AS n_old,
                 CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new
          FROM co FULL OUTER JOIN cn ON co.bucket = cn.bucket
        )
        SELECT CAST(bucket AS BIGINT) AS bucket, n_old, n_new,
               CAST((1000000 * n_old) // greatest(t_old, 1) AS BIGINT)
                 AS p_ppm_old,
               CAST((1000000 * n_new) // greatest(t_new, 1) AS BIGINT)
                 AS p_ppm_new,
               CASE WHEN n_old > 0 AND n_new > 0 THEN
                 CAST(floor(
                   (CAST(n_old AS DOUBLE) / t_old
                    - CAST(n_new AS DOUBLE) / t_new)
                   * ln((CAST(n_old AS DOUBLE) / t_old)
                        / (CAST(n_new AS DOUBLE) / t_new))
                   * 1000000) AS BIGINT)
               ELSE NULL END AS psi_q
        FROM j, t"""
    out["chunk_documents"] = f"""
        WITH tk AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE {_TOKS_SQL} END AS toks
          FROM documents
        ),
        st AS (
          SELECT doc_id, toks, len(toks) AS n,
                 unnest(range(0, len(toks), 24)) AS s
          FROM tk WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(s // 24 AS BIGINT) AS chunk_idx,
               CAST(least(32, n - s) AS BIGINT) AS n_tokens,
               array_to_string(toks[s + 1 : s + 32], ' ') AS chunk
        FROM st
        WHERE s = 0 OR s < n - 32 + 24"""
    out["blocklist_mine"] = f"""
        WITH tk AS (
          SELECT doc_id, source, text,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE {_TOKS_SQL} END AS toks,
                 string_split(text, chr(10)) AS lines
          FROM documents
        ),
        f AS (
          SELECT source, {gopher_keep_sql} AS keep
          FROM tk
        ),
        census AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
          FROM f GROUP BY source
        )
        SELECT source, n_docs, n_fail,
               CAST((10000 * n_fail) // n_docs AS BIGINT) AS fail_bp
        FROM census
        WHERE n_docs >= 20 AND (10000 * n_fail) // n_docs >= 5200
        ORDER BY source"""
    out["tokenizer_stats"] = f"""
        WITH b AS (
          SELECT lang, CAST(strlen(text) AS BIGINT) AS nb,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len({_TOKS_SQL}) END AS BIGINT) AS w,
                 CAST(len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS p
          FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nb) AS BIGINT) AS n_bytes,
               CAST(sum(w) AS BIGINT) AS ws_tokens,
               CAST(sum(p) AS BIGINT) AS bpe_tokens,
               CAST((100 * sum(nb)) // greatest(sum(p), 1) AS BIGINT)
                 AS bytes_per_bpe_x100,
               CAST((10000 * sum(p)) // greatest(sum(w), 1) AS BIGINT)
                 AS fertility_x1e4
        FROM b GROUP BY lang ORDER BY lang"""
    out["url_template_mine"] = f"""
        WITH u AS (SELECT {_URL_SQL} AS url FROM documents),
        t AS (
          SELECT lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1)) AS host,
                 regexp_replace(
                   regexp_replace(url, '[0-9a-f]{{16,}}', '{{h}}', 'g'),
                   '[0-9]+', '{{n}}', 'g') AS template,
                 url
          FROM u
        ),
        census AS (
          SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls,
                 min(url) AS example_url
          FROM t GROUP BY host, template
        ),
        totals AS (
          SELECT host, CAST(sum(n_urls) AS BIGINT) AS host_urls
          FROM census GROUP BY host
        )
        SELECT host, template, n_urls, host_urls,
               CAST((10000 * n_urls) // host_urls AS BIGINT) AS share_bp,
               example_url
        FROM census JOIN totals USING (host)
        WHERE n_urls >= 5 AND (10000 * n_urls) // host_urls >= 2500
        ORDER BY host, template"""
    out["politeness_audit"] = """
        WITH g AS (
          SELECT 'h' || (user_id % 16)::VARCHAR AS host,
                 date_diff('second',
                           lag(ts) OVER (PARTITION BY user_id % 16
                                         ORDER BY ts, event_id),
                           ts) AS gap
          FROM events
        )
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_fetches,
               CAST(count(gap) AS BIGINT) AS n_gaps,
               CAST(min(gap) AS BIGINT) AS min_gap_s,
               CAST(sum(CASE WHEN gap < 1800 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               CAST((10000 * sum(CASE WHEN gap < 1800 THEN 1 ELSE 0 END))
                    // greatest(count(gap), 1) AS BIGINT) AS violation_bp
        FROM g GROUP BY host ORDER BY host"""
    out["mirror_detect"] = """
        WITH hosted AS (
          SELECT source || '.example.org' AS host, text FROM documents
          UNION ALL
          SELECT 'm-' || source || '.example.org', text
          FROM documents WHERE doc_id % 5 = 0
          UNION ALL
          SELECT 'cdn.example.org', text
          FROM documents WHERE doc_id % 7 = 0
        ),
        x AS (SELECT DISTINCT host, md5(text) AS dg FROM hosted),
        df AS (
          SELECT dg FROM x GROUP BY dg HAVING count(*) BETWEEN 2 AND 64
        ),
        p AS (
          SELECT a.host AS host_a, b.host AS host_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM x a JOIN x b USING (dg) JOIN df USING (dg)
          WHERE a.host < b.host GROUP BY 1, 2
        ),
        t AS (SELECT host, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY host)
        SELECT host_a, host_b, n_shared,
               CAST(least(ta.n, tb.n) AS BIGINT) AS n_smaller,
               CAST((10000 * n_shared) // least(ta.n, tb.n) AS BIGINT)
                 AS share_bp
        FROM p
        JOIN t ta ON ta.host = p.host_a
        JOIN t tb ON tb.host = p.host_b
        WHERE n_shared >= 2
          AND (10000 * n_shared) // least(ta.n, tb.n) >= 2500
        ORDER BY host_a, host_b"""
    out["gate_agreement"] = f"""
        WITH tk AS (
          SELECT doc_id, lang, text,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE {_TOKS_SQL} END AS toks,
                 string_split(text, chr(10)) AS lines,
                 {score_cols}
          FROM documents
        ),
        g AS (
          SELECT
            {gopher_keep_sql} AS keep_gopher,
            (5 * floor(len(regexp_extract_all(text, '[A-Za-z]'))
                 / greatest(length(text), 1) * 10000)
             + 3 * least(floor(len(regexp_extract_all(lower(text), '{all_stop}'))
                 / greatest(len(toks), 1) * 10000) * 5, 10000)
             + 2 * least(len(toks) * 100, 10000)) >= 57000 AS keep_quality,
            ({pred_case}) = lang AS lang_ok
          FROM tk
        ),
        census AS (
          SELECT keep_gopher, keep_quality, lang_ok,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM g GROUP BY 1, 2, 3
        ),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM census)
        SELECT keep_gopher, keep_quality, lang_ok, n_docs,
               CAST((10000 * n_docs) // total AS BIGINT) AS share_bp
        FROM census, t
        ORDER BY keep_gopher, keep_quality, lang_ok"""
    out["drain_plan"] = f"""
        WITH u AS (SELECT {_URL_SQL} AS url FROM documents),
        f AS (
          SELECT lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1)) AS host
          FROM u
        ),
        census AS (
          SELECT host, CAST(count(*) AS BIGINT) AS n_queued
          FROM f GROUP BY host
        ),
        b AS (
          SELECT host,
                 CAST(1 + ({_MD5I48.format(x='host')} % 4) AS BIGINT) AS bb
          FROM (SELECT DISTINCT host FROM f)
          WHERE host != 'src0.example.org'
        ),
        j AS (
          SELECT census.host AS host, n_queued,
                 CAST(CASE WHEN bb > 0 THEN bb ELSE 2 END AS BIGINT)
                   AS budget
          FROM census LEFT JOIN b USING (host)
        )
        SELECT host, n_queued, budget,
               CAST((n_queued + budget - 1) // budget AS BIGINT)
                 AS rounds_needed
        FROM j ORDER BY rounds_needed DESC, host"""
    out["dedup_cluster_stats"] = f"""
        WITH RECURSIVE {_SH64_PAIRS_CTES},
        p AS (
          SELECT id_a, id_b FROM cand
          WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
        ),
        e AS (
          SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p
        ),
        reach AS (
          SELECT DISTINCT src AS id, src AS r FROM e
          UNION
          SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src
        ),
        cc AS (SELECT id AS doc_id, min(r) AS component_id
               FROM reach GROUP BY 1),
        sizes AS (
          SELECT component_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM cc GROUP BY 1
        ),
        hist AS (
          SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(cluster_size * count(*) AS BIGINT) AS n_docs
          FROM sizes GROUP BY 1
        ),
        single AS (
          SELECT CAST(1 AS BIGINT) AS cluster_size,
                 CAST((SELECT count(DISTINCT doc_id) FROM documents)
                      - (SELECT count(DISTINCT doc_id) FROM cc)
                      AS BIGINT) AS n_clusters,
                 CAST((SELECT count(DISTINCT doc_id) FROM documents)
                      - (SELECT count(DISTINCT doc_id) FROM cc)
                      AS BIGINT) AS n_docs
        )
        SELECT * FROM hist UNION ALL SELECT * FROM single
        ORDER BY cluster_size"""
    out["sitemap_coverage"] = f"""
        WITH u AS (
          SELECT doc_id, {_URL_SQL} AS url FROM documents
        ),
        hu AS (
          SELECT doc_id,
                 lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1)) AS host,
                 url
          FROM u
        ),
        listed AS (SELECT DISTINCT host, url FROM hu WHERE doc_id % 2 = 0),
        got AS (SELECT DISTINCT host, url FROM hu WHERE doc_id % 3 != 0),
        nl AS (SELECT host, CAST(count(*) AS BIGINT) AS n_listed
               FROM listed GROUP BY host),
        hit AS (
          SELECT l.host, CAST(count(*) AS BIGINT) AS n_fetched_listed
          FROM listed l
          WHERE EXISTS (SELECT 1 FROM got g
                        WHERE g.host = l.host AND g.url = l.url)
          GROUP BY l.host
        ),
        extra AS (
          SELECT g.host, CAST(count(*) AS BIGINT) AS n_unlisted_fetched
          FROM got g
          WHERE NOT EXISTS (SELECT 1 FROM listed l
                            WHERE l.host = g.host AND l.url = g.url)
          GROUP BY g.host
        )
        SELECT coalesce(nl.host, extra.host) AS host,
               CAST(coalesce(n_listed, 0) AS BIGINT) AS n_listed,
               CAST(coalesce(n_fetched_listed, 0) AS BIGINT)
                 AS n_fetched_listed,
               CAST((10000 * coalesce(n_fetched_listed, 0))
                    // greatest(coalesce(n_listed, 0), 1) AS BIGINT)
                 AS coverage_bp,
               CAST(coalesce(n_unlisted_fetched, 0) AS BIGINT)
                 AS n_unlisted_fetched
        FROM nl
        LEFT JOIN hit USING (host)
        FULL JOIN extra ON nl.host = extra.host
        ORDER BY host"""
    out["robots_audit"] = f"""
        WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
        f AS (
          SELECT lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1)) AS host,
                 url, doc_id
          FROM u
        ),
        flagged AS (
          SELECT host, url,
                 -- the planted rule: hosts other than src0 disallow
                 -- /d/3/ prefixes; src0 has no robots -> allowed
                 (host != 'src0.example.org'
                  AND doc_id % 5 = 3) AS denied
          FROM f
        )
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_fetched,
               CAST(sum(CASE WHEN denied THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_denied,
               CAST((10000 * sum(CASE WHEN denied THEN 1 ELSE 0 END))
                    // count(*) AS BIGINT) AS denied_bp,
               min(CASE WHEN denied THEN url END) AS example_denied
        FROM flagged GROUP BY host ORDER BY host"""
    out["importance_sample"] = """
        WITH b AS (
          SELECT doc_id,
                 CAST(5 * floor(len(regexp_extract_all(text, '[A-Za-z]'))
                        / greatest(length(text), 1) * 10000)
                    + 3 * least(floor(len(regexp_extract_all(lower(text), '{all_stop}'))
                        / greatest(CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                                   END, 1) * 10000) * 5, 10000)
                    + 2 * least(CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                                END * 100, 10000) AS BIGINT) AS s
          FROM documents
        ),
        dom AS (SELECT DISTINCT s FROM b),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM dom),
        bk AS (
          SELECT s, least(CAST(floor(
                   (row_number() OVER (ORDER BY s) - 1) * 10
                   / (SELECT nd FROM n)) AS BIGINT), 9) AS score_bucket
          FROM dom
        ),
        j AS (
          SELECT doc_id, score_bucket,
                 CAST('0x' || substr(md5('s42:' || doc_id::VARCHAR), 1, 12)
                      AS BIGINT) % 10000 AS sample_key,
                 CAST(500 + floor(9500 * ((score_bucket + 1) / 10))
                      AS BIGINT) AS rate
          FROM b JOIN bk USING (s)
        )
        SELECT doc_id, CAST(score_bucket AS BIGINT) AS score_bucket,
               CAST(sample_key AS BIGINT) AS sample_key
        FROM j WHERE sample_key < rate""".replace("{all_stop}", all_stop)
    out["bitext_mine"] = """
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
          FROM embeddings
        ),
        src AS (SELECT * FROM v WHERE vec_id % 2 = 0),
        tgt AS (SELECT * FROM v WHERE vec_id % 2 = 1),
        p AS (
          SELECT s.vec_id AS sid, t.vec_id AS tid,
                 CAST(floor(list_cosine_similarity(s.e, t.e) * 1000)
                      AS BIGINT) + 1000 AS cs
          FROM src s CROSS JOIN tgt t
        ),
        kx AS (
          SELECT sid, CAST(sum(cs) AS BIGINT) AS sumk FROM (
            SELECT sid, cs,
                   row_number() OVER (PARTITION BY sid ORDER BY cs DESC) AS rn
            FROM p) WHERE rn <= 4 GROUP BY sid
        ),
        ky AS (
          SELECT tid, CAST(sum(cs) AS BIGINT) AS sumk FROM (
            SELECT tid, cs,
                   row_number() OVER (PARTITION BY tid ORDER BY cs DESC) AS rn
            FROM p) WHERE rn <= 4 GROUP BY tid
        ),
        m AS (
          SELECT p.sid, p.tid, p.cs,
                 (p.cs * 80000) // (kx.sumk + ky.sumk) AS margin_bp
          FROM p JOIN kx USING (sid) JOIN ky USING (tid)
        ),
        fwd AS (
          SELECT sid, tid, cs, margin_bp,
                 row_number() OVER (
                   PARTITION BY sid ORDER BY margin_bp DESC, cs DESC, tid
                 ) AS rn
          FROM m
        ),
        bwd AS (
          SELECT sid, tid,
                 row_number() OVER (
                   PARTITION BY tid ORDER BY margin_bp DESC, cs DESC, sid
                 ) AS rn
          FROM m
        )
        SELECT f.sid AS src_id, f.tid AS tgt_id, f.cs - 1000 AS cos_m,
               CAST(f.margin_bp AS BIGINT) AS margin_bp,
               coalesce(b.sid = f.sid, FALSE) AS mutual,
               (coalesce(b.sid = f.sid, FALSE)
                AND f.margin_bp >= 10500) AS mined
        FROM fwd f LEFT JOIN bwd b ON b.tid = f.tid AND b.rn = 1
        WHERE f.rn = 1"""
    out["phrase_search"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
        toks AS (SELECT doc_id, unnest(t) AS term FROM t),
        dl AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
          FROM toks GROUP BY doc_id
        ),
        st AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST((sum(dl) * 1000) // count(*) AS BIGINT) AS a
          FROM dl
        ),
        occ AS (
          SELECT doc_id,
                 least(CAST(len(list_filter(
                   generate_series(1, greatest(len(t) - 1, 0)),
                   p -> t[p] = 'hash' AND t[p+1] = 'join')) AS BIGINT),
                   1000) AS ptf
          FROM t
        ),
        pp AS (
          SELECT o.doc_id, o.ptf, dl.dl
          FROM occ o JOIN dl USING (doc_id) WHERE o.ptf > 0
        ),
        idf AS (
          SELECT CAST(floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                            * 1000000) AS BIGINT) AS idf_q, a
          FROM (SELECT CAST(count(*) AS BIGINT) AS df FROM pp)
          CROSS JOIN st
        ),
        sc AS (
          SELECT doc_id, ptf,
                 CAST((idf_q * 22 * ptf * a)
                      // (10 * a * ptf + 3 * a + 9000 * dl)
                      AS BIGINT) AS score_q
          FROM pp CROSS JOIN idf
        )
        SELECT doc_id, ptf, score_q,
               CAST(row_number() OVER (ORDER BY score_q DESC, doc_id)
                    AS BIGINT) AS rank
        FROM sc ORDER BY score_q DESC, doc_id LIMIT 20"""
    # the positional-index round trip answers the same phrase query from
    # the persisted postings — same oracle, corpus scored in place.
    out["phrase_index_search"] = out["phrase_search"]
    out["focused_frontier"] = """
        WITH p AS (
          SELECT 'https://anchors.test/d/' || (doc_id % 97) AS target_url,
                 'go ' || (doc_id % 97) AS anchor
          FROM documents
          UNION ALL
          SELECT 'https://anchors.test/d/' || ((doc_id * 31 + 7) % 97),
                 'see ' || ((doc_id * 31 + 7) % 97)
          FROM documents
        ),
        c AS (
          SELECT target_url, anchor, CAST(count(*) AS BIGINT) AS n,
                 row_number() OVER (PARTITION BY target_url
                                    ORDER BY count(*) DESC, anchor) AS rank
          FROM p GROUP BY target_url, anchor QUALIFY rank <= 3
        ),
        h AS (
          SELECT target_url,
                 n * CAST(len(list_intersect(
                       list_distinct(regexp_split_to_array(trim(anchor),
                                                           '\\s+')),
                       ['go', '7', '13'])) AS BIGINT) AS r
          FROM c
        ),
        s AS (
          SELECT target_url, CAST(sum(r) AS BIGINT) AS rel_q
          FROM h GROUP BY target_url HAVING sum(r) > 0
        )
        SELECT target_url AS url,
               'anchors.test' AS host,
               CAST(0 AS INTEGER) AS level,
               CAST(0 AS INTEGER) AS attempt,
               CAST(NULL AS VARCHAR) AS parent_url,
               CAST(-1 AS BIGINT) AS parent_seq,
               CAST(0 AS INTEGER) AS link_pos,
               CAST(-rel_q AS BIGINT) AS seq,
               CAST(-2 AS INTEGER) AS discovered_round
        FROM s WHERE rel_q >= 1"""
    out["index_neardup"] = """
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
          FROM embeddings
        ),
        co AS (SELECT * FROM v WHERE vec_id % 13 != 0),
        inc AS (SELECT * FROM v WHERE vec_id % 13 = 0),
        cent AS (
          SELECT vec_id AS cell_id, e AS ce FROM co
          ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 32
        ),
        cand AS (
          SELECT vec_id, cell_id FROM (
            SELECT co.vec_id, c.cell_id,
                   row_number() OVER (PARTITION BY co.vec_id
                     ORDER BY list_cosine_similarity(co.e, c.ce) DESC,
                              c.cell_id) AS rn
            FROM co CROSS JOIN cent c) WHERE rn = 1
        ),
        qs AS (
          SELECT vec_id AS query_id, cell_id FROM (
            SELECT i.vec_id, c.cell_id,
                   row_number() OVER (PARTITION BY i.vec_id
                     ORDER BY list_cosine_similarity(i.e, c.ce) DESC,
                              c.cell_id) AS rn
            FROM inc i CROSS JOIN cent c) WHERE rn <= 2
        ),
        seeds AS (
          SELECT e,
                 row_number() OVER (ORDER BY md5(vec_id::VARCHAR),
                                    vec_id) - 1 AS code_id
          FROM co ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
        ),
        cb AS (
          SELECT s.sub, code_id,
                 e[s.sub * 8 + 1 : s.sub * 8 + 8] AS c
          FROM seeds, (SELECT unnest(range(8)) AS sub) s
        ),
        subs AS (
          SELECT vec_id, s.sub,
                 e[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
          FROM co, (SELECT unnest(range(8)) AS sub) s
        ),
        dsc AS (
          SELECT vec_id, sub, code_id,
                 list_sum(list_transform(range(1, 9),
                   i -> (sv[i] - c[i]) * (sv[i] - c[i]))) AS d
          FROM subs JOIN cb USING (sub)
        ),
        codes AS (
          SELECT vec_id, sub, code_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY d, code_id) AS rn
            FROM dsc) WHERE rn = 1
        ),
        isubs AS (
          SELECT vec_id, s.sub,
                 e[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
          FROM inc, (SELECT unnest(range(8)) AS sub) s
        ),
        lut AS (
          SELECT s.vec_id AS query_id, s.sub, cb.code_id,
                 CAST(floor(list_sum(list_transform(range(1, 9),
                   i -> (s.sv[i] - cb.c[i]) * (s.sv[i] - cb.c[i])))
                   * 1000000) AS BIGINT) AS part_q
          FROM isubs s JOIN cb USING (sub)
        ),
        sc AS (
          SELECT q.query_id, cd.vec_id,
                 CAST(sum(l.part_q) AS BIGINT) AS adist_q
          FROM qs q
          JOIN cand c ON c.cell_id = q.cell_id
          JOIN codes cd ON cd.vec_id = c.vec_id
          JOIN lut l ON l.query_id = q.query_id AND l.sub = cd.sub
                     AND l.code_id = cd.code_id
          WHERE cd.vec_id != q.query_id
          GROUP BY 1, 2
        ),
        short AS (
          SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adist_q, vec_id) AS srn
            FROM sc) WHERE srn <= 20
        ),
        rr AS (
          SELECT s.query_id, s.vec_id,
                 CAST(floor(list_cosine_similarity(q.e, c.e) * 1000)
                      AS BIGINT) AS cos_m
          FROM short s
          JOIN inc q ON q.vec_id = s.query_id
          JOIN co c ON c.vec_id = s.vec_id
        ),
        best AS (
          SELECT query_id, vec_id AS dup_of, cos_m FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_m DESC, vec_id) AS rn
            FROM rr) WHERE rn = 1
        )
        SELECT i.vec_id, b.dup_of, b.cos_m,
               coalesce(b.cos_m >= 350, FALSE) AS is_dup
        FROM inc i LEFT JOIN best b ON b.query_id = i.vec_id"""
    out["bitext_mine_ivf"] = """
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
          FROM embeddings
        ),
        src AS (SELECT * FROM v WHERE vec_id % 2 = 0),
        tgt AS (SELECT * FROM v WHERE vec_id % 2 = 1),
        cent AS (
          SELECT vec_id AS cell_id, e AS ce FROM v
          ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 32
        ),
        tc AS (
          SELECT vec_id, e, cell_id FROM (
            SELECT t.vec_id, t.e, c.cell_id,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY list_cosine_similarity(t.e, c.ce) DESC,
                              c.cell_id) AS rn
            FROM tgt t CROSS JOIN cent c) WHERE rn = 1
        ),
        sc AS (
          SELECT vec_id, e, cell_id FROM (
            SELECT s.vec_id, s.e, c.cell_id,
                   row_number() OVER (PARTITION BY s.vec_id
                     ORDER BY list_cosine_similarity(s.e, c.ce) DESC,
                              c.cell_id) AS rn
            FROM src s CROSS JOIN cent c) WHERE rn = 1
        ),
        sq AS (
          SELECT vec_id, e, cell_id FROM (
            SELECT s.vec_id, s.e, c.cell_id,
                   row_number() OVER (PARTITION BY s.vec_id
                     ORDER BY list_cosine_similarity(s.e, c.ce) DESC,
                              c.cell_id) AS rn
            FROM src s CROSS JOIN cent c) WHERE rn <= 4
        ),
        tq AS (
          SELECT vec_id, e, cell_id FROM (
            SELECT t.vec_id, t.e, c.cell_id,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY list_cosine_similarity(t.e, c.ce) DESC,
                              c.cell_id) AS rn
            FROM tgt t CROSS JOIN cent c) WHERE rn <= 4
        ),
        cf0 AS (
          SELECT q.vec_id AS sid, c.vec_id AS tid,
                 list_cosine_similarity(q.e, c.e) AS cos
          FROM tc c JOIN sq q USING (cell_id)
          WHERE c.vec_id != q.vec_id
        ),
        cf AS (
          SELECT sid, tid,
                 CAST(floor(cos * 1000) AS BIGINT) + 1000 AS cs,
                 row_number() OVER (PARTITION BY sid
                                    ORDER BY cos DESC, tid) AS rn
          FROM cf0 QUALIFY rn <= 8
        ),
        cb0 AS (
          SELECT q.vec_id AS tid, c.vec_id AS sid,
                 list_cosine_similarity(q.e, c.e) AS cos
          FROM sc c JOIN tq q USING (cell_id)
          WHERE c.vec_id != q.vec_id
        ),
        cb AS (
          SELECT tid, sid,
                 CAST(floor(cos * 1000) AS BIGINT) + 1000 AS cs,
                 row_number() OVER (PARTITION BY tid
                                    ORDER BY cos DESC, sid) AS rn
          FROM cb0 QUALIFY rn <= 8
        ),
        kx AS (SELECT sid, CAST(sum(cs) AS BIGINT) AS sumk_x
               FROM cf WHERE rn <= 4 GROUP BY sid),
        ky AS (SELECT tid, CAST(sum(cs) AS BIGINT) AS sumk_y
               FROM cb WHERE rn <= 4 GROUP BY tid),
        mf AS (
          SELECT cf.sid, cf.tid, cf.cs,
                 (cf.cs * 80000) // (kx.sumk_x + ky.sumk_y) AS margin_bp
          FROM cf JOIN kx USING (sid) JOIN ky USING (tid)
        ),
        mb AS (
          SELECT cb.tid, cb.sid, cb.cs,
                 (cb.cs * 80000) // (kx.sumk_x + ky.sumk_y) AS margin_bp
          FROM cb JOIN ky USING (tid) JOIN kx USING (sid)
        ),
        fwd AS (
          SELECT sid, tid, cs, margin_bp,
                 row_number() OVER (
                   PARTITION BY sid ORDER BY margin_bp DESC, cs DESC, tid
                 ) AS rn
          FROM mf
        ),
        bwd AS (
          SELECT tid, sid,
                 row_number() OVER (
                   PARTITION BY tid ORDER BY margin_bp DESC, cs DESC, sid
                 ) AS rn
          FROM mb
        )
        SELECT f.sid AS src_id, f.tid AS tgt_id, f.cs - 1000 AS cos_m,
               CAST(f.margin_bp AS BIGINT) AS margin_bp,
               coalesce(b.sid = f.sid, FALSE) AS mutual,
               (coalesce(b.sid = f.sid, FALSE)
                AND f.margin_bp >= 10500) AS mined
        FROM fwd f LEFT JOIN bwd b ON b.tid = f.tid AND b.rn = 1
        WHERE f.rn = 1"""
    out["link_spam_signals"] = f"""
        WITH e AS (
          SELECT CASE WHEN doc_id % 5 = 0
                      THEN 'farm' || (doc_id % 2)::VARCHAR
                      ELSE 'h' || (doc_id % 97)::VARCHAR END AS src,
                 CASE WHEN doc_id % 5 = 0 THEN 'spamtarget'
                      ELSE 'h' || ({_MD5I48.format(x="doc_id::VARCHAR")}
                                   % 37)::VARCHAR END AS dst,
                 CASE WHEN doc_id % 5 = 0 THEN 'buy cheap widgets'
                      ELSE 'a' || ((doc_id * 7 + 3) % 13)::VARCHAR
                 END AS anchor
          FROM documents
        ),
        bs AS (
          SELECT dst, CAST(sum(n) AS BIGINT) AS inlinks,
                 CAST(count(*) AS BIGINT) AS src_hosts,
                 CAST(max(n) AS BIGINT) AS top_src_n
          FROM (SELECT dst, src, count(*) AS n FROM e GROUP BY dst, src)
          GROUP BY dst
        ),
        ba AS (
          SELECT dst, CAST(max(n) AS BIGINT) AS top_anchor_n
          FROM (SELECT dst, anchor, count(*) AS n FROM e
                GROUP BY dst, anchor)
          GROUP BY dst
        )
        SELECT bs.dst AS host, inlinks, src_hosts,
               CAST(10000 * top_src_n // inlinks AS BIGINT)
                 AS top_src_share_bp,
               CAST(10000 * top_anchor_n // inlinks AS BIGINT)
                 AS top_anchor_share_bp,
               (inlinks >= 10
                AND (10000 * top_src_n // inlinks >= 8000
                     OR 10000 * top_anchor_n // inlinks >= 8000))
                 AS spam_flag
        FROM bs JOIN ba ON ba.dst = bs.dst"""
    out["dedup_containment"] = """
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 10000000,
                 array_to_string(
                   (regexp_split_to_array(trim(text), '\\s+'))[1:12], ' ')
          FROM documents WHERE doc_id % 20 = 0
        ),
        toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM corpus
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, greatest(len(t) - 2, 0)),
                   i -> array_to_string(t[i:i+2], ' '))) AS shingle
          FROM toks
        ),
        ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
        rare AS (
          SELECT shingle FROM ds GROUP BY 1 HAVING count(*) <= 64
        ),
        dsf AS (SELECT ds.* FROM ds JOIN rare USING (shingle)),
        cnt AS (SELECT doc_id, count(*) AS n_sh FROM dsf GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM dsf a JOIN dsf b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        j AS (
          SELECT id_a, id_b, n_inter, ca.n_sh AS n_a, cb.n_sh AS n_b
          FROM inter
          JOIN cnt ca ON ca.doc_id = id_a
          JOIN cnt cb ON cb.doc_id = id_b
        ),
        d AS (
          SELECT id_a AS contained_id, id_b AS container_id, n_inter,
                 n_a AS n_contained, n_b AS n_container FROM j
          UNION ALL
          SELECT id_b, id_a, n_inter, n_b, n_a FROM j
        )
        SELECT contained_id, container_id, n_inter, n_contained,
               n_container,
               CAST(floor(n_inter / n_contained * 1000000) AS BIGINT)
                 AS containment_u
        FROM d WHERE n_inter / n_contained >= 0.8"""
    out["host_communities"] = _label_communities_sql(iters=4)
    out["pii_cc_luhn"] = """
        WITH p AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 5 = 0
                         THEN ' card 4111 1111 1111 1111 ok' ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                         THEN ' num 1234 5678 9012 3456' ELSE '' END
                 || CASE WHEN doc_id % 11 = 0
                         THEN ' id 4111111111111111 end' ELSE '' END AS t
          FROM documents
        ),
        c AS (
          SELECT doc_id,
                 list_concat(
                   regexp_extract_all(t, '\\b[0-9]{13,19}\\b'),
                   regexp_extract_all(t,
                     '\\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{1,7}\\b')
                 ) AS cands
          FROM p
        ),
        u AS (
          SELECT doc_id,
                 regexp_replace(unnest(cands), '[^0-9]', '', 'g') AS d
          FROM c
        ),
        v AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_valid FROM (
            SELECT doc_id,
                   list_sum(list_transform(
                     generate_series(1, length(d)),
                     i -> CASE WHEN (i - 1) % 2 = 0
                          THEN substr(reverse(d), i, 1)::INT
                          ELSE CASE
                            WHEN substr(reverse(d), i, 1)::INT * 2 > 9
                            THEN substr(reverse(d), i, 1)::INT * 2 - 9
                            ELSE substr(reverse(d), i, 1)::INT * 2 END
                          END)) AS s
            FROM u)
          WHERE s % 10 = 0 GROUP BY doc_id
        )
        SELECT c.doc_id,
               CAST(len(cands) AS BIGINT) AS n_cc_candidates,
               CAST(COALESCE(v.n_valid, 0) AS BIGINT) AS n_cc_valid
        FROM c LEFT JOIN v USING (doc_id)"""
    out["video_frames"] = """
        WITH m AS (
          SELECT doc_id AS media_id,
                 octet_length(encode(text || '|' || doc_id::VARCHAR)) AS n
          FROM documents
        ),
        v AS (
          SELECT media_id,
                 CASE n % 3 WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END AS fps,
                 2 * n + 30 AS n_frames
          FROM m
        ),
        c AS (
          SELECT media_id, fps, n_frames,
                 least(greatest(CAST(ceil(
                   ((n_frames * 1000) // fps) / 400.0) AS INT), 1), 8) AS k
          FROM v
        )
        SELECT media_id,
               unnest(generate_series(0, k - 1)) AS sample_index,
               unnest(generate_series(0, k - 1)) * CAST(400 AS BIGINT)
                 AS ts_ms,
               CAST(least(unnest(generate_series(0, k - 1)) * 400 * fps
                            // 1000,
                          n_frames - 1) AS BIGINT) AS frame_index
        FROM c"""
    # Shared synth for the redirect-family oracles: the q__redirect_edges
    # graph, functionalized to min(dst) per src exactly like
    # resolve_redirects does.
    redirect_e = """
        e0 AS (
          SELECT CASE WHEN doc_id < 21 THEN 'L' || (doc_id + 1)::VARCHAR
                      WHEN doc_id % 1000 = 111 THEN 'c0'
                      WHEN doc_id % 1000 = 222 THEN 'c1'
                      WHEN doc_id % 1000 = 333 THEN 'c2'
                      WHEN doc_id % 1000 = 444 THEN 'x0'
                      ELSE 'u' || doc_id::VARCHAR END AS src,
                 CASE WHEN doc_id < 21 THEN 'L' || doc_id::VARCHAR
                      WHEN doc_id % 1000 = 111 THEN 'c1'
                      WHEN doc_id % 1000 = 222 THEN 'c2'
                      WHEN doc_id % 1000 = 333 THEN 'c0'
                      WHEN doc_id % 1000 = 444 THEN 'c0'
                      ELSE 'u' || (doc_id // 7)::VARCHAR END AS dst
          FROM documents
        ),
        e AS (SELECT src AS node, min(dst) AS t FROM e0 GROUP BY 1),
        walk AS (
          SELECT node AS src, t AS cur, CAST(1 AS BIGINT) AS hops FROM e
          UNION ALL
          SELECT w.src, e.t, w.hops + 1
          FROM walk w JOIN e ON e.node = w.cur
          WHERE w.hops < 8
        ),
        last AS (
          SELECT src, cur AS final, hops,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY hops DESC) AS rn
          FROM walk
        ),
        resolved_t AS (
          SELECT l.src, l.final, l.hops,
                 (e2.node IS NULL) AS resolved
          FROM last l LEFT JOIN e e2 ON e2.node = l.final
          WHERE l.rn = 1
        )"""
    out["redirect_resolve"] = f"""
        WITH RECURSIVE {redirect_e}
        SELECT src, final, hops, resolved FROM resolved_t"""
    out["redirect_aliases"] = f"""
        WITH RECURSIVE {redirect_e}
        SELECT final, CAST(count(*) AS BIGINT) AS n_aliases,
               max(hops) AS max_hops_seen
        FROM resolved_t WHERE resolved GROUP BY final"""
    # Rendezvous lane assignment: recompute every candidate score and the
    # (score DESC, lane ASC) top-1 pick.
    lane_cand = """
        hosts AS (
          SELECT DISTINCT 'h' || (doc_id % 211)::VARCHAR AS host
          FROM documents
        ),
        cand AS (
          SELECT host, lane,
                 CAST('0x' || substr(md5(host || ':' || lane::VARCHAR),
                                     1, 12) AS BIGINT) AS score
          FROM hosts, (SELECT unnest(range(0, 16)) AS lane)
        ),
        pick AS (
          SELECT host, CAST(lane AS BIGINT) AS lane, score,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY score DESC, lane) AS rn
          FROM cand
        )"""
    out["lane_assign"] = f"""
        WITH {lane_cand}
        SELECT host, lane, score FROM pick WHERE rn = 1"""
    out["lane_load"] = f"""
        WITH {lane_cand},
        w AS (
          SELECT 'h' || (doc_id % 211)::VARCHAR AS host,
                 CAST(count(*) AS BIGINT) AS weight
          FROM documents GROUP BY 1
        )
        SELECT p.lane, CAST(count(*) AS BIGINT) AS n_hosts,
               CAST(sum(w.weight) AS BIGINT) AS total_weight
        FROM pick p JOIN w USING (host)
        WHERE p.rn = 1 GROUP BY p.lane"""
    # Soft-404 family: the synthetic corpus of q__soft404_pages, then
    # the phrase/length verdicts recomputed row-by-row in DuckDB (the
    # phrase pattern is built from the SAME constant the engine uses).
    s404_pat = "(" + "|".join(PH.SOFT404_PHRASES) + ")"
    s404 = f"""
        pages AS (
          SELECT 'http://h' || (doc_id % 11)::VARCHAR || '.test/p'
                   || doc_id::VARCHAR AS url,
                 'h' || (doc_id % 11)::VARCHAR || '.test' AS host,
                 CASE WHEN doc_id % 10 = 0 THEN
                        'Error 404 not found. The page you requested does not exist.'
                      WHEN doc_id % 10 = 1 THEN
                        'Sorry, item ' || doc_id::VARCHAR
                          || ' is no longer available.'
                      ELSE text END AS t
          FROM documents
        ),
        verdicts AS (
          SELECT url, host,
                 CAST(CASE WHEN trim(t) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(t), '\\s+'))
                      END AS BIGINT) AS word_count,
                 regexp_matches(lower(t), '{s404_pat}') AS has_phrase,
                 (regexp_matches(lower(t), '{s404_pat}')
                  AND (CASE WHEN trim(t) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(t), '\\s+'))
                       END) <= 80) AS is_soft404,
                 md5(t) AS digest
          FROM pages
        )"""
    out["soft404_flags"] = f"""
        WITH {s404}
        SELECT url, host, word_count, has_phrase, is_soft404, digest
        FROM verdicts"""
    out["soft404_hosts"] = f"""
        WITH {s404},
        totals AS (
          SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
                 CAST(sum(CASE WHEN is_soft404 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_soft404
          FROM verdicts GROUP BY host
        ),
        tmpl AS (
          SELECT host, digest, CAST(count(*) AS BIGINT) AS template_n,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY count(*) DESC, digest) AS rn
          FROM verdicts WHERE is_soft404 GROUP BY host, digest
        )
        SELECT t.host, t.n_pages, t.n_soft404,
               CAST((10000 * t.n_soft404) // t.n_pages AS BIGINT)
                 AS soft404_rate_bp,
               m.digest AS template_digest, m.template_n,
               CAST((10000 * m.template_n) // t.n_soft404 AS BIGINT)
                 AS template_share_bp
        FROM totals t JOIN tmpl m ON m.host = t.host AND m.rn = 1
        WHERE t.n_soft404 >= 3"""
    # DUST param inference: DuckDB re-parses the same URL strings with
    # list lambdas and replays the variant-group census. The CTE chain
    # is shared with canonical_urls, which applies the learned verdict.
    dust_ctes = """
        p AS (
          SELECT 'http://h' || (doc_id % 5)::VARCHAR || '.test/p'
                   || (doc_id % 7)::VARCHAR
                   || '?page=' || (doc_id % 4)::VARCHAR
                   || '&utm=' || (doc_id % 3)::VARCHAR AS url,
                 md5('c ' || (doc_id % 5)::VARCHAR || ' '
                     || (doc_id % 7)::VARCHAR || ' '
                     || (doc_id % 4)::VARCHAR) AS digest
          FROM documents
        ),
        parsed AS (
          SELECT url,
                 lower(string_split(url, '/')[3]) AS host,
                 split_part(split_part(url, '#', 1), '?', 1) AS page,
                 CASE WHEN instr(split_part(url, '#', 1), '?') > 0
                      THEN list_filter(
                             string_split(split_part(
                               split_part(url, '#', 1), '?', 2), '&'),
                             x -> x <> '')
                      ELSE [] END AS kvs,
                 digest
          FROM p
        ),
        r0 AS (
          SELECT host, page, kvs, digest, unnest(kvs) AS kv FROM parsed
        ),
        r1 AS (
          SELECT host, page, kv, digest,
                 split_part(kv, '=', 1) AS param,
                 array_to_string(list_sort(list_filter(kvs,
                     x -> split_part(x, '=', 1)
                          <> split_part(kv, '=', 1))), '&') AS others
          FROM r0
        ),
        grp AS (
          SELECT host, page, param, others,
                 count(DISTINCT kv) AS n_values,
                 count(DISTINCT digest) AS n_digests
          FROM r1 GROUP BY 1, 2, 3, 4
        ),
        ev AS (
          SELECT host, param, CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(CASE WHEN n_digests = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_consistent
          FROM grp WHERE n_values >= 2 GROUP BY 1, 2
        ),
        obs AS (SELECT DISTINCT host, param FROM r1)"""
    out["strippable_params"] = f"""
        WITH {dust_ctes}
        SELECT o.host, o.param,
               CAST(COALESCE(e.n_groups, 0) AS BIGINT) AS n_groups,
               CAST(COALESCE(e.n_consistent, 0) AS BIGINT)
                 AS n_consistent,
               (COALESCE(e.n_groups, 0) >= 1
                AND COALESCE(e.n_consistent, 0) = COALESCE(e.n_groups, 0))
                 AS strippable
        FROM obs o LEFT JOIN ev e USING (host, param)"""
    out["canonical_urls"] = f"""
        WITH {dust_ctes},
        drops AS (
          SELECT o.host, list(o.param) AS drop_set
          FROM obs o LEFT JOIN ev e USING (host, param)
          WHERE COALESCE(e.n_groups, 0) >= 1
            AND COALESCE(e.n_consistent, 0) = COALESCE(e.n_groups, 0)
          GROUP BY o.host
        ),
        canon AS (
          SELECT pp.url, pp.page, len(pp.kvs) AS nk,
                 list_sort(list_filter(pp.kvs,
                     x -> NOT list_contains(COALESCE(d.drop_set, []),
                                            split_part(x, '=', 1))))
                   AS kept
          FROM parsed pp LEFT JOIN drops d USING (host)
        )
        SELECT url,
               CASE WHEN len(kept) > 0
                    THEN page || '?' || array_to_string(kept, '&')
                    ELSE page END AS canonical_url,
               CAST(nk - len(kept) AS BIGINT) AS n_stripped
        FROM canon"""
    out["tfidf_keywords"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        ),
        post AS (
          SELECT term, doc_id,
                 least(CAST(count(*) AS BIGINT), 1000) AS tf
          FROM toks GROUP BY term, doc_id
        ),
        st AS (
          SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM post
        ),
        idf AS (
          SELECT term,
                 CAST(floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                            * 1000000) AS BIGINT) AS idf_q
          FROM (SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM post GROUP BY term) CROSS JOIN st
        ),
        sc AS (
          SELECT doc_id, post.term AS term, tf,
                 CAST(tf * idf_q AS BIGINT) AS score_q,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tf * idf_q DESC, post.term)
                   AS rn
          FROM post JOIN idf USING (term)
        )
        SELECT doc_id, term, tf, score_q, CAST(rn AS BIGINT) AS rank
        FROM sc WHERE rn <= 3"""
    deg_census = f"""
        e AS (
          SELECT 'h' || (doc_id % 37)::VARCHAR AS src,
                 'h' || ({_MD5I48.format(x="doc_id::VARCHAR")} % 37)::VARCHAR
                   AS dst
          FROM documents
        ),
        oc AS (
          SELECT src AS host, CAST(count(*) AS BIGINT) AS out_edges,
                 CAST(count(DISTINCT dst) AS BIGINT) AS out_hosts
          FROM e GROUP BY src
        ),
        ic AS (
          SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_edges,
                 CAST(count(DISTINCT src) AS BIGINT) AS in_hosts
          FROM e GROUP BY dst
        ),
        census AS (
          SELECT COALESCE(oc.host, ic.host) AS host,
                 COALESCE(out_edges, 0) AS out_edges,
                 COALESCE(out_hosts, 0) AS out_hosts,
                 COALESCE(in_edges, 0) AS in_edges,
                 COALESCE(in_hosts, 0) AS in_hosts
          FROM oc FULL OUTER JOIN ic ON oc.host = ic.host
        )"""
    out["degree_census"] = f"""
        WITH {deg_census}
        SELECT host, CAST(out_edges AS BIGINT) AS out_edges,
               CAST(out_hosts AS BIGINT) AS out_hosts,
               CAST(in_edges AS BIGINT) AS in_edges,
               CAST(in_hosts AS BIGINT) AS in_hosts
        FROM census"""
    out["degree_histogram"] = f"""
        WITH {deg_census},
        m AS (
          SELECT 'out_edges' AS measure, out_edges AS d FROM census
          UNION ALL
          SELECT 'out_hosts', out_hosts FROM census
          UNION ALL
          SELECT 'in_edges', in_edges FROM census
          UNION ALL
          SELECT 'in_hosts', in_hosts FROM census
        )
        SELECT measure,
               CAST(CASE WHEN d = 0 THEN -1
                    ELSE length(format('{{:b}}', d)) - 1 END AS BIGINT)
                 AS bucket,
               CAST(count(*) AS BIGINT) AS n_hosts
        FROM m GROUP BY 1, 2"""
    out["contract_edges"] = f"""
        WITH e AS (
          SELECT 'h' || (doc_id % 37)::VARCHAR AS src,
                 'h' || ({_MD5I48.format(x="doc_id::VARCHAR")} % 37)::VARCHAR
                   AS dst
          FROM documents
        ),
        m AS (
          SELECT 'h' || n::VARCHAR AS node,
                 'h' || (n - 10)::VARCHAR AS final
          FROM (SELECT unnest(range(30, 37)) AS n)
        ),
        c AS (
          SELECT COALESCE(ms.final, e.src) AS src,
                 COALESCE(md.final, e.dst) AS dst
          FROM e LEFT JOIN m ms ON ms.node = e.src
                 LEFT JOIN m md ON md.node = e.dst
        )
        SELECT src, dst, CAST(count(*) AS BIGINT) AS weight
        FROM c WHERE src <> dst GROUP BY src, dst"""
    out["collocations"] = f"""
        WITH toks AS (
          SELECT unnest({_TOKS_SQL}) AS tok FROM documents
          WHERE trim(text) <> ''
        ),
        uni AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
        ),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
        bgs AS (
          SELECT string_split(bg, chr(1))[1] AS w1,
                 string_split(bg, chr(1))[2] AS w2
          FROM (
            SELECT unnest(list_transform(
                     generate_series(1, greatest(len(ts) - 1, 0)),
                     i -> ts[i] || chr(1) || ts[i + 1])) AS bg
            FROM (SELECT {_TOKS_SQL} AS ts FROM documents
                  WHERE trim(text) <> '') 
          )
        ),
        big AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
          FROM bgs GROUP BY w1, w2 HAVING count(*) >= 5
        ),
        sc AS (
          SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
                 CAST(floor(ln((CAST(b.c12 AS DOUBLE) * t)
                               / (CAST(u1.c AS DOUBLE) * u2.c))
                            * 1000000) AS BIGINT) AS pmi_q
          FROM big b JOIN uni u1 ON u1.tok = b.w1
               JOIN uni u2 ON u2.tok = b.w2
               CROSS JOIN tot
        )
        SELECT w1, w2, c12, c1, c2, pmi_q,
               CAST(row_number() OVER (ORDER BY pmi_q DESC, w1, w2)
                    AS BIGINT) AS rank
        FROM sc ORDER BY pmi_q DESC, w1, w2 LIMIT 25"""
    out["cluster_split"] = f"""
        WITH RECURSIVE {_SH64_PAIRS_CTES},
        p AS (
          SELECT id_a, id_b FROM cand
          WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
        ),
        e AS (
          SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p
        ),
        reach AS (
          SELECT DISTINCT src AS id, src AS r FROM e
          UNION
          SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src
        ),
        comp AS (SELECT id AS doc_id, min(r) AS component_id
                 FROM reach GROUP BY 1),
        k AS (
          SELECT d.doc_id,
                 COALESCE(c.component_id, d.doc_id) AS key
          FROM documents d LEFT JOIN comp c USING (doc_id)
        ),
        b AS (
          SELECT doc_id, key::VARCHAR AS split_key,
                 CAST('0x' || substr(md5(key::VARCHAR), 1, 12) AS BIGINT)
                   % 10000 AS bucket
          FROM k
        )
        SELECT doc_id, split_key,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split,
               bucket
        FROM b"""
    out["domain_rollup"] = f"""
        WITH e AS (
          SELECT 'w' || (doc_id % 4)::VARCHAR || '.dom'
                   || (doc_id % 6)::VARCHAR || '.test' AS src,
                 'w' || ({_MD5I48.format(x="doc_id::VARCHAR")} % 4)::VARCHAR
                   || '.dom'
                   || ({_MD5I48.format(x="doc_id::VARCHAR")} % 6)::VARCHAR
                   || '.test' AS dst
          FROM documents
        ),
        oc AS (
          SELECT src AS host, CAST(count(*) AS BIGINT) AS out_edges,
                 CAST(count(DISTINCT dst) AS BIGINT) AS out_hosts
          FROM e GROUP BY src
        ),
        ic AS (
          SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_edges,
                 CAST(count(DISTINCT src) AS BIGINT) AS in_hosts
          FROM e GROUP BY dst
        ),
        census AS (
          SELECT COALESCE(oc.host, ic.host) AS host,
                 COALESCE(out_edges, 0) AS out_edges,
                 COALESCE(out_hosts, 0) AS out_hosts,
                 COALESCE(in_edges, 0) AS in_edges,
                 COALESCE(in_hosts, 0) AS in_hosts
          FROM oc FULL OUTER JOIN ic ON oc.host = ic.host
        )
        SELECT split_part(host, '.', 2) || '.' || split_part(host, '.', 3)
                 AS domain,
               CAST(count(*) AS BIGINT) AS n_hosts,
               CAST(sum(out_edges) AS BIGINT) AS out_edges,
               CAST(sum(out_hosts) AS BIGINT) AS out_hosts,
               CAST(sum(in_edges) AS BIGINT) AS in_edges,
               CAST(sum(in_hosts) AS BIGINT) AS in_hosts
        FROM census GROUP BY 1"""
    return out
