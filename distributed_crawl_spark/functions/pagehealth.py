"""Crawl-waste diagnostics: soft-404 detection and tracking-parameter
inference.

Two places a large crawl burns fetch budget invisibly:

1. **Soft 404s** — servers that answer HTTP 200 with an error page.
   The reference crawler (thebenjy/distributed_crawl crawler.py) trusts
   the status code, so every soft-404 costs a fetch AND pollutes the
   corpus with boilerplate "not found" text. :func:`soft404_flags`
   scores each page with the classic Bar-Yossef et al. (WWW'04)
   signals re-expressed as closed-form Column predicates (error-phrase
   hit + short body), and :func:`soft404_hosts` finds the per-host
   error TEMPLATE — the dominant content digest among flagged pages —
   which is the actionable artifact: once a host's error template is
   known, any future fetch matching it can be dropped at ingest.

2. **Tracking parameters** — query params (``utm_*``, session ids,
   click ids) whose value never changes the content. Every distinct
   value is a frontier entry, a politeness slot, and a fetch; at
   10^10-URL scale an un-stripped session id multiplies a host's URL
   space unboundedly. The engine already strips a STATIC list
   (``strip_tracking_params``, url.py) and mines trap-shaped URL
   templates (``url_template_mine``); :func:`strippable_params` learns
   the list from CONTENT EVIDENCE instead: a param is strippable on a
   host when every observed group of URLs that differ ONLY in that
   param's value served byte-identical content. This is the
   "irrelevant-parameter learning" of IRLbot (Lee et al., TWEB'09) and
   Bar-Yossef & Keidar's DustBuster ("Do Not Crawl in the DUST",
   WWW'07), shaped as one census groupBy.

Everything is built-in Column expressions — zero Python in the executor
path, whole-stage-codegen'd, and mirrored in ANSI SQL by the DuckDB
oracle (booleans, bigints and md5 digests only; no floats anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import word_count
from .url import url_host

# Public, language-specific error-page phrase list (English web). Hit =
# any phrase appears case-insensitively. Multi-word phrases keep the
# false-positive rate low on short legitimate pages.
SOFT404_PHRASES: list[str] = [
    "page not found",
    "404 not found",
    "does not exist",
    "no longer available",
    "cannot be found",
    "file not found",
    "page you requested",
]

SOFT404_MAX_WORDS = 80


def soft404_phrase(text: Column) -> Column:
    """True when any :data:`SOFT404_PHRASES` entry appears (case-folded)."""
    pat = "(" + "|".join(SOFT404_PHRASES) + ")"
    return F.lower(text).rlike(pat)


def soft404_flags(pages: DataFrame, url_col: str = "url",
                  text_col: str = "text", status_col: str | None = None,
                  max_words: int = SOFT404_MAX_WORDS) -> DataFrame:
    """Per-page soft-404 verdict: 200-status pages whose extracted text
    is short (``word_count <= max_words``) AND contains an error
    phrase. Returns (url, host, word_count, has_phrase, is_soft404,
    digest) — digest = md5(text), the join key for template detection.

    Zero shuffle: one projection over the pages scan. When
    ``status_col`` is None every row is treated as a 200 (the curated
    corpus case, where non-200s were already dropped at fetch time).
    """
    url = F.col(url_col)
    text = F.col(text_col)
    ok = F.lit(True) if status_col is None else (F.col(status_col) == 200)
    wc = word_count(text)
    has = soft404_phrase(text)
    return pages.select(
        url.alias("url"),
        url_host(url).alias("host"),
        wc.cast("long").alias("word_count"),
        has.alias("has_phrase"),
        (ok & has & (wc <= max_words)).alias("is_soft404"),
        F.md5(text).alias("digest"),
    )


def soft404_hosts(flags: DataFrame, min_pages: int = 3) -> DataFrame:
    """Per-host soft-404 census + error-template pick over a
    :func:`soft404_flags` result.

    Output per host with ``n_soft404 >= min_pages``: n_pages,
    n_soft404, ``soft404_rate_bp = (10000*n_soft404) DIV n_pages``
    (integral basis points — scale-free, hash-matchable), and the
    host's dominant flagged digest (template_digest, template_n,
    ``template_share_bp`` over n_soft404). Ties break toward the
    smaller digest, so the pick is deterministic across engines.

    Scale shape: one (host, digest) census groupBy over the FLAGGED
    subset (map-side combinable, bounded by distinct error templates —
    real hosts have one or two), a |hosts|-row totals census, and a
    top-1 window over per-host template rows — the ``row_number()=1``
    shape Spark 4 rewrites to a map-side WindowGroupLimit. No exchange
    above census size at any corpus scale.
    """
    totals = flags.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum(F.col("is_soft404").cast("long")).cast("long")
        .alias("n_soft404"),
    )
    tmpl = (
        flags.filter(F.col("is_soft404"))
        .groupBy("host", "digest")
        .agg(F.count(F.lit(1)).cast("long").alias("template_n"))
    )
    w = Window.partitionBy("host").orderBy(
        F.desc("template_n"), F.asc("digest")
    )
    top = (
        tmpl.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("host", F.col("digest").alias("template_digest"),
                "template_n")
    )
    return (
        totals.join(top, "host")
        .filter(F.col("n_soft404") >= min_pages)
        .select(
            "host", "n_pages", "n_soft404",
            F.expr("CAST((10000 * n_soft404) DIV n_pages AS BIGINT)")
            .alias("soft404_rate_bp"),
            "template_digest", "template_n",
            F.expr("CAST((10000 * template_n) DIV n_soft404 AS BIGINT)")
            .alias("template_share_bp"),
        )
    )


def strippable_params(pages: DataFrame, url_col: str = "url",
                      text_col: str = "text",
                      digest_col: str | None = None,
                      min_groups: int = 1) -> DataFrame:
    """Learn per-host strippable query parameters from content evidence.

    For every URL the query string splits into ``k=v`` members; each
    member generates one candidate row keyed by (host, page, param,
    others) where ``page`` is the URL up to ``?`` and ``others`` is the
    canonically-sorted rest of the query with EVERY member of this
    param's name removed. Two URLs land in the same group exactly when
    they differ only in this parameter — the DUST rule under test.

    A group is *evidence* when it saw ≥ 2 distinct values of the param;
    it is *consistent* when all its rows served one content digest.
    Output per observed (host, param): ``n_groups`` (evidence groups),
    ``n_consistent``, and ``strippable = n_groups >= min_groups AND
    n_consistent == n_groups`` — one counter-example anywhere on the
    host vetoes the strip, the conservative rule a crawler needs
    (stripping a real pagination param would silently drop pages).
    Params never seen with two values report n_groups = 0, strippable
    false (observed, unproven).

    Scale shape: fragment-strip + query split + member explode are
    zero-shuffle projections (≤ |params-per-url| rows out); the only
    corpus-sized exchange is ONE groupBy on (host, page, param,
    others) — the variant-group census — whose two exact
    count-distincts ride a single expand (2× rows, same shuffle).
    Everything after runs on census-bounded rows: an evidence rollup
    and an observed-params census, both ≤ |host×param|. A repeated
    name inside one URL (``a=1&a=2``) counts as its own 2-value
    evidence group — same digest, so it argues FOR stripping, which
    matches the duplicate-content reading.
    """
    url = F.col(url_col)
    digest = (F.col(digest_col) if digest_col is not None
              else F.md5(F.col(text_col)))
    base = F.split_part(url, F.lit("#"), F.lit(1))
    qpos = F.instr(base, "?")
    page = F.when(qpos > 0, F.substring(base, F.lit(1), qpos - 1)) \
        .otherwise(base)
    query = F.when(qpos > 0,
                   F.substring(base, qpos + 1, F.length(base))
                   ).otherwise(F.lit(""))
    kvs = F.filter(F.split(query, "&"), lambda x: x != "")
    rows = (
        pages.select(
            url_host(url).alias("host"),
            page.alias("page"),
            kvs.alias("kvs"),
            digest.alias("digest"),
        )
        .select("host", "page", "kvs", "digest",
                F.explode("kvs").alias("kv"))
        .withColumn("param", F.split_part(F.col("kv"), F.lit("="),
                                          F.lit(1)))
        .withColumn(
            "others",
            F.array_join(
                F.array_sort(F.filter(
                    F.col("kvs"),
                    lambda x: F.split_part(x, F.lit("="), F.lit(1))
                    != F.col("param"),
                )),
                "&",
            ),
        )
    )
    groups = rows.groupBy("host", "page", "param", "others").agg(
        F.countDistinct("kv").cast("long").alias("n_values"),
        F.countDistinct("digest").cast("long").alias("n_digests"),
    )
    evidence = (
        groups.filter(F.col("n_values") >= 2)
        .groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum((F.col("n_digests") == 1).cast("long")).cast("long")
            .alias("n_consistent"),
        )
    )
    observed = rows.select("host", "param").distinct()
    return (
        observed.join(evidence, ["host", "param"], "left")
        .select(
            "host", "param",
            F.coalesce("n_groups", F.lit(0)).cast("long")
            .alias("n_groups"),
            F.coalesce("n_consistent", F.lit(0)).cast("long")
            .alias("n_consistent"),
        )
        .withColumn(
            "strippable",
            (F.col("n_groups") >= min_groups)
            & (F.col("n_consistent") == F.col("n_groups")),
        )
    )


def canonicalize_urls(urls: DataFrame, strippable: DataFrame,
                      url_col: str = "url") -> DataFrame:
    """Apply a learned :func:`strippable_params` table: rewrite each URL
    without its host's strippable params, remaining query members
    sorted canonically — the step that actually collapses DUST before
    the URL-seen filter, so utm/session variants stop costing frontier
    entries and fetches.

    Returns (url, canonical_url, n_stripped). URLs on hosts with no
    learned strippable params (or absent from the table) pass through
    with only the canonical member sort applied — sorting is part of
    the canonical form, so ``a=1&b=2`` and ``b=2&a=1`` collapse too.
    Fragments are dropped (never sent to the server).

    Scale shape: parse + member filter + rebuild are zero-shuffle
    projections; the only join is the |hosts|-row broadcast of
    per-host drop sets. Feed the output to the seen filter / frontier
    and, when redirect chains are known, resolve them AFTER this
    rewrite (redirects.resolve_redirects over canonicalized nodes).
    """
    url = F.col(url_col)
    base = F.split_part(url, F.lit("#"), F.lit(1))
    qpos = F.instr(base, "?")
    page = F.when(qpos > 0, F.substring(base, F.lit(1), qpos - 1)) \
        .otherwise(base)
    query = F.when(qpos > 0,
                   F.substring(base, qpos + 1, F.length(base))
                   ).otherwise(F.lit(""))
    kvs = F.filter(F.split(query, "&"), lambda x: x != "")
    parsed = urls.select(
        url.alias("url"),
        url_host(url).alias("host"),
        page.alias("page"),
        kvs.alias("kvs"),
    )
    drops = (
        strippable.filter(F.col("strippable"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("drop_set"))
    )
    empty = F.array().cast("array<string>")
    joined = parsed.join(F.broadcast(drops), "host", "left") \
        .withColumn("drop_set", F.coalesce("drop_set", empty))
    kept = F.array_sort(F.filter(
        F.col("kvs"),
        lambda x: ~F.array_contains(
            F.col("drop_set"), F.split_part(x, F.lit("="), F.lit(1))
        ),
    ))
    return joined.select(
        "url",
        F.when(F.size(kept) > 0,
               F.concat(F.col("page"), F.lit("?"),
                        F.array_join(kept, "&")))
        .otherwise(F.col("page")).alias("canonical_url"),
        (F.size("kvs") - F.size(kept)).cast("long").alias("n_stripped"),
    )


def canonical_with_drops(url: Column, drop_set: Column) -> Column:
    """Column-level DUST rewrite for the crawl driver's frontier path:
    given a per-row ``drop_set`` (array of learned strippable param
    names for the URL's host, joined in by the caller), rebuild the URL
    without those params, survivors canonically sorted, fragment
    dropped. When ``drop_set`` is NULL — host has no learned params —
    the URL passes through UNTOUCHED (raw-string parity for unlearned
    hosts, matching the engine's other opt-in hygiene stages).

    Same URL grammar as :func:`strippable_params` /
    :func:`canonicalize_urls`; pure Column expression, zero shuffle.
    """
    base = F.split_part(url, F.lit("#"), F.lit(1))
    qpos = F.instr(base, "?")
    page = F.when(qpos > 0, F.substring(base, F.lit(1), qpos - 1)) \
        .otherwise(base)
    query = F.when(qpos > 0,
                   F.substring(base, qpos + 1, F.length(base))
                   ).otherwise(F.lit(""))
    kvs = F.filter(F.split(query, "&"), lambda x: x != "")
    kept = F.array_sort(F.filter(
        kvs,
        lambda x: ~F.array_contains(
            drop_set, F.split_part(x, F.lit("="), F.lit(1))
        ),
    ))
    rebuilt = F.when(
        F.size(kept) > 0,
        F.concat(page, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(page)
    return F.when(drop_set.isNull(), url).otherwise(rebuilt)
