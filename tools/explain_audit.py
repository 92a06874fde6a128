"""Physical-plan audit over the contract queries → PLANS.md.

For each query in ``__spark_entry__.queries()``: capture
``explain('formatted')``, extract scan pushdown info (PushedFilters /
ReadSchema), join strategies, exchange count, and WholeStageCodegen spans,
and flag anti-patterns (cartesian products, row-at-a-time Python UDFs,
scans reading pruned-away columns).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, df) -> dict:
    p = plan_text(df)
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        p,
    )
    return {
        "name": name,
        "plan": p,
        "exchanges": p.count("Exchange"),
        "scans": p.count("Scan parquet"),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", p))),
        "joins": sorted(set(joins)),
        "pushed": re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        "read_schema": re.findall(r"ReadSchema: ([^\n]*)", p),
        "flags": [
            f
            for f, bad in [
                ("CARTESIAN", "CartesianProduct" in p),
                ("ROW_PYTHON_UDF", "BatchEvalPython" in p),
                ("NESTED_LOOP", "BroadcastNestedLoopJoin" in p),
            ]
            if bad
        ],
    }


# Flags that are DESIGN, not defects — justification shown in PLANS.md.
EXPECTED_FLAGS = {
    "dedup_cluster_stats": "NESTED_LOOP = the lazily-derived singleton row: "
    "two 1-row count aggregates (corpus total x covered docs) cross-joined — "
    "bounded by construction, replaces two driver-side .count() actions",
    "gate_agreement": "NESTED_LOOP = broadcast cross join vs the 1-row "
    "census total (share_bp denominator; census is <= 3^k cells — same "
    "bounded pattern as mix_report)",
    "dedup_minhash_lsh": "NESTED_LOOP = broadcast cross join vs the 16-row "
    "minhash-parameter table (k-way signature expansion; build side is constant)",
    "dedup_simhash": "NESTED_LOOP = broadcast cross join vs the 32-row bit-"
    "position table (bounded by vocabulary × 32, after per-doc aggregation)",
    "dedup_embedding": "NESTED_LOOP = intentional brute-force all-pairs "
    "baseline; the scale path is LSH bucketing (ann_lsh / minhash_lsh)",
    "ann_topk": "NESTED_LOOP = intentional brute-force exact top-k baseline; "
    "the scale path is ann_lsh",
    "ann_ivf": "NESTED_LOOP = broadcast cross join vs the n_cells-row "
    "centroid codebook (IVF coarse assignment — constant build side, the "
    "standard K-fan-out every IVF index pays); probe-time candidate join "
    "is the BroadcastHashJoin on cell_id",
    "unigram_logprob": "NESTED_LOOP = broadcast cross join vs the ONE-row "
    "corpus-total aggregate (T for the ln(c/T) model and the ln(1/T) OOV "
    "floor); the vocab itself probes via BroadcastHashJoin on token",
    "doc_keywords": "NESTED_LOOP = broadcast cross join vs the ONE-row "
    "doc-count aggregate (N for idf = ln(N/df)); the tf⋈idf join itself "
    "is a hash join on token",
    "tfidf_keywords": "NESTED_LOOP = broadcast cross join vs the ONE-row "
    "corpus_stats aggregate (N for the BM25+ idf) — the same bounded "
    "1-row pattern as doc_keywords/bm25_search; postings⋈idf is a hash "
    "join on term",
    "collocations": "NESTED_LOOP = broadcast cross join vs the ONE-row "
    "token-total aggregate (T in pmi = ln(c12*T/(c1*c2))); the two "
    "bigram⋈unigram joins are hash joins on the word key",
    "mix_plan": "NESTED_LOOP = broadcast cross join vs the ONE-row "
    "bottleneck-source aggregate (t*, w*) joined back to the <=|sources| "
    "census — both sides bounded",
    "mix_temperature": "NESTED_LOOP = broadcast cross joins vs the ONE-row "
    "weight total and the ONE-row bottleneck aggregate joined back to the "
    "<=|sources| census — same bounded shape as mix_plan",
    "quality_drift": "NESTED_LOOP = broadcast cross join vs the ONE-row "
    "(t_old, t_new) totals aggregate; the SortMergeJoin is the full outer "
    "join of the two <=|buckets|-row censuses (full outer cannot "
    "broadcast) — every side bounded by the bucket-domain size",
    "train_corpus_full": "NESTED_LOOP = the embedded unigram-LM gate's "
    "ONE-row corpus-total cross join (same bounded shape as "
    "unigram_logprob); all other gate joins are hash/broadcast",
    "semdedup": "NESTED_LOOP = the IVF coarse-assignment broadcast cross "
    "join vs the n_cells-row codebook (same bounded shape as ann_ivf); "
    "the within-cell pair join is an equi-join on cell_id",
    "ccnet_buckets": "NESTED_LOOP = the embedded unigram_logprob ONE-row "
    "corpus-total cross join (same bounded shape); the tertile thresholds "
    "and bucket assignment join via BroadcastHashJoin on lang",
    "decontaminate_semantic": "NESTED_LOOP = broadcast cross join vs the "
    "ONE-row collect_list(bench) aggregate — a benchmark suite is tiny "
    "next to the corpus, so the corpus side scores it per-row "
    "(transform + array_max) with zero exchanges",
    "phrase_search": "NESTED_LOOP = broadcast cross joins vs the ONE-row "
    "stats and ONE-row phrase-idf aggregates (n_docs/avgdl and the unit-term "
    "idf) — same bounded shape as bm25_search",
    "phrase_index_search": "NESTED_LOOP = the same ONE-row stats/idf cross "
    "joins as phrase_search, over bucket-pruned positional postings",
    "bitext_mine_ivf": "NESTED_LOOP = the IVF coarse-assignment broadcast "
    "cross joins vs the n_cells-row centroid codebook (same bounded shape as "
    "ann_ivf, paid once per shard side); candidate, sum, and mutual joins "
    "are all hash joins on cell/sid/tid",
    "bitext_mine": "NESTED_LOOP = the four broadcast cross joins vs ONE-row "
    "collect_list side aggregates (per-side top-k neighbourhood sums, then "
    "forward/backward margin argmax) — the exact quadratic baseline the "
    "margin DEFINITION requires; the 100-TB path scores a persisted-IVF "
    "shortlist join with the same arithmetic",
    "bm25_search": "NESTED_LOOP = broadcast cross join vs the ONE-row "
    "corpus stats aggregate (N, avgdl for the BM25 length norm); the "
    "query-term and doc-posting joins are BroadcastHashJoins on term",
    "bm25_index_search": "NESTED_LOOP = the same ONE-row stats cross join "
    "as bm25_search, read from the persisted index's 1-row stats table; "
    "postings probe via BroadcastHashJoin on term + term_bucket pruning",
    "bigram_logprob": "NESTED_LOOP = the unigram-backoff ONE-row "
    "corpus-total cross join (same bounded shape as unigram_logprob); "
    "vocab joins are BroadcastHashJoins on the capped token/bigram keys",
    "recrawl_priority": "NESTED_LOOP = broadcast cross join vs the "
    "ONE-row observation-horizon aggregate (max ts — the 'now' every "
    "page's staleness is measured against); the revisit-log window and "
    "per-page aggregate share one hash exchange",
    "index_neardup": "NESTED_LOOP = the IVF/PQ codebook broadcast cross "
    "joins read from the persisted index (same bounded shape as "
    "vector_index_search) plus the |increment|-row broadcast rerank join",
    "vector_index_search": "NESTED_LOOP = the IVF/PQ codebook broadcast "
    "cross joins (n_cells / m*k rows, same bounded shape as ann_ivf / "
    "pq_topk) read from the persisted index tables",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from distributed_crawl_spark.session import build_session

    spark = build_session(app_name="explain_audit", cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            results.append(audit(name, fn(spark, sf_dir)))
        except Exception as exc:  # pragma: no cover
            results.append({"name": name, "error": str(exc)[:200]})

    lines = [
        "# PLANS — physical-plan audit of the contract queries",
        "",
        "Generated by `tools/explain_audit.py` (Catalyst `explain('formatted')`"
        " at sf0.01, AQE on). Flags: CARTESIAN = cartesian product,"
        " ROW_PYTHON_UDF = row-at-a-time Python (forbidden — everything"
        " crosses via Arrow), NESTED_LOOP = broadcast nested loop join.",
        "",
        "| query | exchanges | scans | codegen spans | joins | flags |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        if "error" in r:
            lines.append(f"| {r['name']} | — | — | — | — | ERROR: {r['error']} |")
            continue
        flag_txt = ", ".join(r["flags"]) or "ok"
        if r["flags"] and r["name"] in EXPECTED_FLAGS:
            flag_txt += " (expected, see below)"
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['scans']} |"
            f" {r['codegen_spans']} | {', '.join(r['joins']) or '—'} |"
            f" {flag_txt} |"
        )
    expected = [
        f"- **{r['name']}**: {EXPECTED_FLAGS[r['name']]}"
        for r in results
        if r.get("flags") and r["name"] in EXPECTED_FLAGS
    ]
    if expected:
        lines += ["", "## Expected flags (design, not defects)", "", *expected]
    lines += [
        "",
        "## Scan pruning evidence (ReadSchema per scan, first 3 queries with scans)",
        "",
    ]
    shown = 0
    for r in results:
        if "error" in r or not r.get("read_schema") or shown >= 6:
            continue
        lines.append(f"- **{r['name']}**: " + "; ".join(
            s[:140] for s in r["read_schema"][:3]
        ))
        shown += 1
    out = "\n".join(lines) + "\n"
    (REPO / "PLANS.md").write_text(out)
    print(out)
    bad = [
        r["name"]
        for r in results
        if r.get("flags") and r["name"] not in EXPECTED_FLAGS
    ]
    print("UNEXPECTED FLAGS:", bad or "none")


if __name__ == "__main__":
    main()
