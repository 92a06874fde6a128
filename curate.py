"""spark-submit entry point for the corpus-curation pipeline.

    spark-submit --py-files engine.zip curate.py \
        --docs /data/documents_parquet --out /data/curated \
        --neardup minhash --gopher --pii --split 0.9,0.05,0.05 \
        --source-cap 10000

Composes the engine's training-data operators over a documents table
(doc_id, text, source, ...) into ONE Catalyst plan with ONE output
write: near-dup canonicalization (simhash64 or MinHash-LSH pairs →
connected components → keep cluster minima), semantic dedup over an
embeddings table (``--semdedup``, SemDeDup cluster-then-compare), the
Gopher quality gate, PII redaction (rewrites ``text``), deterministic
hash splits, and the C4-style per-source cap. The flagged table is persisted once; stage
keep counts come from one slim aggregate over it (Spark Observations
can't ride a node that later branches into the split/cap self-joins)
and the output count rides an Observation on the single write.

Outputs: ``<out>/`` curated parquet (all input columns, text possibly
redacted, + ``split`` when requested) and ``<out>/report.json`` with
per-stage keep/drop counts.

Additional stages: ``--sample``/``--sample-rates`` (seeded deterministic
mixing sample), ``--decontaminate BENCH`` (drop docs sharing an n-gram
with a benchmark table), ``--scrub-spans W`` (cross-doc duplicated-span
removal, rewrites text), ``--scrub-substrings W[:S]`` (the
arbitrary-offset winnowed-anchor upgrade — catches misaligned
repeats). ``--report-only`` computes report.json without
writing the corpus. ``--dedup-against PRIOR`` drops docs already in a
prior corpus snapshot (exact digest or MinHash LSH band hit — the prior
corpus is probed via its dedup_index, never re-shuffled);
``--write-index DIR`` persists the output corpus's index so the next
increment can ``--dedup-against-index DIR`` without reading the corpus
at all.
``--mix-report`` appends a per-(source[, split]) doc/token/char census
of the output corpus to report.json. ``--pack-tokens B`` plans training
shards (seeded deterministic shuffle order, ~B tokens per shard) and
adds writer/shard_id/offset_tokens columns to the output.
``--fix-mojibake`` repairs utf8-read-as-cp1252 double encodings first;
``--normalize-nfc`` unicode-canonicalizes text before EVERY other stage
(composed/decomposed variants collide in all downstream dedup);
``--dedup-exact plain|normalized`` drops within-corpus exact duplicates
(normalized = CCNet hash normalization, so case/accent/digit/punct
variants collapse); ``--dedup-lines`` removes within-doc duplicated
lines before any other stage; ``--boilerplate [FRAC]`` removes host-scoped chrome lines
(present in >= FRAC of a source's docs) from all of that source's docs;
``--dedup-lines-global`` removes lines duplicated across docs
(keep-first); ``--drop-contained THR`` drops docs whose shingle set is
asymmetrically contained in another doc's (quotes/aggregator copies,
the case symmetric near-dup misses); ``--quantile-gate P`` keeps docs at/above their own
source's P-th quality percentile; ``--classifier-gate T`` keeps docs
whose hashed-linear-classifier mean token score reaches T milli-units
(``--classifier-weights`` plugs in a trained (bucket, w_milli) table);
``--lm-gate P`` drops docs below the
corpus-wide P-th percentile of self-trained unigram log-probability;
``--ccnet-keep head,middle`` keeps only the listed CCNet per-language
perplexity buckets (``--ccnet-lang-col`` names a ground-truth language
column). ``--blocklist CSV`` applies the UT1/FineWeb URL gate (domain
suffix match + banned-keyword score) before any content stage.
``--drop-soft404 [MAXWORDS]`` drops soft-404 pages (error phrase +
short body, pagehealth.soft404_phrase) that slipped through fetch as
HTTP 200s; ``--drop-templates PARQUET`` drops docs matching a LEARNED
error-template digest table (pagehealth.soft404_hosts output) — the
ingest-side kill of known per-host error pages.
``--c4`` applies the C4 cleaning rules (bad lines removed — later
gates score the cleaned text — and the doc-level keep rules).
``--watch`` turns the whole run into CONTINUOUS mode: --docs becomes a
parquet drop directory, the stream-compatible gates (--keep-lang,
--min-quality, --gopher, --c4, --blocklist, --classifier-weights +
--classifier-gate) run in flight, and each invocation drains what has
landed exactly-once (checkpoint under <out>/_checkpoint) into appended
parquet — or WET segments with --out-format wet.
``--bpe-train K`` learns a K-merge BPE tokenizer on the post-gate
corpus (word-census iterations), records the merges in report.json
(``--save-merges`` persists them) and adds exact ``n_bpe_tokens``.
``--mix-weights SRC=W,...`` derives the per-source sample rates from
integer mix weights (mix_plan over the docs the other gates keep: the
bottleneck source samples at 100%, others proportionally) and records
the plan in report.json. ``--keep-script S`` / ``--keep-lang L`` are
zero-shuffle routing gates on dominant Unicode script / heuristic
language ID.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="PySpark corpus curation")
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--docs-format", choices=["parquet", "wet", "jsonl"],
                    default="parquet",
                    help="wet = Common Crawl WET segments (doc_id=url, "
                    "source=host, text from conversion records); jsonl = "
                    "JSON-lines files ((doc_id, text, source, ...) objects, "
                    ".gz ok — the format --out-format jsonl emits)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--dedup-exact", choices=["plain", "normalized"],
                    help="within-corpus exact dedup (keep each digest "
                    "group's min-id doc); 'normalized' hashes the "
                    "CCNet-normalized text (case/accent/digit/punct "
                    "variants collapse)")
    ap.add_argument("--neardup", choices=["simhash", "minhash"],
                    help="drop near-duplicates, keeping each cluster's "
                    "min-id document (pair engine per choice)")
    ap.add_argument("--max-hamming", type=int, default=3,
                    help="simhash64 hamming radius (with --neardup simhash)")
    ap.add_argument("--drop-contained", type=float, metavar="THR",
                    help="asymmetric containment scrub (Broder): drop "
                    "docs whose rare-shingle set is >= THR contained in "
                    "another doc's (quotes, aggregator copies — the case "
                    "symmetric near-dup misses); mutual pairs keep the "
                    "min-id doc; posting lists bounded at max_df=256")
    ap.add_argument("--semdedup", metavar="EMB_PARQUET",
                    help="semantic dedup (SemDeDup): drop docs whose "
                    "embedding is a non-canonical member of a "
                    "near-identical cluster group (vec_id joins doc_id; "
                    "docs without an embedding are kept)")
    ap.add_argument("--semdedup-threshold", type=float, default=0.7,
                    metavar="COS", help="within-cluster cosine above "
                    "which two docs count as semantic duplicates")
    ap.add_argument("--semdedup-cells", type=int, default=64, metavar="K",
                    help="IVF cells for the cluster-then-compare pass "
                    "(raise to split giant clusters)")
    ap.add_argument("--blocklist", metavar="CSV",
                    help="UT1-style domain blocklist (csv lines "
                    "domain[,category]): drop docs whose URL host — or "
                    "any parent domain — is listed, or whose URL scores "
                    ">=2 banned-keyword hits (FineWeb URL gate)")
    ap.add_argument("--blocklist-url-col", metavar="COL",
                    help="column holding the doc URL (default: the id "
                    "column — WET corpora use doc_id=url)")
    ap.add_argument("--ccnet-keep", metavar="B1,B2",
                    help="CCNet perplexity-bucket gate: keep docs whose "
                    "per-language unigram-LM bucket is listed (e.g. "
                    "head,middle — drop the gibberish tail third)")
    ap.add_argument("--ccnet-lang-col", metavar="COL",
                    help="existing language column for --ccnet-keep "
                    "(default: predict with the marker-lexicon lang_id)")
    ap.add_argument("--c4", action="store_true",
                    help="apply the C4 cleaning rules: offending lines "
                    "(no terminal punctuation / too short / js-cookie "
                    "banners) are REMOVED (text rewritten, later gates "
                    "score the cleaned doc) and docs failing the "
                    "min-lines/brace/lorem rules are dropped")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the Gopher document-quality bounds")
    ap.add_argument("--gopher-stopwords", metavar="W1,W2,...",
                    help="stopword lexicon for the >=2-distinct-stopwords "
                    "rule (default: the paper's 8 English words; adapt to "
                    "your corpus's language/domain)")
    ap.add_argument("--pii", action="store_true",
                    help="redact emails/IPv4s/phones in the text column")
    ap.add_argument("--drop-soft404", type=int, nargs="?", const=80,
                    metavar="MAXWORDS",
                    help="drop soft-404 pages: an error phrase present "
                    "AND word count <= MAXWORDS (default 80) — the "
                    "Bar-Yossef WWW'04 signals over extracted text")
    ap.add_argument("--drop-templates", metavar="PARQUET",
                    help="drop docs whose md5(text) appears in a learned "
                    "error-template table (column digest or "
                    "template_digest — e.g. pagehealth.soft404_hosts "
                    "output): the ingest-side drop of known per-host "
                    "error pages, a broadcast anti-join")
    ap.add_argument("--split-clusters", action="store_true",
                    help="with --split: hash the simhash64 near-dup "
                    "COMPONENT instead of the doc id, so a duplicate "
                    "family never straddles train/test (leakage-aware "
                    "split; use when near-dups are kept in the corpus)")
    ap.add_argument("--split", metavar="W1,W2,...",
                    help="deterministic hash split weights (normalized "
                    "by their sum, so 0.9,0.05,0.05 and 90,5,5 are "
                    "equivalent) -> train/val/test column")
    ap.add_argument("--source-cap", type=int, metavar="K",
                    help="keep at most K docs per source, best "
                    "quality_score_int first")
    ap.add_argument("--sample", type=float, metavar="RATE",
                    help="seeded deterministic downsample: keep RATE of "
                    "docs (hash threshold — reproducible, monotone in RATE)")
    ap.add_argument("--sample-rates", metavar="SRC=R,SRC=R,...",
                    help="per-source keep fractions overriding --sample "
                    "(the training-mix weights)")
    ap.add_argument("--sample-seed", default="s42",
                    help="sampling seed; a different seed draws an "
                    "independent sample")
    ap.add_argument("--mix-weights", metavar="SRC=W,SRC=W,...",
                    help="derive per-source sample rates from integer "
                    "mix weights (mix_plan: the bottleneck source "
                    "samples at 100%%, others proportionally; unlisted "
                    "sources get weight 1, weight 0 excludes). "
                    "Overrides --sample/--sample-rates; the computed "
                    "plan lands in report.json")
    ap.add_argument("--decontaminate", metavar="BENCH_PARQUET",
                    help="drop docs sharing any word n-gram with the "
                    "benchmark table's text column (eval-leak removal)")
    ap.add_argument("--decontaminate-n", type=int, default=8, metavar="N",
                    help="overlap n-gram width (default 8)")
    ap.add_argument("--scrub-spans", type=int, metavar="W",
                    help="remove W-word chunks occurring in >=2 distinct "
                    "docs and stitch the survivors (cross-doc boilerplate "
                    "scrub; rewrites the text column)")
    ap.add_argument("--scrub-min-docs", type=int, default=2, metavar="D",
                    help="chunk is scrubbed when seen in >= D distinct docs")
    ap.add_argument("--scrub-substrings", metavar="W[:S]",
                    help="arbitrary-OFFSET repeated-span scrub (winnowed "
                    "anchors): remove every token covered by a cross-doc "
                    "repeated span of >= W tokens at ANY offset (stride S, "
                    "default 16) and stitch the survivors — catches the "
                    "misaligned repeats --scrub-spans' chunk grid misses; "
                    "shares --scrub-min-docs")
    ap.add_argument("--report-only", action="store_true",
                    help="compute report.json (stage keep/drop counts) "
                    "without writing the curated corpus")
    ap.add_argument("--dedup-against", metavar="CORPUS_PARQUET",
                    help="continual-crawl dedup: drop docs whose exact "
                    "digest or any MinHash LSH band hits the given prior "
                    "corpus (its dedup_index is built on the fly; the "
                    "prior corpus is probed, never re-shuffled)")
    ap.add_argument("--dedup-against-index", metavar="INDEX_PARQUET",
                    help="like --dedup-against but probes a PRE-WRITTEN "
                    "dedup index (from --write-index) — the prior corpus "
                    "is not even read; cost is O(increment + index "
                    "partitions touched)")
    ap.add_argument("--diff-against", metavar="CORPUS_PARQUET",
                    help="append an added/removed/changed/same census of "
                    "the OUTPUT corpus vs a prior snapshot to report.json "
                    "(what did this refresh actually change?)")
    ap.add_argument("--write-index", metavar="DIR",
                    help="after curation, write the OUTPUT corpus's "
                    "dedup index (distinct digests + MinHash LSH band "
                    "keys, doc-id-free) for the next increment's "
                    "--dedup-against-index")
    ap.add_argument("--quantile-gate", type=float, metavar="P",
                    help="keep docs at/above their own source's P-th "
                    "quality percentile (adaptive per-source threshold; "
                    "use binary-representable P like 0.5/0.25/0.75)")
    ap.add_argument("--fix-mojibake", action="store_true",
                    help="repair utf8-read-as-cp1252 mojibake in text "
                         "(ftfy pass; runs with --normalize-nfc in the "
                         "very first stage, before any hashing)")
    ap.add_argument("--normalize-nfc", action="store_true",
                    help="unicode-NFC-normalize text first, so composed/"
                    "decomposed variants collide in every dedup stage")
    ap.add_argument("--dedup-lines", action="store_true",
                    help="remove duplicated lines WITHIN each doc "
                    "(keep first occurrence, preserve order; rewrites "
                    "the text column)")
    ap.add_argument("--boilerplate", type=float, nargs="?", const=0.5,
                    metavar="FRAC",
                    help="remove lines appearing in >= FRAC (default 0.5) "
                         "of a source's docs from ALL of that source's "
                         "docs (host-scoped chrome filter; runs before "
                         "the cross-doc keep-first line dedup)")
    ap.add_argument("--dedup-lines-global", action="store_true",
                    help="remove lines duplicated ACROSS docs, keeping "
                    "only the first (doc_id, pos) occurrence corpus-wide "
                    "(CCNet/RefinedWeb line filter; rewrites the text "
                    "column)")
    ap.add_argument("--classifier-gate", type=int, metavar="THR_MILLI",
                    help="hashed-linear-classifier quality gate: keep "
                         "docs whose mean token score (milli-units) "
                         "reaches THR_MILLI (stub weights unless "
                         "--classifier-weights points at a trained "
                         "(bucket, w_milli) parquet)")
    ap.add_argument("--classifier-weights", metavar="PARQUET",
                    help="trained weight table for --classifier-gate")
    ap.add_argument("--classifier-train", metavar="POS:NEG",
                    help="train the hashed linear classifier in-run "
                    "from two labeled parquet corpora (DCLM recipe) and "
                    "use the result for --classifier-gate (overrides "
                    "--classifier-weights)")
    ap.add_argument("--save-classifier", metavar="DIR",
                    help="persist the --classifier-train weight table "
                    "(bucket, w_milli) for reuse via "
                    "--classifier-weights")
    ap.add_argument("--lm-gate", type=float, metavar="P",
                    help="drop docs below the corpus-wide P-th percentile "
                    "of mean unigram log-probability (self-trained LM "
                    "fluency cut, e.g. 0.1 drops the most-gibberish 10%%)")
    ap.add_argument("--keep-script",
                    choices=["arabic", "cyrillic", "han", "hangul",
                             "latin"],
                    help="keep only docs whose dominant Unicode script "
                    "is SCRIPT (mC4-style routing pre-filter; pure "
                    "projection, zero shuffle)")
    ap.add_argument("--keep-lang", metavar="LANG",
                    help="keep only docs the n-gram heuristic language "
                    "ID classifies as LANG (de/en/es/fr; pure "
                    "projection, zero shuffle)")
    ap.add_argument("--chunk", metavar="WIN[:STRIDE]",
                    help="emit overlapping token-window chunks instead "
                         "of whole documents (one row per chunk: id, "
                         "chunk_idx, n_tokens, chunk); STRIDE defaults "
                         "to 3*WIN/4; exclusive with document-shaped "
                         "output stages (pack/wet/scrub/split/index/"
                         "diff/mix-report)")
    ap.add_argument("--pack-tokens", type=int, metavar="B",
                    help="assign each output doc a training shard id: "
                    "seeded deterministic shuffle order + ~B whitespace "
                    "tokens per shard (adds writer/shard_id/offset "
                    "columns)")
    ap.add_argument("--pack-writers", type=int, default=32, metavar="W",
                    help="parallel writer lanes for --pack-tokens "
                    "(uniform hash lanes; size ~= a few x cluster cores)")
    ap.add_argument("--lang-mix-report", action="store_true",
                    help="append per-source language-mix stats (majority "
                    "share bp + entropy micro-nats) of the output corpus "
                    "to report.json; language from --ccnet-lang-col if "
                    "given, else marker-lexicon lang_id")
    ap.add_argument("--mix-report", action="store_true",
                    help="add a per-(source[,split]) doc/token census of "
                    "the output corpus to report.json")
    ap.add_argument("--out-format", choices=["parquet", "jsonl", "wet"],
                    default="parquet",
                    help="curated-corpus file format (jsonl = gzipped "
                    "JSON lines, the common training-corpus interchange; "
                    "wet = Common Crawl WET segments + manifest — the id "
                    "column must carry the url)")
    ap.add_argument("--bpe-train", type=int, metavar="K",
                    help="train K BPE merges on the post-gate corpus "
                    "(word-census iterations; corpus touched once), add "
                    "an exact n_bpe_tokens column to the output, and "
                    "record the merge list in report.json")
    ap.add_argument("--save-merges", metavar="DIR",
                    help="persist the --bpe-train merge table "
                    "(rank, left, right) as parquet")
    ap.add_argument("--bpe-batch", type=int, default=1, metavar="M",
                    help="accept up to M merge-independent pairs per "
                    "BPE census pass (~K/M Spark jobs instead of K; "
                    "M=1 is exact sequential Sennrich — the default)")
    ap.add_argument("--watch", action="store_true",
                    help="continuous mode: treat --docs as a parquet "
                    "drop DIRECTORY and curate files as they land "
                    "(stream_curate gate stack: --keep-lang, quality, "
                    "--gopher, --c4, --blocklist, --classifier-weights; "
                    "corpus-relative stages are batch-only). Output "
                    "appends to <out>/ as parquet — or WET segments "
                    "with --out-format wet — checkpointed under "
                    "<out>/_checkpoint; each invocation drains what is "
                    "present and exits (cron-able; exactly-once across "
                    "runs)")
    ap.add_argument("--min-quality", type=int, metavar="Q",
                    help="with --watch: integer quality_score_int floor "
                    "(default: no quality gate)")
    ap.add_argument("--cores", type=int, help="local[N] (omit under spark-submit)")
    args = ap.parse_args(argv)

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from distributed_crawl_spark.functions import curation as CU
    from distributed_crawl_spark.functions import dedup as DD
    from distributed_crawl_spark.functions import textstats as TS
    from distributed_crawl_spark.session import build_session

    if args.cores:
        spark = build_session(app_name="curate", cores=args.cores,
                              shuffle_partitions=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("curate").getOrCreate()

    if args.watch:
        import os as _os

        from distributed_crawl_spark.streaming.stream import (
            publish_wet_stream,
            run_available_now_to_dir,
            stream_curate,
        )

        bl = None
        if args.blocklist:
            bl = (
                spark.read.schema("domain STRING, category STRING")
                .csv(args.blocklist)
                .withColumn("category",
                            F.coalesce("category", F.lit("blocked")))
            )
        w = (spark.read.parquet(args.classifier_weights)
             if args.classifier_weights else None)
        stream = stream_curate(
            spark, args.docs,
            min_quality=args.min_quality,
            langs=(args.keep_lang,) if args.keep_lang else None,
            gopher=args.gopher,
            stopwords=(args.gopher_stopwords.split(",")
                       if args.gopher_stopwords else None),
            blocklist=bl,
            url_col=args.blocklist_url_col or args.id_col,
            c4=args.c4,
            classifier_weights=w,
            classifier_threshold_milli=args.classifier_gate or 0,
        )
        ck = _os.path.join(args.out, "_checkpoint")
        if args.out_format == "wet":
            publish_wet_stream(stream, args.out, ck,
                               url_col=args.id_col,
                               text_col=args.text_col)
        else:
            run_available_now_to_dir(stream, args.out, ck)
        return 0

    if args.docs_format == "wet":
        from distributed_crawl_spark.sources.warc import (
            read_wet,
            wet_documents,
        )

        docs = wet_documents(read_wet(spark, args.docs))
    elif args.docs_format == "jsonl":
        docs = spark.read.json(args.docs)
    else:
        docs = spark.read.parquet(args.docs)
    in_cols = docs.columns
    id_c, text_c, src_c = args.id_col, args.text_col, args.source_col

    if args.fix_mojibake:
        # repair double-encodings BEFORE NFC: mojibake bytes aren't a
        # normalization form, they're a different (wrong) string entirely
        from distributed_crawl_spark.functions.text import fix_mojibake_udf

        docs = docs.withColumn(text_c, fix_mojibake_udf(F.col(text_c)))
    if args.normalize_nfc:
        # very first stage: canonicalize unicode BEFORE any hashing/dedup
        # stage so composed/decomposed variants of the same text collide
        from distributed_crawl_spark.functions.text import nfc_normalize_udf

        docs = docs.withColumn(text_c, nfc_normalize_udf(F.col(text_c)))
    if args.dedup_lines:
        # first stage: every downstream filter/gate scores the cleaned text
        docs = docs.withColumn(text_c, TS.dedup_lines(F.col(text_c)))
    if args.boilerplate is not None:
        bp = DD.host_boilerplate(
            docs, id_col=id_c, text_col=text_c, host_col=src_c,
            frac=args.boilerplate,
        ).select(
            F.col(id_c).alias("__bp_id"),
            F.col("clean_text").alias("__bp_text"),
        )
        docs = docs.join(
            bp, docs[id_c] == bp["__bp_id"], "left"
        ).withColumn(
            text_c, F.coalesce(F.col("__bp_text"), F.col(text_c))
        ).drop("__bp_id", "__bp_text")
    if args.dedup_lines_global:
        gl = DD.global_line_dedup(docs, id_col=id_c, text_col=text_c).select(
            F.col(id_c).alias("__gl_id"),
            F.col("clean_text").alias("__gl_text"),
        )
        docs = docs.join(
            gl, docs[id_c] == gl["__gl_id"], "left"
        ).withColumn(
            text_c, F.coalesce(F.col("__gl_text"), F.col(text_c))
        ).drop("__gl_id", "__gl_text")

    flags = []  # (name, Column) keep-flags, all observed on the one write
    if args.blocklist:
        from distributed_crawl_spark.functions import url as UF

        url_c = args.blocklist_url_col or id_c
        bl = (
            spark.read.schema("domain STRING, category STRING")
            .csv(args.blocklist)
            .withColumn("category", F.coalesce("category", F.lit("blocked")))
        )
        keep = (
            UF.blocklist_filter(
                docs.select(F.col(id_c), F.col(url_c).alias("url")),
                bl,
            )
            .filter(F.col("keep"))
            .select(F.col(id_c).alias("__bl_id"))
        )
        docs = docs.join(
            keep, docs[id_c] == keep["__bl_id"], "left"
        ).withColumn(
            "__keep_blocklist", F.col("__bl_id").isNotNull()
        ).drop("__bl_id")
        flags.append("__keep_blocklist")
    if args.c4:
        # rewrite + gate in one stage: line rules rewrite the text (so
        # every later gate scores the CLEANED doc), doc rules flag keep
        c4 = CU.c4_clean(docs, id_col=id_c, text_col=text_c).select(
            F.col(id_c).alias("__c4_id"), "clean_text",
            F.col("keep").alias("__c4_keep"),
        )
        docs = docs.join(
            c4, docs[id_c] == c4["__c4_id"], "left"
        ).withColumn(
            text_c, F.coalesce(F.col("clean_text"), F.col(text_c))
        ).withColumn(
            "__keep_c4", F.coalesce(F.col("__c4_keep"), F.lit(False))
        ).drop("__c4_id", "clean_text", "__c4_keep")
        flags.append("__keep_c4")
    if args.keep_script:
        prof = TS.script_profile(F.col(text_c))
        docs = docs.withColumn(
            "__keep_script", prof["main_script"] == args.keep_script
        )
        flags.append("__keep_script")
    if args.keep_lang:
        docs = docs.withColumn(
            "__keep_lang", TS.lang_id(F.col(text_c)) == args.keep_lang
        )
        flags.append("__keep_lang")
    if args.dedup_exact:
        canon = DD.exact_duplicates(
            docs, id_col=id_c, text_col=text_c,
            normalize=args.dedup_exact == "normalized",
        ).select(F.col("canonical_id").alias("__ex_id"))
        docs = docs.join(
            canon, docs[id_c] == canon["__ex_id"], "left"
        ).withColumn(
            "__keep_exact", F.col("__ex_id").isNotNull()
        ).drop("__ex_id")
        flags.append("__keep_exact")
    if args.neardup:
        if args.neardup == "simhash":
            pairs = DD.simhash_pairs64(
                docs, id_col=id_c, text_col=text_c,
                max_hamming=args.max_hamming,
            )
        else:
            pairs = DD.minhash_lsh_pairs(docs, id_col=id_c, text_col=text_c)
        comp = DD.near_dup_components(pairs)
        # dedup-report histogram: comp is already localCheckpoint'ed by
        # the CC iterations, so this is one tiny census job over the
        # materialized labels (<= |distinct sizes| rows collected)
        neardup_hist = [
            {"cluster_size": int(r.cluster_size),
             "n_clusters": int(r.n_clusters), "n_docs": int(r.n_docs)}
            for r in DD.cluster_stats(comp).collect()
        ]
        drop = comp.filter(F.col("component_id") != F.col("doc_id")).select(
            F.col("doc_id").alias("__drop_id")
        )
        docs = docs.join(
            drop, docs[id_c] == drop["__drop_id"], "left"
        ).withColumn(
            "__keep_neardup", F.col("__drop_id").isNull()
        ).drop("__drop_id")
        flags.append("__keep_neardup")
    if args.drop_contained is not None:
        cp = DD.ngram_containment_pairs(
            docs, id_col=id_c, text_col=text_c,
            threshold=args.drop_contained, max_df=256,
        ).select("contained_id", "container_id")
        mutual = cp.select(
            F.col("container_id").alias("contained_id"),
            F.col("contained_id").alias("container_id"),
        ).withColumn("__mut", F.lit(True))
        # one-way containment drops the contained doc; a mutual pair
        # (both directions >= THR) keeps the min id — greedy, like the
        # neardup component rule (X ⊂ Y ⊂ Z chains resolve transitively
        # because containment is near-transitive at high THR)
        ct_drop = (
            cp.join(mutual, ["contained_id", "container_id"], "left")
            .filter(F.col("__mut").isNull()
                    | (F.col("container_id") < F.col("contained_id")))
            .select(F.col("contained_id").alias("__ct_id"))
            .distinct()
        )
        docs = docs.join(
            ct_drop, docs[id_c] == ct_drop["__ct_id"], "left"
        ).withColumn(
            "__keep_contained", F.col("__ct_id").isNull()
        ).drop("__ct_id")
        flags.append("__keep_contained")
    if args.semdedup:
        from distributed_crawl_spark.functions import similarity as SIM

        sd = SIM.semdedup(
            spark.read.parquet(args.semdedup),
            n_cells=args.semdedup_cells,
            threshold=args.semdedup_threshold,
        ).select(
            F.col("vec_id").alias("__sd_id"),
            F.col("keep").alias("__sd_keep"),
        )
        docs = docs.join(
            sd, docs[id_c] == sd["__sd_id"], "left"
        ).withColumn(
            "__keep_semdedup",
            F.coalesce(F.col("__sd_keep"), F.lit(True)),
        ).drop("__sd_id", "__sd_keep")
        flags.append("__keep_semdedup")
    if args.dedup_against or args.dedup_against_index:
        if args.dedup_against_index:
            idx = spark.read.parquet(args.dedup_against_index)
        else:
            prior = spark.read.parquet(args.dedup_against)
            idx = DD.dedup_index(prior, id_col=id_c, text_col=text_c)
        keep = DD.incremental_dedup(
            docs, idx, id_col=id_c, text_col=text_c
        ).filter(F.col("keep")).select(F.col(id_c).alias("__inc_id"))
        docs = docs.join(
            keep, docs[id_c] == keep["__inc_id"], "left"
        ).withColumn(
            "__keep_prior", F.col("__inc_id").isNotNull()
        ).drop("__inc_id")
        flags.append("__keep_prior")
    if args.gopher:
        stop = (
            args.gopher_stopwords.split(",") if args.gopher_stopwords else None
        )
        feats = TS.gopher_features(F.col(text_c), stopwords=stop)
        docs = docs.withColumn("__keep_gopher", TS.gopher_keep(feats))
        flags.append("__keep_gopher")
    if args.drop_soft404 is not None:
        from distributed_crawl_spark.functions.pagehealth import (
            soft404_phrase,
        )
        docs = docs.withColumn(
            "__keep_soft404",
            ~(soft404_phrase(F.col(text_c))
              & (TS.word_count(F.col(text_c)) <= args.drop_soft404)),
        )
        flags.append("__keep_soft404")
    if args.drop_templates:
        tdf = spark.read.parquet(args.drop_templates)
        dcol = ("digest" if "digest" in tdf.columns else "template_digest")
        tmpl = tdf.select(F.col(dcol).alias("__t_digest")).distinct()
        docs = docs.join(
            F.broadcast(tmpl),
            F.md5(F.col(text_c)) == F.col("__t_digest"),
            "left",
        ).withColumn(
            "__keep_template", F.col("__t_digest").isNull()
        ).drop("__t_digest")
        flags.append("__keep_template")
    if args.quantile_gate is not None:
        keep = CU.quality_quantile_gate(
            docs, p=args.quantile_gate, id_col=id_c, text_col=text_c,
            source_col=src_c,
        ).filter(F.col("keep")).select(F.col(id_c).alias("__qg_id"))
        docs = docs.join(
            keep, docs[id_c] == keep["__qg_id"], "left"
        ).withColumn(
            "__keep_quantile", F.col("__qg_id").isNotNull()
        ).drop("__qg_id")
        flags.append("__keep_quantile")
    if args.classifier_gate is not None:
        if args.classifier_train:
            pos_path, neg_path = args.classifier_train.split(":", 1)
            w = TS.train_quality_classifier(
                spark.read.parquet(pos_path),
                spark.read.parquet(neg_path),
                id_col=id_c, text_col=text_c,
            )
            if args.save_classifier:
                w.write.mode("overwrite").parquet(args.save_classifier)
                w = spark.read.parquet(args.save_classifier)
        else:
            w = (
                spark.read.parquet(args.classifier_weights)
                if args.classifier_weights else None
            )
        keep = TS.quality_classifier(
            docs, weights=w, threshold_milli=args.classifier_gate,
            id_col=id_c, text_col=text_c,
        ).filter(F.col("keep")).select(F.col(id_c).alias("__cg_id"))
        docs = docs.join(
            keep, docs[id_c] == keep["__cg_id"], "left"
        ).withColumn(
            "__keep_classifier", F.col("__cg_id").isNotNull()
        ).drop("__cg_id")
        flags.append("__keep_classifier")
    if args.lm_gate is not None:
        keep = TS.unigram_logprob_gate(
            docs, p=args.lm_gate, id_col=id_c, text_col=text_c,
        ).filter(F.col("keep")).select(F.col(id_c).alias("__lm_id"))
        docs = docs.join(
            keep, docs[id_c] == keep["__lm_id"], "left"
        ).withColumn(
            "__keep_lm", F.col("__lm_id").isNotNull()
        ).drop("__lm_id")
        flags.append("__keep_lm")
    if args.ccnet_keep:
        buckets = [b.strip() for b in args.ccnet_keep.split(",") if b.strip()]
        keep = (
            TS.ccnet_buckets(
                docs, id_col=id_c, text_col=text_c,
                lang_col=args.ccnet_lang_col,
            )
            .filter(F.col("bucket").isin(*buckets))
            .select(F.col(id_c).alias("__cb_id"))
        )
        docs = docs.join(
            keep, docs[id_c] == keep["__cb_id"], "left"
        ).withColumn(
            "__keep_ccnet", F.col("__cb_id").isNotNull()
        ).drop("__cb_id")
        flags.append("__keep_ccnet")
    if args.decontaminate:
        bench = spark.read.parquet(args.decontaminate)
        bad = CU.decontaminate(
            docs, bench, n=args.decontaminate_n,
            id_col=id_c, text_col=text_c,
        ).filter(F.col("contaminated")).select(F.col(id_c).alias("__dec_id"))
        docs = docs.join(
            bad, docs[id_c] == bad["__dec_id"], "left"
        ).withColumn(
            "__keep_decontam", F.col("__dec_id").isNull()
        ).drop("__dec_id")
        flags.append("__keep_decontam")

    # sampling runs LAST among the flag stages: with --mix-weights the
    # plan must census only the documents the other gates keep
    mix_plan_rows = None
    inner = None
    if args.mix_weights or args.sample is not None or args.sample_rates:
        default_rate = args.sample if args.sample is not None else 1.0
        if args.mix_weights:
            w = {kv.split("=")[0]: int(kv.split("=")[1])
                 for kv in args.mix_weights.split(",")}
            # persist before the plan's collect (a bounded driver
            # action: <= |sources| rows) so the census and the main
            # write share one materialization of the flag subtrees
            inner = docs = docs.persist()
            surv = docs
            for f in flags:
                surv = surv.filter(F.col(f))
            mix_plan_rows = [
                r.asDict()
                for r in CU.mix_plan(
                    surv, weights=w, text_col=text_c, source_col=src_c
                ).orderBy(src_c).collect()
            ]
            rates = {r["source"]: r["rate_bp"] / 10000
                     for r in mix_plan_rows}
            default_rate = 0.0  # the plan covers every surviving source
        elif args.sample_rates:
            rates = {kv.split("=")[0]: float(kv.split("=")[1])
                     for kv in args.sample_rates.split(",")}
        else:
            rates = None
        kept = CU.corpus_sample(
            docs, rates=rates,
            default_rate=default_rate,
            seed=args.sample_seed, id_col=id_c, source_col=src_c,
        ).select(F.col(id_c).alias("__samp_id"))
        docs = docs.join(
            kept, docs[id_c] == kept["__samp_id"], "left"
        ).withColumn(
            "__keep_sample", F.col("__samp_id").isNotNull()
        ).drop("__samp_id")
        flags.append("__keep_sample")

    # flag counts: one slim agg over the persisted flagged table (the
    # split/cap stages below re-reference `docs`, which Spark's
    # Observation cannot ride across — persist makes the flag pass and
    # every downstream branch share one materialization)
    docs = docs.persist()
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_input"),
        *[F.sum(F.col(f).cast("long")).alias(f) for f in flags],
    ).first()
    if inner is not None:
        inner.unpersist()  # superseded by the outer flagged-table cache
    for f in flags:
        docs = docs.filter(F.col(f))
    docs = docs.drop(*flags)

    if args.pii:
        docs = docs.withColumn(text_c, TS.redact_pii(F.col(text_c)))
    if args.scrub_spans:
        sc = CU.span_scrub(
            docs, w=args.scrub_spans, min_docs=args.scrub_min_docs,
            id_col=id_c, text_col=text_c,
        ).select(
            F.col(id_c).alias("__sc_id"), "clean_text",
            F.col("n_removed").alias("__n_span_removed"),
        )
        docs = docs.join(
            sc, docs[id_c] == sc["__sc_id"], "left"
        ).withColumn(
            text_c, F.coalesce(F.col("clean_text"), F.col(text_c))
        ).drop("__sc_id", "clean_text")
    if args.scrub_substrings:
        parts = args.scrub_substrings.split(":")
        sw = int(parts[0])
        ss = int(parts[1]) if len(parts) > 1 else 16
        sc2 = CU.substring_scrub(
            docs, w=sw, s=ss, min_docs=args.scrub_min_docs,
            id_col=id_c, text_col=text_c,
        ).select(
            F.col(id_c).alias("__ss_id"), "clean_text",
            F.col("n_removed").alias("__n_substr_removed"),
        )
        docs = docs.join(
            sc2, docs[id_c] == sc2["__ss_id"], "left"
        ).withColumn(
            text_c, F.coalesce(F.col("clean_text"), F.col(text_c))
        ).drop("__ss_id", "clean_text")
    if args.source_cap:
        keep = CU.per_source_cap(
            docs, k=args.source_cap, id_col=id_c, text_col=text_c,
            source_col=src_c,
        ).select(F.col(id_c).alias("__cap_id"))
        docs = docs.join(keep, docs[id_c] == keep["__cap_id"], "left_semi")
    out_cols = list(in_cols)
    if args.split:
        raw = [float(w) for w in args.split.split(",")]
        # corpus_split takes fractions summing to <=1; normalize so the
        # common percentage form (80,10,10) doesn't silently collapse
        # every bucket into the first split
        weights = [w / sum(raw) for w in raw]
        names = ["train", "val", "test", "extra4", "extra5"][: len(weights)]
        wmap = dict(zip(names, weights))
        if args.split_clusters:
            # leakage-aware: whole near-dup families share one split
            comp_sp = DD.near_dup_components(DD.simhash_pairs64(
                docs, id_col=id_c, text_col=text_c,
                max_hamming=args.max_hamming,
            ))
            sp = CU.cluster_split(
                docs, comp_sp, weights=wmap, id_col=id_c
            ).select(F.col(id_c).alias("__sp_id"), "split")
        else:
            sp = CU.corpus_split(
                docs, id_col=id_c, weights=wmap
            ).select(F.col(id_c).alias("__sp_id"), "split")
        docs = docs.join(sp, docs[id_c] == sp["__sp_id"], "left").drop("__sp_id")
        out_cols.append("split")
    bpe_merges = None
    if args.bpe_train:
        from distributed_crawl_spark.functions.bpe import (make_segment_udf,
                                                           train_bpe)

        # trained on the SURVIVORS (post-gate corpus = what the
        # tokenizer will actually see); merges land in report.json and
        # the output gains an exact per-doc BPE token count — runs
        # BEFORE packing so --pack-tokens budgets in those exact units
        bpe_merges = train_bpe(docs, k=args.bpe_train, text_col=text_c,
                               batch=args.bpe_batch)
        seg = make_segment_udf(bpe_merges)
        docs = docs.withColumn(
            "n_bpe_tokens", F.size(seg(F.col(text_c))).cast("long")
        )
        out_cols.append("n_bpe_tokens")
        if args.save_merges:
            spark.createDataFrame(
                [(i, a, b) for i, (a, b) in enumerate(bpe_merges)],
                "rank LONG, left STRING, right STRING",
            ).write.mode("overwrite").parquet(args.save_merges)
    if args.pack_tokens:
        pk = CU.pack_shards(
            docs, shard_tokens=args.pack_tokens,
            n_writers=args.pack_writers, id_col=id_c, text_col=text_c,
            # tokenizer-exact when a model was just trained
            count_col="n_bpe_tokens" if bpe_merges is not None else None,
        ).select(
            F.col(id_c).alias("__pk_id"), "writer", "shard_id",
            "offset_tokens",
        )
        docs = docs.join(pk, docs[id_c] == pk["__pk_id"], "left").drop("__pk_id")
        out_cols += ["writer", "shard_id", "offset_tokens"]
    if args.chunk:
        clash = [f for f, v in [("--pack-tokens", args.pack_tokens),
                                ("--out-format wet", args.out_format == "wet"),
                                ("--scrub-spans", args.scrub_spans),
                                ("--scrub-substrings",
                                 args.scrub_substrings),
                                ("--split", args.split),
                                ("--write-index", args.write_index),
                                ("--diff-against", args.diff_against),
                                ("--mix-report", args.mix_report),
                                ("--lang-mix-report",
                                 args.lang_mix_report)] if v]
        if clash:
            ap.error("--chunk emits chunk rows, which the following "
                     "document-shaped stages cannot consume: "
                     + ", ".join(clash))
        parts = args.chunk.split(":")
        win = int(parts[0])
        stride = int(parts[1]) if len(parts) > 1 else max(1, win * 3 // 4)
        # the output rows ARE chunks from here on: one zero-shuffle
        # projection+explode, so it composes with every gate above
        docs = CU.chunk_documents(
            docs, win=win, stride=stride, id_col=id_c, text_col=text_c
        )
        out_cols = [id_c, "chunk_idx", "n_tokens", "chunk"]

    out_aggs = [F.count(F.lit(1)).alias("n_output")]
    if args.scrub_spans:
        out_aggs.append(
            F.sum(F.coalesce(F.col("__n_span_removed"), F.lit(0)))
            .alias("n_spans_removed")
        )
    if args.scrub_substrings:
        out_aggs.append(
            F.sum(F.coalesce(F.col("__n_substr_removed"), F.lit(0)))
            .alias("n_substr_removed")
        )
    if args.report_only:
        # no corpus write: one slim agg replaces the write-riding Observation
        row = docs.agg(*out_aggs).first()
        out_vals = {a: row[a] for a in row.asDict()}
    else:
        obs_out = Observation()
        # observe BEFORE the projection so scrub's span counter (not an
        # output column) is still visible to the metric
        final = docs.observe(obs_out, *out_aggs).select(*out_cols)
        if args.out_format == "wet":
            # WET segments: doc_id carries the url (the WET layout);
            # the applyInPandas writer IS the action the Observation
            # rides (manifest count), no second pass
            from distributed_crawl_spark.sinks.warc import write_wet

            write_wet(
                final, args.out, url_col=id_c, text_col=text_c,
                ts_col="warc_ts",
            ).write.mode("overwrite").parquet(
                os.path.join(args.out, "wet_manifest")
            )
        else:
            writer = final.write.mode("overwrite")
            if args.out_format == "jsonl":
                writer.option("compression", "gzip").json(args.out)
            else:
                writer.parquet(args.out)
        out_vals = obs_out.get

    diff_census = None
    if args.diff_against:
        # <= 4-row census of the generic digest full-outer join; the
        # output side re-reads the persisted flagged table
        prior_docs = spark.read.parquet(args.diff_against)
        diff_census = {
            r["status"]: int(r["n"])
            for r in CU.corpus_diff(
                prior_docs, docs, id_col=id_c, text_col=text_c
            ).groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    index_entries = None
    if args.write_index:
        # index of the OUTPUT corpus (re-read from the persisted flagged
        # table) — the next increment probes this via
        # --dedup-against-index without ever reading the corpus itself
        obs_idx = Observation()
        idx_out = DD.dedup_index(docs, id_col=id_c, text_col=text_c)
        idx_out.observe(obs_idx, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(args.write_index)
        index_entries = int(obs_idx.get["n"])

    lang_mix = None
    if args.lang_mix_report:
        lang_col = (
            F.col(args.ccnet_lang_col)
            if args.ccnet_lang_col else TS.lang_id(F.col(text_c))
        )
        lang_mix = [
            r.asDict()
            for r in TS.host_language_mix(
                docs.select(
                    F.col(src_c).alias("source"), lang_col.alias("lang")
                )
            ).orderBy("host").collect()
        ]

    mix = None
    if args.mix_report:
        # census of the OUTPUT corpus (post every enabled stage) — one
        # map-side-combinable agg over <= |sources|x|splits| keys; an
        # extra action, but it re-reads from the persisted flagged table
        gb = [src_c] + (["split"] if args.split else [])
        mix = [
            r.asDict() for r in docs.groupBy(*gb).agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(TS.word_count(F.col(text_c)).cast("long"))
                .alias("n_tokens"),
                F.sum(TS.char_count(F.col(text_c)).cast("long"))
                .alias("n_chars"),
            ).orderBy(*gb).collect()
        ]

    report = {
        "n_input": int(stats["n_input"]),
        "n_output": int(out_vals["n_output"]),
        "stages": {
            f.strip("_"): int(stats[f]) for f in flags
        },
        "args": {k: v for k, v in vars(args).items() if k != "cores"},
    }
    if args.neardup:
        report["neardup_clusters"] = neardup_hist
    if args.scrub_spans:
        report["n_spans_removed"] = int(out_vals["n_spans_removed"])
    if args.scrub_substrings:
        report["n_substr_removed"] = int(out_vals["n_substr_removed"])
    if bpe_merges is not None:
        report["bpe_merges"] = [list(m) for m in bpe_merges]
    if mix is not None:
        report["mix"] = mix
    if lang_mix is not None:
        report["lang_mix"] = lang_mix
    if mix_plan_rows is not None:
        report["mix_plan"] = mix_plan_rows
    if index_entries is not None:
        report["index_entries"] = index_entries
    if diff_census is not None:
        report["diff"] = diff_census
    from pathlib import Path

    Path(args.out).mkdir(parents=True, exist_ok=True)
    Path(args.out, "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
