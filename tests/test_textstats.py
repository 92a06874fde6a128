"""Text analysis: language ID, quality features, token counts,
fingerprint determinism + order sensitivity; multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_crawl_spark.functions import textstats as TS
from distributed_crawl_spark.operators.multimodal import (
    IMAGE_META_SCHEMA,
    decode_image_fake,
    decode_image_real,
    frame_sample_plan,
    image_metadata,
)

ROWS = [
    (0, "the cat and the dog is in that house of it"),
    (1, "le chat est dans les maisons pour que des"),
    (2, "der hund und die katze ist nicht mit ein"),
    (3, "el perro es la casa que los gatos una para con"),
    (4, "zzz qqq www"),                      # no markers → und
    (5, "a b! c, d; e: f? g."),
]


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(ROWS, "doc_id LONG, text STRING")


def test_lang_id(text_df):
    got = {r.doc_id: r.lang for r in text_df.select(
        "doc_id", TS.lang_id(F.col("text")).alias("lang")).collect()}
    assert got[0] == "en"
    assert got[1] == "fr"
    assert got[2] == "de"
    assert got[3] == "es"
    assert got[4] == "und"


def test_token_counts(text_df):
    out = {r.doc_id: (r.ws, r.bpe) for r in text_df.select(
        "doc_id",
        TS.whitespace_token_count(F.col("text")).alias("ws"),
        TS.bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()}
    assert out[0] == (len(ROWS[0][1].split()), len(ROWS[0][1].split()))
    # letters+punct: 7 single letters + 6 punct marks
    assert out[5] == (7, 13)


def test_punct_and_alpha_counts(text_df):
    r = text_df.filter("doc_id = 5").select(
        TS.punct_count(F.col("text")).alias("p"),
        TS.alpha_count(F.col("text")).alias("a"),
    ).collect()[0]
    assert r.p == 6 and r.a == 7


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta alpha gamma"), (2, "alpha beta gamma")],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r.fp for r in df.select(
        "doc_id", TS.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[0] == got[2]          # deterministic
    assert got[0] != got[1]          # order matters (rolling property)
    assert 0 <= got[0] < TS.MERSENNE31


def test_quality_score_monotone(spark):
    good = "the cat and the dog is in that house of it " * 10
    bad = "@@@@ #### %%%% ^^^^"
    df = spark.createDataFrame([(0, good), (1, bad)], "doc_id LONG, text STRING")
    got = {r.doc_id: r.q for r in df.select(
        "doc_id", TS.quality_score(F.col("text")).alias("q")).collect()}
    assert got[0] > got[1]
    assert 0 <= got[1] <= 100


# --- multimodal plumbing ----------------------------------------------------


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_image_metadata_plumbing(spark):
    media = spark.createDataFrame(
        [(0, "image", b"x" * 100, "image/png"),
         (1, "image", b"", "image/png"),
         (2, "video", b"y" * 3000, "video/mp4")],
        "media_id LONG, kind STRING, payload BINARY, mime STRING",
    )
    out = image_metadata(media, fake=True)
    assert out.schema == IMAGE_META_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows[0].n_bytes == 100
    assert (rows[0].width, rows[0].height, rows[0].channels) == decode_image_fake(b"x" * 100)
    assert rows[1].n_bytes == 0
    # binary column consumed, not emitted — downstream sheds the blob
    assert "payload" not in out.columns


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(0, "video", b"z" * 5000, "video/mp4"), (1, "image", b"q", "image/png")],
        "media_id LONG, kind STRING, payload BINARY, mime STRING",
    )
    rows = frame_sample_plan(media, every_n=2).collect()
    ids = {r.media_id for r in rows}
    assert ids == {0}                      # images filtered out
    frames = sorted(r.frame_index for r in rows)
    assert frames == [0, 2, 4]             # 5000//1024+1 = 5 frames, step 2


def test_pii_redaction_families(spark):
    from distributed_crawl_spark.functions import textstats as TS

    rows = [
        (0, "contact me at jane.doe+spam@example.co.uk thanks"),
        (1, "server 192.168.001.1 responded; backup at 10.0.0.255"),
        (2, "call +1 555-123-4567 or 089 1234 5678 today"),
        (3, "year 2024 and room 42 stay untouched"),
        (4, "mixed: a@b.io on 8.8.8.8 dial 555-000-1111"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    t = F.col("text")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            TS.redact_pii(t).alias("red"),
            TS.pii_count(t, "email").alias("e"),
            TS.pii_count(t, "ipv4").alias("i"),
            TS.pii_count(t, "phone").alias("p"),
        ).collect()
    }
    assert got[0].red == "contact me at <EMAIL> thanks"
    assert (got[0].e, got[0].i, got[0].p) == (1, 0, 0)
    assert got[1].red == "server <IPV4> responded; backup at <IPV4>"
    assert got[2].red == "call <PHONE> or <PHONE> today"
    assert got[3].red == rows[3][1]          # years/small numbers untouched
    assert (got[3].e, got[3].i, got[3].p) == (0, 0, 0)
    assert got[4].red == "mixed: <EMAIL> on <IPV4> dial <PHONE>"


def test_repetition_stats(spark):
    from distributed_crawl_spark.functions import textstats as TS

    rows = [
        (0, "a b\na b\nc d"),            # one duplicated line of 3
        (1, "x y x y x y"),              # dominant bigram "x y"
        (2, "one"),                      # no bigrams
        (3, ""),                         # empty
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in TS.repetition_stats(df).collect()}
    assert got[0].n_lines == 3
    assert got[0].dup_line_frac_x1e4 == 3333   # floor(1/3 * 1e4)
    # "x y x y x y": grams = xy yx xy yx xy -> top "x y" 3 of 5
    assert got[1].n_grams == 5
    assert got[1].top_gram_share_x1e4 == 6000
    assert got[2].n_grams == 0 and got[2].top_gram_share_x1e4 == 0
    assert got[3].n_lines == 1 and got[3].dup_line_frac_x1e4 == 0


def test_gopher_gate_planted_violations(spark):
    """One planted violation per Gopher rule: only the clean doc passes,
    and each dirty doc fails exactly its intended bound."""
    base_words = ("the story is about a fox and it runs to the woods "
                  "of the north in that quiet morning ") * 5  # ~55 words
    clean = base_words
    docs = {
        "clean": clean,
        "too_short": "the fox and a dog",  # word_count < 50
        "long_words": " ".join(["pneumonoultramicroscopic"] * 60)
                      + " the a and is",  # mean_word_len > 10
        "symbol_heavy": clean + " " + "# " * 30,  # symbol/word > 0.1
        "bullets": "\n".join(["- item " + str(i) for i in range(50)])
                   + "\n" + "the a and is of fox " * 20,  # >90% bullet lines
        "ellipsis": "\n".join(
            [f"the fox waits and a line trails {i} ..." for i in range(20)]
        ),  # >30% ellipsis lines (every line)
        "numeric": clean + " " + " ".join(str(i) for i in range(80)),
        # ^ alpha-word fraction < 0.8
        "no_stopwords": " ".join(["fox", "wolf", "bear", "deer"] * 20),
        "repeated_lines": "\n".join(["the same line with a fox"] * 30),
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], ["doc_id", "text"]
    )
    feats = TS.gopher_features(F.col("text"))
    out = df.select(
        "doc_id", *[c.alias(n) for n, c in feats.items()]
    ).withColumn(
        "keep", TS.gopher_keep({n: F.col(n) for n in TS.GOPHER_BOUNDS})
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows["clean"].keep, rows["clean"]
    for k in docs:
        if k != "clean":
            assert not rows[k].keep, (k, rows[k])
    lo, hi = TS.GOPHER_BOUNDS["word_count"]
    assert rows["too_short"].word_count < lo
    assert rows["long_words"].mean_word_len_x100 > TS.GOPHER_BOUNDS["mean_word_len_x100"][1]
    assert rows["symbol_heavy"].symbol_word_ratio_x1e4 > 1000
    assert rows["bullets"].bullet_line_frac_x1e4 > 9000
    assert rows["ellipsis"].ellipsis_line_frac_x1e4 > 3000
    assert rows["numeric"].alpha_word_frac_x1e4 < 8000
    assert rows["no_stopwords"].n_gopher_stopwords < 2
    assert rows["repeated_lines"].dup_line_frac_x1e4 > 3000


def test_dedup_lines_first_occurrence_order(spark):
    rows = [
        (0, "nav\nbody one\nnav\nbody two\nnav"),   # boilerplate repeats
        (1, "a\nb\nc"),                             # nothing repeated
        (2, ""),                                    # empty stays empty
        (3, "x\nx\nx\nx"),                          # collapses to one line
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r.doc_id: r.clean
        for r in df.select(
            "doc_id", TS.dedup_lines(F.col("text")).alias("clean")
        ).collect()
    }
    assert got[0] == "nav\nbody one\nbody two"      # order preserved
    assert got[1] == "a\nb\nc"
    assert got[2] == ""
    assert got[3] == "x"


def test_unigram_logprob_vocab_cap_and_oov(spark):
    """vocab_k binds: only the top-2 tokens are in-vocab; the third
    scores at the OOV floor ln(1/T). Quanta hand-computed: T=6,
    qlp(a)=floor(ln(3/6)*1e6)=-693148, qlp(b)=-1098613, OOV=-1791760."""
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c"), (3, "")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in TS.unigram_logprob(docs, vocab_k=2).collect()
    }
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 0
    assert out[1]["logprob_q"] == (3 * -693148 + -1098613) // 4  # floor div
    assert out[2]["n_tokens"] == 2 and out[2]["n_oov"] == 1
    assert out[2]["logprob_q"] == (-1098613 + -1791760) // 2  # -1445187
    assert out[3]["n_tokens"] == 0 and out[3]["logprob_q"] == 0


def test_script_profile_argmax_and_tiebreak(spark):
    """Script counts over genuinely mixed text; argmax with
    alphabetical tiebreak; digits/punct-only -> 'und'."""
    rows = [
        (1, "hello мир"),          # 5 latin vs 3 cyrillic
        (2, "ab яб"),              # 2 vs 2 tie -> cyrillic (alphabetical)
        (3, "123 !?"),             # no scripted chars
        (4, "한글 han 汉字"),       # hangul 2, latin 3, han 2
        (5, "مرحبا"),              # arabic only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    prof = TS.script_profile(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[prof[f"n_{s}"].alias(f"n_{s}") for s in TS.SCRIPTS],
            prof["main_script"].alias("main_script"),
        ).collect()
    }
    assert out[1]["n_latin"] == 5 and out[1]["n_cyrillic"] == 3
    assert out[1]["main_script"] == "latin"
    assert out[2]["main_script"] == "cyrillic"    # tie, alphabetical
    assert out[3]["main_script"] == "und"
    assert out[4]["n_hangul"] == 2 and out[4]["n_han"] == 2
    assert out[4]["main_script"] == "latin"
    assert out[5]["main_script"] == "arabic" and out[5]["n_arabic"] == 5


def test_audio_metadata_and_chunk_plan(spark):
    """Audio plumbing: fake decode is deterministic arithmetic on the
    payload length; chunk plan covers [0, duration) with ragged tail;
    real decode stays a documented stub."""
    import pytest as _pytest

    from distributed_crawl_spark.operators.multimodal import (
        AUDIO_META_SCHEMA,
        audio_chunk_plan,
        audio_metadata,
        decode_audio_real,
    )

    with _pytest.raises(NotImplementedError):
        decode_audio_real(b"RIFF")

    media = spark.createDataFrame(
        [(0, "audio", b"x" * 100, "audio/wav"),
         (1, "audio", b"", "audio/wav")],
        "media_id LONG, kind STRING, payload BINARY, mime STRING",
    )
    meta = audio_metadata(media, fake=True)
    assert meta.schema == AUDIO_META_SCHEMA
    rows = {r.media_id: r for r in meta.collect()}
    # n=100: sr = 8000*(1+100%6) = 40000, samples = 400, dur = 10ms
    assert rows[0].sample_rate == 40000 and rows[0].n_samples == 400
    assert rows[0].duration_ms == 10
    assert rows[1].n_bytes == 0 and rows[1].duration_ms == 0
    chunks = audio_chunk_plan(meta, chunk_ms=4).collect()
    by_media = {}
    for c in chunks:
        by_media.setdefault(c.media_id, []).append(c)
    got = sorted((c.chunk_index, c.start_ms, c.end_ms)
                 for c in by_media[0])
    assert got == [(0, 0, 4), (1, 4, 8), (2, 8, 10)]   # ragged tail
    assert [(c.start_ms, c.end_ms) for c in by_media[1]] == [(0, 0)]


def test_doc_keywords_tfidf_ranking(spark):
    """Corpus-wide token 'x' (df=N → idf=0) must never outrank a
    doc-unique token; scores are exact BIGINT tf*idf_u products."""
    df = spark.createDataFrame(
        [
            (0, "x x x x apple apple"),
            (1, "x banana"),
            (2, "x x cherry cherry cherry"),
        ],
        "doc_id LONG, text STRING",
    )
    out = TS.doc_keywords(df, k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # unique token wins despite lower tf than the universal 'x'
    assert rows[(0, 1)].tok == "apple"
    assert rows[(1, 1)].tok == "banana"
    assert rows[(2, 1)].tok == "cherry"
    import math

    idf_unique = math.floor(math.log(3.0 / 1.0) * 1_000_000)
    assert rows[(0, 1)].idf_u == idf_unique
    assert rows[(0, 1)].score == 2 * idf_unique  # tf=2 exact product
    # df=N token: idf_u == 0, so score 0, ranked by token asc after
    assert rows[(0, 2)].tok == "x" and rows[(0, 2)].score == 0
    assert out.filter(F.col("rank") > 2).count() == 0


def test_normalize_nfc(spark):
    """Decomposed sequences compose; already-NFC text is flagged
    unchanged; null text survives."""
    from distributed_crawl_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [
            (0, "cafe\u0301 o\u0308"),  # decomposed e-acute, o-umlaut
            (1, "plain ascii"),
            (2, "caf\u00e9"),  # already composed
            (3, None),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: (r.norm_text, r.changed) for r in
           normalize_text(df).collect()}
    assert got[0] == ("caf\u00e9 \u00f6", True)
    assert got[1] == ("plain ascii", False)
    assert got[2] == ("caf\u00e9", False)
    assert got[3] == (None, False)


# ---------------------------------------------------------------------------
# Mojibake repair (functions/text.py fix_mojibake_udf)
# ---------------------------------------------------------------------------

def test_mojibake_fix_classics():
    from distributed_crawl_spark.functions.text import _mojibake_fix_once

    # the canonical utf8-read-as-cp1252 signatures
    assert _mojibake_fix_once("cafÃ©") == "café"      # cafÃ© → café
    assert _mojibake_fix_once("â€™") == "’"      # â€™ → ’
    # clean text is left alone (both gates)
    assert _mojibake_fix_once("ascii only") is None
    assert _mojibake_fix_once("café crème") is None        # genuine latin-1 range
    assert _mojibake_fix_once("я汉") is None                # > U+00FF, no cp1252 image


def test_mojibake_udf_double_mangle_heals(spark):
    from distributed_crawl_spark.functions.text import (
        _SLOPPY_DECODE,
        fix_mojibake_udf,
    )
    from pyspark.sql import functions as F

    def mangle(s: str) -> str:
        return "".join(_SLOPPY_DECODE[b] for b in s.encode("utf-8"))

    clean = "naïve café — ях 汉字 ok"
    rows = [
        (1, mangle(clean)),            # single mangle
        (2, mangle(mangle(clean))),    # double mangle
        (3, clean),                    # already clean
        (4, "plain ascii"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["fixed"]
        for r in df.select(
            "id", fix_mojibake_udf(F.col("text")).alias("fixed")
        ).collect()
    }
    assert got[1] == clean and got[2] == clean and got[3] == clean
    assert got[4] == "plain ascii" and got[5] is None


def test_mojibake_roundtrip_property():
    """For any string that is itself clean (not repair-eligible),
    corrupt → repair is the identity — the contract-query invariant."""
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    from distributed_crawl_spark.functions.text import (
        _SLOPPY_DECODE,
        _mojibake_fix_once,
    )

    def fix(s: str) -> str:
        for _ in range(3):
            t = _mojibake_fix_once(s)
            if t is None:
                return s
            s = t
        return s

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=40))
    def check(s):
        assume(_mojibake_fix_once(s) is None)  # s itself is clean
        mangled = "".join(_SLOPPY_DECODE[b] for b in s.encode("utf-8"))
        assert fix(mangled) == s

    check()


def test_quality_classifier_paths_agree(spark):
    """The zero-shuffle stub path and the trained-weights-table path
    (explode + broadcast join) produce identical scores when the table
    materializes the stub formula — the plumbing proof that a real
    fastText/logreg export slots in without touching callers."""
    from pyspark.sql import functions as F

    from distributed_crawl_spark.functions import textstats as TS

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta"), (3, "zeta")],
        "doc_id long, text string",
    )
    weights = spark.range(TS.CLASSIFIER_DIM).select(
        F.col("id").alias("bucket"),
        TS.stub_classifier_weight(F.col("id")).cast("int").alias("w_milli"),
    )
    stub = {r.doc_id: r for r in TS.quality_classifier(docs).collect()}
    real = {
        r.doc_id: r
        for r in TS.quality_classifier(docs, weights=weights).collect()
    }
    assert set(stub) == set(real) == {1, 2, 3}
    for d in stub:
        assert (stub[d].n_tokens, stub[d].score_int, stub[d].keep) == (
            real[d].n_tokens, real[d].score_int, real[d].keep
        )
    # threshold moves the gate: +1001 milli mean is unreachable (weights
    # cap at 1000), -1001 keeps everything
    none_kept = TS.quality_classifier(docs, threshold_milli=1001)
    all_kept = TS.quality_classifier(docs, threshold_milli=-1001)
    assert not [r for r in none_kept.collect() if r.keep]
    assert all(r.keep for r in all_kept.collect())
    # an unseen bucket scores 0 in the table path (sparse real models)
    sparse = TS.quality_classifier(
        docs, weights=weights.filter(F.lit(False))
    ).collect()
    assert all(r.score_int == 0 and r.keep for r in sparse)


def test_ccnet_buckets_exact_tertiles(spark):
    """Planted three-level frequency corpus: token counts 9/6/3 give
    three distinct per-doc scores, 3 docs each -> exact head/middle/tail
    thirds; a single-doc language collapses to tail (q1 == q2 == score)."""
    rows = (
        [(i, "x x x", "a") for i in range(3)]
        + [(i, "y y", "a") for i in range(3, 6)]
        + [(i, "z", "a") for i in range(6, 9)]
        + [(9, "solo doc", "b")]
    )
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = {r.doc_id: r for r in TS.ccnet_buckets(docs, lang_col="lang").collect()}
    assert [out[i].bucket for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    a = out[0]
    assert a.q1 < a.q2 < a.logprob_q          # head sits above both cuts
    assert out[6].logprob_q <= out[6].q1      # tail at/below the first cut
    solo = out[9]
    assert solo.bucket == "tail" and solo.q1 == solo.q2 == solo.logprob_q


def test_train_quality_classifier_separates(spark):
    """End-to-end model gate: train on planted good/bad vocabularies,
    then quality_classifier(weights=trained) separates HELD-OUT docs of
    the same distributions (and mixed docs land by majority content)."""
    good_words = ["insight", "method", "evidence", "theory", "result"]
    bad_words = ["spamword", "clickbait", "garbage", "noise", "junk"]

    def doc(i, words, k=12):
        return " ".join(words[(i + j) % len(words)] for j in range(k))

    pos = spark.createDataFrame(
        [(i, doc(i, good_words)) for i in range(40)],
        "doc_id LONG, text STRING")
    neg = spark.createDataFrame(
        [(100 + i, doc(i, bad_words)) for i in range(40)],
        "doc_id LONG, text STRING")
    w = TS.train_quality_classifier(pos, neg, iters=6)
    assert w.count() > 0

    held = spark.createDataFrame(
        [(0, doc(7, good_words)), (1, doc(7, bad_words)),
         (2, doc(3, good_words, 9) + " " + doc(3, bad_words, 3))],
        "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in TS.quality_classifier(
        held, weights=w, threshold_milli=0).collect()}
    assert out[0].keep and out[0].score_int > 0
    assert not out[1].keep and out[1].score_int < 0
    assert out[2].keep                      # 3:1 good-dominant mix


def test_image_dhash_locality_and_dedup(spark):
    """dHash over the fake luminance stream: matches a direct Python
    computation, identical payloads collapse in a groupBy dedup, and a
    single-byte edit flips at most 2 of the 64 comparison bits (the
    near-dup locality that makes hamming-ball image dedup work)."""
    from distributed_crawl_spark.operators.multimodal import image_dhash

    base = bytes(range(100, 200))          # 100 bytes, n > 65
    variant = bytearray(base)
    variant[10] = 0                        # touches comparisons j=9,10
    rows = [(0, base), (1, base), (2, bytes(variant)), (3, b"")]
    media = spark.createDataFrame(
        [(i, "image", p, "image/fake") for i, p in rows],
        "media_id LONG, kind STRING, payload BINARY, mime STRING",
    )
    out = {r.media_id: r for r in image_dhash(media).collect()}

    def py_dhash(b):
        hi = lo = 0
        for j in range(64):
            if b and b[j % len(b)] > b[(j + 1) % len(b)]:
                if j < 32:
                    lo |= 1 << j
                else:
                    hi |= 1 << (j - 32)
        return hi, lo

    for i, p in rows:
        assert (out[i].dhash_hi, out[i].dhash_lo) == py_dhash(p)
    assert (out[0].dhash_hi, out[0].dhash_lo) == (out[1].dhash_hi,
                                                  out[1].dhash_lo)
    flipped = bin((out[0].dhash_hi ^ out[2].dhash_hi) << 32
                  | (out[0].dhash_lo ^ out[2].dhash_lo)).count("1")
    assert 1 <= flipped <= 2
    assert (out[3].dhash_hi, out[3].dhash_lo) == (0, 0)


def test_bigram_logprob_word_order_sensitivity(spark):
    """A corpus dominated by fluent 'the cat sat on the mat .' docs:
    the doc with the SAME tokens in shuffled order has identical
    unigram stats (unigram_logprob cannot separate them) but its
    bigrams are rare — with the bigram vocab capped to the fluent
    head it hits the unseen-bigram backoff and must score lower."""
    fluent = "the cat sat on the mat ."
    toks = fluent.split()
    shuffled = " ".join(toks[::2] + toks[1::2])
    rows = [(i, fluent) for i in range(10)] + [(10, shuffled)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    n_fluent_bigrams = len(set(zip(toks, toks[1:])))
    got = {r.doc_id: r
           for r in TS.bigram_logprob(docs,
                                      bigram_k=n_fluent_bigrams).collect()}
    assert got[0].logprob_q > got[10].logprob_q
    assert got[10].n_oov > got[0].n_oov


def test_bigram_logprob_matches_python_reference(spark):
    import math

    rows = [
        (0, "a b a b a b"),
        (1, "a a a b b b"),
        (2, "c"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.n_oov, r.logprob_q)
           for r in TS.bigram_logprob(docs).collect()}

    toks = {d: t.split() for d, t in rows}
    uni: dict[str, int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
    total = sum(uni.values())
    bi: dict[tuple, int] = {}
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    want = {}
    for d, t in toks.items():
        qs = []
        oov = 0
        for a, b in zip(t, t[1:]):
            c12 = bi.get((a, b), 0)
            oov += c12 == 0
            c1, c2 = uni.get(a, 1), uni.get(b, 1)
            qs.append(math.floor(
                math.log((float(c12) * total + c2) / ((c1 + 1.0) * total))
                * 1_000_000))
        want[d] = ((len(qs), oov, math.floor(sum(qs) / len(qs)))
                   if qs else (0, 0, 0))
    assert got == want


def test_tokenizer_stats_matches_python_mirror(spark):
    """Per-language byte/token census vs a pure-Python mirror,
    including multi-byte UTF-8 (bytes != chars), digits+symbols
    splitting into separate BPE pre-tokens, and an empty doc."""
    import re

    texts = [
        (0, "en", "the cat sat"),
        (1, "en", "price: 42 dollars!!"),
        (2, "fr", "héllo déjà vu…"),          # multibyte
        (3, "fr", ""),                        # zero tokens, zero bytes
        (4, "de", "a" * 7),
    ]
    docs = spark.createDataFrame(texts, "doc_id LONG, lang STRING, text STRING")
    got = {r.lang: r for r in TS.tokenizer_stats(docs).collect()}

    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    agg = {}
    for _, lang, text in texts:
        b, w, p = (
            len(text.encode("utf-8")),
            len(text.split()),
            len(pat.findall(text)),
        )
        d = agg.setdefault(lang, [0, 0, 0, 0])
        d[0] += 1
        d[1] += b
        d[2] += w
        d[3] += p
    assert set(got) == set(agg)
    for lang, (nd, nb, w, p) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.n_bytes, r.ws_tokens, r.bpe_tokens) == (nd, nb, w, p)
        assert r.bytes_per_bpe_x100 == (100 * nb) // max(p, 1)
        assert r.fertility_x1e4 == (10000 * p) // max(w, 1)
    # the multibyte row really contributes more bytes than chars
    assert agg["fr"][1] > sum(len(t) for _, l, t in texts if l == "fr")


def _ref_language_mix(rows):
    """Brute-force twin of host_language_mix's quantized outputs."""
    import math

    census = {}
    for host, lang in rows:
        census.setdefault(host, {}).setdefault(lang, 0)
        census[host][lang] += 1
    out = {}
    for host, langs in census.items():
        n_docs = sum(langs.values())
        top_n = max(langs.values())
        top_lang = min(l for l, n in langs.items() if n == top_n)
        ent = sum(
            n * math.floor(math.log(n_docs / n) * 1_000_000)
            for n in langs.values()
        ) // n_docs
        out[host] = (n_docs, len(langs), top_lang,
                     10000 * top_n // n_docs, ent)
    return out


def test_host_language_mix_matches_bruteforce(spark):
    import hashlib

    rows = []
    for i in range(500):
        h = hashlib.md5(f"m{i}".encode()).hexdigest()
        rows.append((f"s{int(h[:4], 16) % 7}",
                     ["en", "de", "fr", "es", "und"][int(h[4:8], 16) % 5]))
    df = spark.createDataFrame(rows, "source STRING, lang STRING")
    got = {r.host: (r.n_docs, r.n_langs, r.top_lang, r.top_share_bp,
                    r.lang_entropy_micro)
           for r in TS.host_language_mix(df).collect()}
    assert got == _ref_language_mix(rows)


def test_host_language_mix_shapes(spark):
    rows = (
        [("mono", "en")] * 8
        + [("mixed", l) for l in ("en", "de", "fr", "es")] * 2
        + [("tied", "de"), ("tied", "en")]
    )
    df = spark.createDataFrame(rows, "source STRING, lang STRING")
    got = {r.host: r for r in TS.host_language_mix(df).collect()}
    assert got["mono"].lang_entropy_micro == 0            # monolingual
    assert got["mono"].top_share_bp == 10000
    # uniform over 4 langs: entropy == floor-quantized ln(4) (within the
    # per-term floor loss), top share 2500 bp
    import math

    assert got["mixed"].top_share_bp == 2500
    assert abs(got["mixed"].lang_entropy_micro
               - int(math.log(4) * 1_000_000)) <= 4
    # majority tie: count DESC then lang ASC -> 'de'
    assert got["tied"].top_lang == "de"
    assert got["tied"].top_share_bp == 5000


def test_video_metadata_and_frame_plan(spark):
    """Video twin of the audio plumbing: fake decode arithmetic,
    blob shed at the metadata boundary, closed-form sampling plan
    with ragged tail, per-video cap, and frame-range clamp."""
    import pytest as _pytest

    from distributed_crawl_spark.operators.multimodal import (
        VIDEO_META_SCHEMA,
        decode_video_real,
        video_frame_plan,
        video_metadata,
    )

    with _pytest.raises(NotImplementedError):
        decode_video_real(b"ftyp")

    media = spark.createDataFrame(
        [(0, "video", b"x" * 100, "video/mp4"),
         (1, "video", b"", "video/mp4")],
        "media_id LONG, kind STRING, payload BINARY, mime STRING",
    )
    meta = video_metadata(media, fake=True)
    assert meta.schema == VIDEO_META_SCHEMA
    rows = {r.media_id: r for r in meta.collect()}
    # n=100: width = 16*(20+100%101) = 1920, fps = (24,25,30)[100%3] = 25,
    # n_frames = 230, duration = 230*1000//25 = 9200 ms
    assert rows[0].width == 1920 and rows[0].height == 1080
    assert rows[0].fps == 25 and rows[0].n_frames == 230
    assert rows[0].duration_ms == 9200
    # n=0: width 320, fps 24, n_frames 30, duration 1250 ms
    assert rows[1].width == 320 and rows[1].fps == 24
    assert rows[1].n_frames == 30 and rows[1].duration_ms == 1250

    plan = video_frame_plan(meta, every_ms=1000)
    by = {}
    for r in plan.collect():
        by.setdefault(r.media_id, []).append(r)
    got0 = sorted((r.sample_index, r.ts_ms, r.frame_index) for r in by[0])
    # 10 samples at 0..9000 ms, frame = ts*25//1000
    assert got0 == [(i, 1000 * i, 25 * i) for i in range(10)]
    got1 = sorted((r.sample_index, r.ts_ms, r.frame_index) for r in by[1])
    # 2 samples; the 1000 ms sample would be frame 24 — inside range;
    # clamp shows at the tail: a 1250 ms video sampled at 1200 ms with
    # fps 24 gives frame 28 ≤ 29
    assert got1 == [(0, 0, 0), (1, 1000, 24)]

    capped = video_frame_plan(meta, every_ms=1000, max_samples=4)
    assert sorted(r.sample_index for r in capped.collect()
                  if r.media_id == 0) == [0, 1, 2, 3]

    # frame-range clamp: 100 ms stride on the 1250 ms video reaches
    # ts 1200 → raw frame 28; a 40 ms-duration fiction would clamp —
    # force it via a video where ts*fps/1000 exceeds n_frames-1
    tiny = video_frame_plan(
        meta.filter("media_id = 1").withColumn(
            "n_frames", F.lit(2).cast("long")),
        every_ms=1000,
    )
    assert max(r.frame_index for r in tiny.collect()) == 1  # clamped to 1


def test_cc_luhn_stats_known_numbers(spark):
    """Luhn precision split on known card test numbers: VISA/Amex test
    numbers validate, an off-by-checksum run doesn't, short runs and
    20-digit runs never become candidates (fixed-shape boundary)."""
    from distributed_crawl_spark.functions.textstats import cc_luhn_stats

    cases = [
        (0, "pay 4111 1111 1111 1111 now", 1, 1),        # grouped VISA
        (1, "num 1234 5678 9012 3456", 1, 0),            # grouped invalid
        (2, "id 4111111111111111 end", 1, 1),            # contiguous VISA
        (3, "amex 378282246310005 ok", 1, 1),            # 15-digit Amex
        (4, "luhn 79927398713", 0, 0),                   # 11 digits: short
        (5, "serial 12345678901234567890", 0, 0),        # 20 digits: no \b fit
        (6, "no numbers at all", 0, 0),
        (7, "two: 4111111111111111 and 5500 0000 0000 0004", 2, 2),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in cases], "doc_id LONG, text STRING"
    )
    nc, nv = cc_luhn_stats(F.col("text"))
    got = {
        r.doc_id: (r.nc, r.nv)
        for r in df.select(
            "doc_id", nc.alias("nc"), nv.alias("nv")
        ).collect()
    }
    for i, _, want_c, want_v in cases:
        assert got[i] == (want_c, want_v), (i, got[i])


def test_cc_luhn_matches_python_reference(spark):
    """HOF checksum == the textbook Luhn on synthetic digit runs."""
    def py_luhn(d):
        s = 0
        for i, ch in enumerate(reversed(d)):
            v = int(ch)
            s += v if i % 2 == 0 else (v * 2 - 9 if v * 2 > 9 else v * 2)
        return s % 10 == 0

    import hashlib
    runs = [
        str(int(hashlib.md5(f"cc{i}".encode()).hexdigest()[:12], 16))[:16]
        for i in range(30)
    ]
    from distributed_crawl_spark.functions.textstats import cc_luhn_stats

    df = spark.createDataFrame(
        [(i, f"x {r} y") for i, r in enumerate(runs)],
        "doc_id LONG, text STRING",
    )
    nc, nv = cc_luhn_stats(F.col("text"))
    got = {
        r.doc_id: (r.nc, r.nv)
        for r in df.select("doc_id", nc.alias("nc"), nv.alias("nv")).collect()
    }
    for i, r in enumerate(runs):
        want = (1, 1 if py_luhn(r) else 0) if len(r) >= 13 else (0, 0)
        assert got[i] == want, (i, r, got[i], want)


def test_collocations_matches_python(spark):
    """PMI collocations vs a pure-Python mirror: a planted lexicalized
    pair ('san francisco') must out-rank a frequent-but-independent
    pair; min_count guards the sparse-PMI explosion."""
    import math

    from distributed_crawl_spark.functions.textstats import collocations

    rows = []
    for i in range(30):
        rows.append((i, "san francisco is a city by the bay"))
    for i in range(30, 60):
        rows.append((i, "the city and the bay and the fog"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def mirror(texts, k, min_count, scale=1_000_000):
        uni, big = {}, {}
        for t in texts:
            ts = t.split()
            for w in ts:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ts, ts[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        total = sum(uni.values())
        out = []
        for (a, b), c12 in big.items():
            if c12 < min_count:
                continue
            pmi = math.floor(
                math.log((float(c12) * total) / (float(uni[a]) * uni[b]))
                * scale
            )
            out.append((a, b, c12, uni[a], uni[b], pmi))
        out.sort(key=lambda r: (-r[5], r[0], r[1]))
        return [r + (i + 1,) for i, r in enumerate(out[:k])]

    got = [
        (r["w1"], r["w2"], r["c12"], r["c1"], r["c2"], r["pmi_q"],
         r["rank"])
        for r in collocations(df, k=10, min_count=5).collect()
    ]
    exp = mirror([t for _, t in rows], 10, 5)
    assert got == exp
    # the lexicalized pair sits in the max-PMI tie group (every pair of
    # corpus A has identical counts, so ties rank alphabetically) and
    # beats cross-corpus high-frequency-word pairs like ('the', 'bay')
    by_pair = {(a, b): pmi for a, b, _, _, _, pmi, _ in got}
    assert ("san", "francisco") in by_pair
    top_pmi = got[0][5]
    assert by_pair[("san", "francisco")] == top_pmi
    if ("the", "bay") in by_pair:
        assert by_pair[("the", "bay")] < top_pmi
