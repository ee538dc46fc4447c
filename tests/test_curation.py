"""Tests for the corpus-curation operators (operators/curation.py): PII
redaction, repetition signals + Gopher-style filtering, within-doc token
dedup, deterministic hash/stratified sampling. The end-to-end oracle
certification lives in test_entry_contract (pii_redaction,
repetition_filter, dedup_within_doc, corpus_sample_mix); these pin the
operator-level semantics and edge cases directly."""

import pytest
from pyspark.sql import functions as F

from fluent_plugin_geoip_spark.operators import curation


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat the cat", "en"),
         (2, "solo", "de"),
         (3, "", "en"),
         (4, "spam spam spam spam spam ham spam spam", "fr")],
        "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [("mail bob.smith+x@ex-a.co.uk ip 192.168.0.1 tel +1 (555) 123-4567 ok",),
         ("no pii here at all",),
         ("octets out of range 999.1.2.3 stay",)], "t string")
    got = [r.r for r in df.select(
        curation.redact_pii(F.col("t")).alias("r")).collect()]
    assert got[0] == "mail <EMAIL> ip <IP> tel <PHONE> ok"
    assert got[1] == "no pii here at all"
    # 999 is not a valid octet: the anchored alternation must not match
    assert got[2] == "octets out of range 999.1.2.3 stay"


def test_redact_pii_order_prevents_double_chew(spark):
    # the email's digits and the IP's digits must be consumed by their own
    # pass, never left for the phone pattern to mangle
    df = spark.createDataFrame([("u12345678901@x.io then 10.20.30.40",)],
                               "t string")
    got = df.select(curation.redact_pii(F.col("t")).alias("r")).head().r
    assert got == "<EMAIL> then <IP>"


def test_redact_pii_kind_selection(spark):
    df = spark.createDataFrame([("a@b.co and 1.2.3.4",)], "t string")
    got = df.select(
        curation.redact_pii(F.col("t"), kinds=("email",)).alias("r")).head().r
    assert got == "<EMAIL> and 1.2.3.4"


# ---------------------------------------------------------------------------
# repetition signals / filter
# ---------------------------------------------------------------------------

def test_repetition_features_values(spark, toy):
    rows = {r.doc_id: r for r in toy.select(
        "doc_id", curation.repetition_features(F.col("text")).alias("f"))
        .select("doc_id", "f.*").collect()}
    r1 = rows[1]  # 8 words, 5 distinct, top 'the'×3, bigrams 7 distinct 6
    assert r1.n_words == 8
    assert r1.dup_word_frac == pytest.approx(1 - 5 / 8)
    assert r1.top_word_frac == pytest.approx(3 / 8)
    assert r1.dup_bigram_frac == pytest.approx(1 - 6 / 7)
    # degenerate docs read as ZERO repetition, not one
    assert rows[2].dup_bigram_frac == 0.0 and rows[2].top_word_frac == 1.0
    assert rows[3].n_words == 0 and rows[3].dup_word_frac == 0.0
    assert rows[4].top_word_frac == pytest.approx(7 / 8)


def test_drop_repetitive_min_words_bypass(spark, toy):
    kept = sorted(r.doc_id for r in curation.drop_repetitive(
        toy, max_dup_word_frac=0.5, max_top_word_frac=0.5).collect())
    # 1 fails top_word 0.375<=0.5 but dup 0.375<=0.5 → kept; 4 fails both;
    # 2 (1 word) and 3 (empty) bypass via min_words
    assert kept == [1, 2, 3]
    # with the bypass disabled, the 1-word doc trips top_word_frac = 1.0
    strict = sorted(r.doc_id for r in curation.drop_repetitive(
        toy, max_dup_word_frac=0.5, max_top_word_frac=0.5,
        min_words=0).collect())
    assert strict == [1, 3]


def test_dedup_words_keeps_first_occurrence_order(spark, toy):
    got = {r.doc_id: r.d for r in toy.select(
        "doc_id", curation.dedup_words(F.col("text")).alias("d")).collect()}
    assert got[1] == "the cat sat on mat"
    assert got[4] == "spam ham"
    assert got[3] == ""


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

def test_hash_sample_stable_across_partitioning(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in curation.hash_sample(df, 0.3, "k").collect())
    b = sorted(r.k for r in curation.hash_sample(
        df.repartition(17), 0.3, "k").collect())
    assert a == b and 0 < len(a) < 2000
    # rate is honored within a loose tolerance on 2000 uniform keys
    assert abs(len(a) / 2000 - 0.3) < 0.05


def test_hash_sample_fractions_nest(spark):
    # the kept set at a lower rate is a subset of the kept set at a higher
    # rate — the property that makes corpus down-scaling reproducible
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    lo = {r.k for r in curation.hash_sample(df, 0.1, "k").collect()}
    hi = {r.k for r in curation.hash_sample(df, 0.4, "k").collect()}
    assert lo <= hi


# ---------------------------------------------------------------------------
# cross-document paragraph dedup
# ---------------------------------------------------------------------------

def test_dedup_paragraphs_global_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "unique one\nshared footer\nalso unique"),
         (2, "shared footer\nunique two"),
         (3, "unique three\nshared footer\nunique two")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           curation.dedup_paragraphs(df).collect()}
    # doc 1 is the first carrier of 'shared footer' → keeps everything
    assert got[1].text_dedup == "unique one\nshared footer\nalso unique"
    assert (got[1].n_paras, got[1].n_kept) == (3, 3)
    # doc 2 loses the footer but keeps its own paragraph
    assert got[2].text_dedup == "unique two"
    assert (got[2].n_paras, got[2].n_kept) == (2, 1)
    # doc 3 loses the footer AND 'unique two' (doc 2 carried it first)
    assert got[3].text_dedup == "unique three"
    assert (got[3].n_paras, got[3].n_kept) == (3, 1)


def test_dedup_paragraphs_within_doc_repeat(spark):
    # a paragraph repeated inside ONE document also dedups to its first
    # position — global-first means first (doc, pos), not first doc
    df = spark.createDataFrame([(7, "a b\nmid\na b")],
                               "doc_id long, text string")
    r = curation.dedup_paragraphs(df).head()
    assert r.text_dedup == "a b\nmid" and r.n_paras == 3 and r.n_kept == 2


def test_dedup_paragraphs_short_paragraphs_bypass(spark):
    # empty paragraphs (trailing sep / blank lines) are structure: every
    # document keeps its own, they never dedup against each other
    df = spark.createDataFrame(
        [(1, "x\n\ny"), (2, "z\n\ny")], "doc_id long, text string")
    got = {r.doc_id: r for r in curation.dedup_paragraphs(df).collect()}
    assert got[1].text_dedup == "x\n\ny"
    assert got[2].text_dedup == "z\n"          # 'y' deduped, '' kept
    assert (got[2].n_paras, got[2].n_kept) == (3, 2)
    # raising min_chars widens the bypass: 1-char paragraphs now survive
    wide = {r.doc_id: r for r in
            curation.dedup_paragraphs(df, min_chars=2).collect()}
    assert wide[2].text_dedup == "z\n\ny"


def test_dedup_paragraphs_all_duplicate_doc_survives_empty(spark):
    # a document whose every paragraph was seen earlier still appears in
    # the output (empty text), so row counts are preserved for joins
    df = spark.createDataFrame([(1, "dup para"), (2, "dup para")],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in curation.dedup_paragraphs(df).collect()}
    assert got[1].text_dedup == "dup para"
    assert got[2].text_dedup == "" and got[2].n_kept == 0


# ---------------------------------------------------------------------------
# corpus n-gram counts
# ---------------------------------------------------------------------------

def test_ngram_counts_bigrams(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("cat",), ("",)], "text string")
    got = {r.ngram: r.cnt for r in
           curation.ngram_counts(df, n=2, min_count=1).collect()}
    assert got == {"the cat": 2, "cat sat": 1, "cat ran": 1}
    # min_count prunes the tail; short/empty docs contribute nothing
    top = {r.ngram: r.cnt for r in
           curation.ngram_counts(df, n=2, min_count=2).collect()}
    assert top == {"the cat": 2}


def test_ngram_counts_trigrams_window_slide(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = {r.ngram for r in
           curation.ngram_counts(df, n=3, min_count=1).collect()}
    assert got == {"a b c", "b c d"}


def test_stratified_sample_rates_and_default(spark):
    rows = [(i, ["en", "de", "xx"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    got = curation.stratified_sample(
        df, {"en": 1.0, "de": 0.0}, "lang", "k", default_fraction=0.5)
    by_lang = {r.lang: r.n for r in
               got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == 1000
    assert "de" not in by_lang
    assert 350 < by_lang.get("xx", 0) < 650
