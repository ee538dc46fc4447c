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


# ---------------------------------------------------------------------------
# incremental paragraph dedup against a persisted store
# ---------------------------------------------------------------------------

def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_paragraph_dedup_plain_store(spark, tmp_path):
    store = str(tmp_path / "parastore")
    corpus = _mkdocs(spark, [(1, "old news\nshared footer"),
                             (2, "other stuff\nshared footer")])
    curation.write_paragraph_store(corpus, store)
    batch = _mkdocs(spark, [(10, "fresh content\nshared footer"),
                            (11, "fresh content\nmore fresh")])
    got = {r.doc_id: r for r in curation.incremental_dedup_paragraphs(
        batch, store).collect()}
    # footer is in the store → dropped; 'fresh content' kept once (doc 10
    # is the batch's first carrier), doc 11 keeps only its unique para
    assert got[10].text_dedup == "fresh content"
    assert got[11].text_dedup == "more fresh"
    assert (got[10].n_paras, got[10].n_kept) == (2, 1)


def test_incremental_paragraph_store_update_and_replay(spark, tmp_path):
    store = str(tmp_path / "parastore")
    curation.write_paragraph_store(
        _mkdocs(spark, [(1, "seen before")]), store, batch_id=0)
    batch = _mkdocs(spark, [(10, "novel para\nseen before")])
    out1 = curation.incremental_dedup_paragraphs(
        batch, store, update_store=True, store_batch_id=1).collect()
    assert out1[0].text_dedup == "novel para"
    # the update appended 'novel para' under batch_id=1: a SECOND batch
    # carrying it now dedups against the store
    batch2 = _mkdocs(spark, [(20, "novel para\nreally new")])
    out2 = curation.incremental_dedup_paragraphs(batch2, store).collect()
    assert out2[0].text_dedup == "really new"
    # REPLAY of batch 1 (crash-retry): its own store partition is excluded
    # from the probe and dynamically overwritten — same result, no
    # self-dedup, no duplicate store rows
    replay = curation.incremental_dedup_paragraphs(
        batch, store, update_store=True, store_batch_id=1).collect()
    assert replay[0].text_dedup == "novel para"
    rows = spark.read.parquet(store).filter("para = 'novel para'").count()
    assert rows == 1


def test_incremental_paragraph_dedup_bucketed_no_store_exchange(
        spark, tmp_path):
    """The phash-bucketed paragraph store must feed its probe join with NO
    store-side exchange (only the new batch shuffles) — the same pinned
    plan shape as the bucketed signature store in test_plans.py."""
    from pyspark.sql import functions as F

    store = str(tmp_path / "parastore_b")
    corpus = _mkdocs(spark, [(i, f"common footer\nbody {i}")
                             for i in range(20)])
    table = curation.write_paragraph_store(corpus, store, bucket_by=4,
                                           table="t_para_store_pin")
    try:
        batch = _mkdocs(spark, [(100, "common footer\nbrand new body")])
        out = curation.incremental_dedup_paragraphs(
            batch, store, store_table=table)
        assert out.head().text_dedup == "brand new body"

        # isolate the probe join itself (the full operator plan also has
        # the reassembly aggregates) and pin the non-broadcast form
        probe = (spark.createDataFrame([("common footer",)], "para string")
                 .withColumn("phash", F.xxhash64("para"))
                 .join(spark.table(table).select(
                     "phash", F.col("para").alias("__sp")), "phash"))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = probe._jdf.queryExecution().explainString(
                probe.sparkSession._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("simple"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange") == 1, plan        # batch side only
        assert "Exchange" not in plan[plan.index("FileScan"):], plan

        # refusal: update_store with a bucketed table
        with pytest.raises(ValueError, match="bucket"):
            curation.incremental_dedup_paragraphs(
                batch, store, store_table=table, update_store=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def test_contamination_flags_counts_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),     # contains bench bigram twice? no: once
         (2, "beta gamma beta gamma x"),    # 'beta gamma' occurs twice
         (3, "nothing shared here")],
        "doc_id long, text string")
    bench = spark.createDataFrame([("beta gamma epsilon",)], "text string")
    got = {r.doc_id: r.matched_grams for r in
           curation.contamination_flags(docs, bench, n=2).collect()}
    # bench bigrams: {'beta gamma', 'gamma epsilon'}
    assert got == {1: 1, 2: 2}


def test_drop_contaminated_keeps_clean_docs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "beta gamma beta gamma x"),
         (3, "nothing shared here")],
        "doc_id long, text string")
    bench = spark.createDataFrame([("beta gamma epsilon",)], "text string")
    kept = sorted(r.doc_id for r in
                  curation.drop_contaminated(docs, bench, n=2).collect())
    assert kept == [3]
    # a longer window is stricter about what counts as leakage: no doc
    # shares a 4-gram with the benchmark, so all survive
    all_kept = sorted(r.doc_id for r in
                      curation.drop_contaminated(docs, bench, n=4).collect())
    assert all_kept == [1, 2, 3]


def test_contamination_benchmark_is_broadcast_no_corpus_shuffle(spark):
    # the corpus side must probe a broadcast hash table, never shuffle
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(50)],
        "doc_id long, text string")
    bench = spark.createDataFrame([("w3 w4",)], "text string")
    flagged = curation.contamination_flags(docs, bench, n=2)
    plan = flagged._jdf.queryExecution().explainString(
        flagged.sparkSession._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, tree
    # the streamed (corpus) side of the join — the tree lines between the
    # join node and its BroadcastExchange build side — must be shuffle-free;
    # the only shuffles are the benchmark's own tiny distinct and the
    # per-doc count AFTER the probe has shrunk the data
    corpus_branch = tree[tree.index("BroadcastHashJoin"):
                         tree.index("BroadcastExchange")]
    assert "Exchange" not in corpus_branch, tree
    shuffles = tree.count("Exchange") - tree.count("BroadcastExchange")
    assert shuffles == 2, tree


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
    # under ANSI mode a missing map key must fall through to the default,
    # not raise MAP_KEY_DOES_NOT_EXIST (round-8 ADVICE: try_element_at)
    from fluent_plugin_geoip_spark.confutil import scoped_conf
    with scoped_conf(spark, "spark.sql.ansi.enabled", "true"):
        got_ansi = {r.lang: r.n for r in
                    curation.stratified_sample(
                        df, {"en": 1.0, "de": 0.0}, "lang", "k",
                        default_fraction=0.5)
                    .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got_ansi == by_lang
