"""Physical-plan shape tests — the scale properties the engine promises:

- column pruning reaches the parquet scan (a rollup must not read html)
- predicate pushdown reaches the scan (PushedFilters)
- the enrich stage crosses into Python exactly ONCE per lookup key set
  (ArrowEvalPython), with no shuffle (narrow map)
- the routed fan-out introduces exactly one Exchange (the salted repartition)
- aggregates run as partial+final hash aggregation (map-side combine)

These are the .explain() checks SURVEY.md §4.2 commits to; they pin the plan
so a regression (e.g. a UDF blocking pruning) fails loudly.
"""

import pytest
from pyspark.sql import functions as F

from fluent_plugin_geoip_spark.plans.pipeline import GeoipPipeline
from fluent_plugin_geoip_spark.sources.pages import generate_pages


def explain(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jmode.fromString(mode))


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plans") / "pages.parquet")
    generate_pages(spark, 1000, partitions=2).write.parquet(d)
    return d


def test_rollup_prunes_html(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    counts = (GeoipPipeline(spark).enrich(pages)
              .groupBy("route_country", "lang").agg(F.count("*").alias("n")))
    plan = explain(counts)
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "html" not in scan, scan
    assert "warc_ts" not in scan, scan
    assert "text" in scan and "lang" in scan


def test_filter_pushdown_to_scan(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet).filter(F.col("lang") == "en")
    plan = explain(pages)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan


def _shuffles(tree: str) -> int:
    """Shuffle Exchange nodes only (BroadcastExchange is not a shuffle)."""
    return tree.count("Exchange") - tree.count("BroadcastExchange")


def test_enrich_single_arrow_crossing_no_shuffle(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    enriched = GeoipPipeline(spark, enrich_strategy="arrow").enrich(pages)
    plan = explain(enriched)
    tree = plan.split("\n\n")[0]  # formatted mode repeats nodes in details
    assert tree.count("ArrowEvalPython") == 1, tree
    assert "Exchange" not in plan, plan
    assert "codegen id" in plan  # projections run inside WholeStageCodegen


def test_default_enrich_is_jvm_join_no_python(spark, pages_parquet):
    """The pipeline default (enrich_strategy='auto' → 'jvm_join' on every
    DB since round 8) must run the whole enrich stage with NO Python
    worker and NO shuffle — only a broadcast build per lookup DB."""
    pages = spark.read.parquet(pages_parquet)
    enriched = GeoipPipeline(spark).enrich(pages)
    plan = explain(enriched)
    tree = plan.split("\n\n")[0]
    assert "ArrowEvalPython" not in tree, tree
    assert "BatchEvalPython" not in tree, tree
    assert tree.count("BroadcastHashJoin") == 1, tree
    assert _shuffles(tree) == 0, tree


def test_multi_key_still_single_crossing(spark):
    """Two lookup keys → two UDF invocations, but Spark batches adjacent
    Python UDFs into a single ArrowEvalPython node (one crossing/batch)."""
    from fluent_plugin_geoip_spark.config import GeoipConfig
    from fluent_plugin_geoip_spark.operators.enrich import GeoipEnricher
    from fluent_plugin_geoip_spark.sources.fixtures import geoip2_city_db
    df = spark.createDataFrame([("8.8.8.8", "125.54.15.42")], "a string, b string")
    cfg = GeoipConfig(lookup_keys=["a", "b"],
                      records={"ca": "${country.iso_code['a']}",
                               "cb": "${country.iso_code['b']}"})
    out = GeoipEnricher(spark, cfg, geoip2_city_db()).transform(df)
    plan = explain(out)
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 1, tree


def test_route_plan_has_single_salted_exchange(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    enriched = GeoipPipeline(spark).enrich(pages)
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(16))
    routed = enriched.repartition(8, F.col("route_country"), salt)
    plan = explain(routed)
    tree = plan.split("\n\n")[0]
    assert _shuffles(tree) == 1, tree
    assert "hashpartitioning(route_country" in plan, plan


def test_route_rebalance_plan_is_single_aqe_exchange(spark, pages_parquet):
    """Round-6 default fan-out: ONE exchange, keyed on the route column,
    flagged REBALANCE so AQE sizes/splits/merges the write partitions
    (files per sink track data volume instead of salt_buckets)."""
    pages = spark.read.parquet(pages_parquet)
    enriched = GeoipPipeline(spark).enrich(pages)
    routed = enriched.hint("rebalance", "route_country")
    plan = explain(routed)
    tree = plan.split("\n\n")[0]
    assert _shuffles(tree) == 1, tree
    assert "REBALANCE_PARTITIONS_BY_COL" in plan, plan
    assert "hashpartitioning(route_country" in plan, plan


def test_aggregate_partial_final(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    counts = pages.groupBy("lang").agg(F.count("*").alias("n"))
    plan = explain(counts)
    tree = plan.split("\n\n")[0]
    # partial + final hash aggregate (map-side combine before the shuffle)
    assert tree.count("HashAggregate") == 2, tree


def test_lookup_udf_input_is_long(spark, pages_parquet):
    """The Arrow crossing must carry the JVM-parsed long, not the ip string."""
    pages = spark.read.parquet(pages_parquet)
    enriched = GeoipPipeline(spark, enrich_strategy="arrow").enrich(pages)
    plan = explain(enriched, "extended")
    assert "geo_lookup" in plan
    # the UDF argument expression contains the shiftleft of the octet parse
    assert "shiftleft" in plan, plan


def test_asn_enrich_fuses_into_one_crossing(spark, pages_parquet):
    """city + ASN lookups both depend only on the parsed ip long →
    ExtractPythonUDFs must batch them into one ArrowEvalPython."""
    pages = spark.read.parquet(pages_parquet)
    enriched = GeoipPipeline(spark, enable_asn=True,
                             enrich_strategy="arrow").enrich(pages)
    plan = explain(enriched)
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 1, tree
    assert "Exchange" not in plan


def test_asn_enrich_jvm_join_two_broadcasts_no_python(spark, pages_parquet):
    """Default (auto → jvm_join) city + ASN: two broadcast joins, still
    zero Python workers and zero shuffles."""
    pages = spark.read.parquet(pages_parquet)
    enriched = GeoipPipeline(spark, enable_asn=True).enrich(pages)
    plan = explain(enriched)
    tree = plan.split("\n\n")[0]
    assert "ArrowEvalPython" not in tree, tree
    assert tree.count("BroadcastHashJoin") == 2, tree
    assert _shuffles(tree) == 0, tree


def test_near_dupes_bucket_shuffle_is_narrow(spark):
    """The LSH bucket exchange must move (id, t, bucket) rows only — never
    embedding vectors (round-4 plan shape): exactly TWO Python crossings
    (all-tables signature + candidate cosine), and the pre-aggregate
    exchange's hashpartitioning is on (t, bucket)."""
    import numpy as np

    from fluent_plugin_geoip_spark.operators.similarity import (
        embedding_near_dupes,
    )
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(16)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_dupes(df, threshold=0.9, dim=16)
    plan = explain(out)
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 2, tree
    # the signature crossing feeds a posexplode then the bucket exchange;
    # the vector column must not appear in any Exchange's partitioning or
    # in the aggregate keys
    assert "hashpartitioning(t" in plan or "hashpartitioning(bucket" in plan, plan


def test_quality_scores_is_native_and_pruned(spark, tmp_path_factory):
    """quality_scores: no Python in the plan, and the parquet scan reads
    only (doc_id, text)."""
    d = str(tmp_path_factory.mktemp("qs") / "documents.parquet")
    spark.createDataFrame(
        [(1, "some text here", "en", 3)],
        "doc_id long, text string, lang string, extra long"
    ).write.parquet(d)
    # build directly on the written table (q_quality_scores expects an
    # sf_dir layout; replicate its projection here)
    from fluent_plugin_geoip_spark.operators.textstats import (
        bpe_ish_token_count, quality_score_raw,
    )
    df = spark.read.parquet(d)
    t = F.col("text")
    out = df.select(
        "doc_id",
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(quality_score_raw(t) * 1e6).cast("long").alias("quality_micros"))
    plan = explain(out)
    assert "Python" not in plan and "Arrow" not in plan
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "lang" not in scan and "extra" not in scan, scan


def test_incremental_dedup_never_resignatures_corpus(spark, tmp_path_factory):
    """Round-5 plan shape for the daily incremental dedup: corpus
    signatures come from a parquet SCAN of the store (never recomputed),
    and the only signature kernel (mapInPandas) in the candidate plan runs
    over the new batch. The store probe is a plain equi-join on the narrow
    (band, key) columns."""
    from fluent_plugin_geoip_spark.operators.dedup import (
        incremental_minhash_dedup, write_signature_store,
    )
    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} text " * 3) for i in range(20)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, "corpus document number 3 text " * 3)],
        "doc_id long, text string")
    store = str(tmp_path_factory.mktemp("incr") / "store")
    write_signature_store(corpus, store, bands=16, rows=8)

    # plan-pin the candidate stage (the operator's verify stage materializes
    # eagerly, so rebuild the probe plan exactly as the operator does)
    from fluent_plugin_geoip_spark.operators.dedup import (
        signature_band_entries,
    )
    new_entries = signature_band_entries(new, bands=16, rows=8)
    probe = (new_entries.select("band", "key", F.col("id").alias("id_new"))
             .join(spark.read.parquet(store)
                   .select("band", "key", F.col("id").alias("id_old")),
                   ["band", "key"]))
    plan = explain(probe)
    tree = plan.split("\n\n")[0]
    # exactly one Python stage: the new batch's signature kernel
    assert (tree.count("MapInPandas") + tree.count("ArrowEvalPython")) == 1, tree
    # corpus side is a parquet scan of the store, pruned to (band, key, id)
    assert "Scan parquet" in plan, plan
    scan_schema = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "text" not in scan_schema and "id" in scan_schema, scan_schema
    # end-to-end result still correct through the real operator
    out = incremental_minhash_dedup(new, corpus, store, bands=16, rows=8,
                                    threshold=0.8, exact_grams=True)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(3, 100)}


def test_bucketed_store_probe_has_no_store_side_exchange(spark,
                                                         tmp_path_factory):
    """Round-6 plan shape for the bucketed incremental-dedup store: the
    probe equi-joins on the store's bucket column (`key`) alone, so the
    bucketed scan satisfies the join's required distribution — NO exchange
    on the store side; only the new batch's entries shuffle. At a
    16-trillion-row store this is the difference between a daily probe
    that costs O(new batch) and one that re-shuffles the store every run."""
    from fluent_plugin_geoip_spark.operators.dedup import (
        incremental_minhash_dedup, signature_band_entries,
        write_signature_store,
    )
    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} text " * 3) for i in range(20)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, "corpus document number 3 text " * 3)],
        "doc_id long, text string")
    store = str(tmp_path_factory.mktemp("bincr") / "store")
    table = write_signature_store(corpus, store, bands=16, rows=8,
                                  bucket_by=8, table="t_sig_store_pin")
    assert table == "t_sig_store_pin"

    new_entries = signature_band_entries(new, bands=16, rows=8)
    probe = (new_entries.select("key", F.col("id").alias("id_new"))
             .join(spark.table(table)
                   .select("key", F.col("id").alias("id_old")), ["key"]))
    # pin the non-broadcast (production big-batch) plan: at scale the new
    # batch exceeds any broadcast threshold and the join is sort-merge
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain(probe, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the store scan reads its bucket layout...
    assert "Bucketed: true" in plan, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    # ...and exactly ONE exchange exists: the probe side. Nothing between
    # the store FileScan and the join.
    assert plan.count("Exchange") == 1, plan
    store_side = plan[plan.index("FileScan"):]
    assert "Exchange" not in store_side, plan

    # end-to-end through the real operator stays correct on the bucketed path
    out = incremental_minhash_dedup(new, corpus, store, bands=16, rows=8,
                                    threshold=0.8, exact_grams=True,
                                    store_table=table)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(3, 100)}


def test_jvm_join_enrich_no_python_and_broadcast(spark):
    """strategy='jvm_join' (round 7): the geolocate probe is a broadcast-
    hash prefix-bucket join — the whole enrich stage must run with NO
    Python worker (no ArrowEvalPython/BatchEvalPython), no shuffle
    Exchange, and a BroadcastHashJoin per lookup key. This bounds what
    the Arrow crossing costs at all (round-6 VERDICT item 1)."""
    from fluent_plugin_geoip_spark.config import GeoipConfig
    from fluent_plugin_geoip_spark.operators.enrich import GeoipEnricher
    from fluent_plugin_geoip_spark.sources.fixtures import world_db
    df = spark.createDataFrame(
        [("8.8.8.8",), ("garbage",), ("",)], "ip string")
    cfg = GeoipConfig(
        lookup_keys=["ip"],
        records={"country": "${country.iso_code['ip']}",
                 "latlon": "${location.latitude['ip']},"
                           "${location.longitude['ip']}"},
        fast_float_str=True)  # JVM float repr — keeps the plan Python-free
    out = GeoipEnricher(spark, cfg, world_db(),
                        strategy="jvm_join").transform(df)
    plan = explain(out)
    tree = plan.split("\n\n")[0]
    assert "ArrowEvalPython" not in tree, tree
    assert "BatchEvalPython" not in tree, tree
    assert tree.count("BroadcastHashJoin") == 1, tree
    assert "Exchange hashpartitioning" not in tree, tree
    assert out.count() == 3  # left join preserves rows (garbage/empty miss)


def test_jvm_join_v6_db_no_python_two_broadcasts(spark):
    """Round 8 (round-7 VERDICT item 2): a v6-capable database through
    strategy='jvm_join' must STILL run with no Python worker — the
    address parses JVM-side (functions.ipv6) and the native-v6 probe is
    a SECOND BroadcastHashJoin against the bias-flipped 128-bit range
    table. No shuffle Exchange; left joins preserve row count."""
    from fluent_plugin_geoip_spark.config import GeoipConfig
    from fluent_plugin_geoip_spark.operators.enrich import GeoipEnricher
    from fluent_plugin_geoip_spark.operators.geolookup import GeoDatabase
    db = GeoDatabase.from_mmdb(
        "tests/fixtures/geolite2-city-v6-test.mmdb")
    assert db.has_ipv6
    cfg = GeoipConfig(
        lookup_keys=["ip"],
        records={"country": "${country.iso_code['ip']}",
                 "latlon": "${location.latitude['ip']},"
                           "${location.longitude['ip']}"},
        fast_float_str=True)
    df = spark.createDataFrame(
        [("2001:db8::1234",), ("::ffff:66.102.3.80",), ("66.102.3.80",),
         ("garbage",), ("",)], "ip string")
    out = GeoipEnricher(spark, cfg, db, strategy="jvm_join").transform(df)
    plan = explain(out)
    tree = plan.split("\n\n")[0]
    assert "ArrowEvalPython" not in tree, tree
    assert "BatchEvalPython" not in tree, tree
    assert tree.count("BroadcastHashJoin") == 2, tree
    assert "Exchange hashpartitioning" not in tree, tree
    assert out.count() == 5


def test_jvm_join_v6_matches_arrow_kernel(spark):
    """Both kernels on the v6 fixture, every textual address class:
    native v6 hit (incl. the exact /32 range end), v4-mapped, v4-compat,
    country-only hit (lat nil → 0.0 default), v6 miss, v4 hit/miss,
    empty, null, garbage."""
    from fluent_plugin_geoip_spark.config import GeoipConfig
    from fluent_plugin_geoip_spark.operators.enrich import GeoipEnricher
    from fluent_plugin_geoip_spark.operators.geolookup import GeoDatabase
    db = GeoDatabase.from_mmdb(
        "tests/fixtures/geolite2-city-v6-test.mmdb")
    ips = ["2001:db8::1234", "::ffff:66.102.3.80", "::66.102.3.80",
           "2400:cb00:dead::1", "2001:db9::1", "", "66.102.3.80",
           "8.8.8.8", None, "not:an:ip::g", "0",
           "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff"]
    df = spark.createDataFrame(
        [(i, ip) for i, ip in enumerate(ips)], "id long, ip string")
    cfg = GeoipConfig(lookup_keys=["ip"], records={
        "city": "${city.names.en['ip']}",
        "country": "${country.iso_code['ip']}",
        "latitude": "${location.latitude['ip']}"})
    cols = ["id", "city", "country", "latitude"]
    a = (GeoipEnricher(spark, cfg, db, strategy="arrow")
         .transform(df).select(cols).orderBy("id").collect())
    j = (GeoipEnricher(spark, cfg, db, strategy="jvm_join")
         .transform(df).select(cols).orderBy("id").collect())
    assert a == j
    assert j[0].city == "V6 City" and j[1].city == "Mountain View"


def test_paragraph_dedup_partial_agg_no_window(spark, tmp_path_factory):
    """dedup_paragraphs' winner-per-paragraph must be an aggregate pair
    (partial map-side combine before the shuffle — on boilerplate-heavy
    web text the hot paragraphs collapse to one row per task before the
    wire) and NOT a window over partitionBy(para), which would ship every
    occurrence. min(struct) has no mutable hash buffer so the pair shows
    as Sort/ObjectHash aggregates; the pin is the pair + the absence of
    any Window node."""
    from fluent_plugin_geoip_spark.operators.curation import dedup_paragraphs

    d = str(tmp_path_factory.mktemp("paradedup") / "docs.parquet")
    spark.createDataFrame(
        [(i, f"para {i}\nshared footer\ntail {i % 3}") for i in range(40)],
        "doc_id long, text string").write.parquet(d)
    out = dedup_paragraphs(spark.read.parquet(d))
    plan = explain(out)
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree, tree
    # two agg pairs (winner selection + reassembly), each partial+final
    # (count word-exactly: "ObjectHashAggregate" contains "HashAggregate")
    import re as _re
    aggs = len(_re.findall(
        r"\b(?:SortAggregate|ObjectHashAggregate|HashAggregate)\b", tree))
    assert aggs == 4, tree
    # exactly two shuffles: the paragraph winner shuffle + the doc rebuild
    assert _shuffles(tree) == 2, tree


def test_jvm_join_v6_multi_key(spark):
    """Two lookup keys through the v6 jvm path: each key gets its own
    parse column + v4/v6 broadcast join pair (4 BroadcastHashJoins, no
    Python), and the per-key structs stay independent."""
    from fluent_plugin_geoip_spark.config import GeoipConfig
    from fluent_plugin_geoip_spark.operators.enrich import GeoipEnricher
    from fluent_plugin_geoip_spark.operators.geolookup import GeoDatabase
    db = GeoDatabase.from_mmdb(
        "tests/fixtures/geolite2-city-v6-test.mmdb")
    cfg = GeoipConfig(
        lookup_keys=["src", "dst"],
        records={"src_c": "${country.iso_code['src']}",
                 "dst_c": "${country.iso_code['dst']}"})
    df = spark.createDataFrame(
        [("2001:db8::1", "66.102.3.80"),
         ("8.8.8.8", "2400:cb00::9"),
         ("garbage", "")],
        "src string, dst string")
    out = GeoipEnricher(spark, cfg, db, strategy="jvm_join").transform(df)
    plan = explain(out)
    tree = plan.split("\n\n")[0]
    assert "ArrowEvalPython" not in tree, tree
    assert tree.count("BroadcastHashJoin") == 4, tree
    rows = {(r.src, r.src_c, r.dst_c) for r in out.collect()}
    assert ("2001:db8::1", "V6", "US") in rows
    assert ("8.8.8.8", "US", "AU") in rows
    assert ("garbage", None, None) in rows
