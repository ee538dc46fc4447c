"""End-to-end pipeline tests: parse → enrich → route → aggregate over the
deterministic pages table, verified against an INDEPENDENT DuckDB
recomputation (SQL range join on the same world table) — the routed-row /
per-sink count equality gate of BASELINE.json:2."""

import glob
import os

import duckdb
import pytest

from pyspark.sql import functions as F

from fluent_plugin_geoip_spark.operators.parse import (
    extract_text, parse_pages, text_invariant_violations,
)
from fluent_plugin_geoip_spark.operators.route import read_manifest, write_manifest
from fluent_plugin_geoip_spark.plans.pipeline import GeoipPipeline
from fluent_plugin_geoip_spark.sources.fixtures import world_rows
from fluent_plugin_geoip_spark.sources.pages import generate_pages

N = 2000


def world_ranges_sql() -> str:
    vals = ",\n".join(
        f"({r['range_start']}, {r['range_end']}, '{r['country.iso_code']}')"
        for r in world_rows())
    return f"(VALUES\n{vals}) AS r(range_start, range_end, country)"


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    generate_pages(spark, N, seed=42, partitions=4).write.parquet(d)
    return d


def duckdb_expected_counts(pages_dir):
    con = duckdb.connect()
    return con.execute(f"""
        WITH parsed AS (
          SELECT lang,
                 CASE WHEN regexp_matches(text, '^\\d+\\.\\d+\\.\\d+\\.\\d+ ')
                      THEN CAST(string_split(regexp_extract(text, '^(\\S+) ', 1), '.')[1] AS BIGINT) * 16777216
                         + CAST(string_split(regexp_extract(text, '^(\\S+) ', 1), '.')[2] AS BIGINT) * 65536
                         + CAST(string_split(regexp_extract(text, '^(\\S+) ', 1), '.')[3] AS BIGINT) * 256
                         + CAST(string_split(regexp_extract(text, '^(\\S+) ', 1), '.')[4] AS BIGINT)
                      ELSE NULL END AS ip_int
          FROM read_parquet('{pages_dir}/*.parquet')
        )
        SELECT coalesce(r.country, '__miss__') AS country, lang,
               CAST(count(*) AS BIGINT) AS n
        FROM parsed p LEFT JOIN {world_ranges_sql()}
          ON p.ip_int BETWEEN r.range_start AND r.range_end
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()


def test_generator_deterministic(spark):
    a = generate_pages(spark, 100, seed=42).collect()
    b = generate_pages(spark, 100, seed=42, partitions=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = generate_pages(spark, 100, seed=7).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_text_invariant(spark, pages_dir):
    pages = spark.read.parquet(pages_dir)
    assert text_invariant_violations(pages).count() == 0
    # and the parse stage flag agrees
    flagged = parse_pages(pages, validate_text=True)
    assert flagged.filter(~F.col("text_ok")).count() == 0


def test_html_to_text_goldens(spark):
    """The general native-expression extractor on messy Common-Crawl-style
    HTML: script/style/comment removal, block-boundary spacing, quoted-attr
    '>' tolerance, entity decode incl. double-escapes (VERDICT r2 item 6)."""
    from fluent_plugin_geoip_spark.operators.parse import html_to_text
    cases = [
        # (html, expected canonical text)
        ("<html><body><p>Hello</p><p>world</p></body></html>", "Hello world"),
        ("<div>a<br>b</div>", "a b"),
        ("<script>var x = '<p>not text</p>';</script>after", "after"),
        ("<style type='text/css'>p > em { color: red }</style>body", "body"),
        ("<!-- a <b> comment -->text<!--- nested -- -->", "text"),
        ('<a title="a>b" href="x">link</a> tail', "link tail"),
        ("Tom &amp; Jerry &lt;3 &quot;cheese&quot; &#39;n&#39; more",
         "Tom & Jerry <3 \"cheese\" 'n' more"),
        ("double &amp;lt; escape", "double &lt; escape"),
        ("non&nbsp;breaking&#160;space", "non breaking space"),
        ("  lots \t of\n\nwhitespace  ", "lots of whitespace"),
        ("<SCRIPT SRC='x.js'>1</SCRIPT><P>UPPER</P>", "UPPER"),
        ("plain text, no markup", "plain text, no markup"),
        ("<ul><li>one</li><li>two</li></ul>", "one two"),
        ("<span>in</span>line", "inline"),  # inline tags don't add spaces
        ("", ""),
        # round 4: full-ASCII numeric entities, decimal + hex
        ("&#72;&#101;y&#x21;", "Hey!"),
        ("&#0000065;&#x0041;", "AA"),  # leading zeros
        ("tab&#9;and&#x0A;newline", "tab and newline"),  # → ws, collapsed
        ("&amp;#65; stays literal", "&#65; stays literal"),
        ("&#38;lt; decodes to literal entity", "&lt; decodes to literal entity"),
        ("&#1070;&#x4F60; outside ASCII kept", "&#1070;&#x4F60; outside ASCII kept"),
        ("&#8;&#127; control/DEL kept", "&#8;&#127; control/DEL kept"),
        ("nb&#160;sp&#xA0;forms", "nb sp forms"),
        ("marker\x00bytes\x01normalized &#77;", "markerbytesnormalized M"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    out = [r.t for r in
           df.select(html_to_text(F.col("html"), decoded=True).alias("t"))
           .collect()]
    for (h, want), got in zip(cases, out):
        assert got == want, (h, got, want)
    # binary input path + the <pre> invariant pages also extract sensibly
    enc = spark.createDataFrame([("<p>bin&amp;ary</p>",)], "s string") \
        .select(F.encode("s", "UTF-8").alias("html"))
    assert enc.select(html_to_text(F.col("html")).alias("t")) \
              .first().t == "bin&ary"


def test_numeric_entity_decode_differential(spark):
    """Differential check of the single-pass numeric-entity decoder against
    an independently written Python reference (re.split tokenizer, not a
    marker pass) over a seeded random corpus of adversarial fragments:
    in/out-of-ASCII codes, leading zeros, hex case, over-long digit runs,
    truncated entities, double escapes, marker bytes."""
    import random
    import re

    from fluent_plugin_geoip_spark.operators.parse import html_to_text

    named = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]

    def ref(s: str) -> str:
        s = s.replace("\x00", "").replace("\x01", "")
        s = re.sub(r"&#(?:0*160|[xX]0*[Aa]0);", " ", s)
        parts = re.split(r"&#([0-9]{1,7}|[xX][0-9A-Fa-f]{1,6});", s)
        out = []
        for i, p in enumerate(parts):
            if i % 2 == 0:
                for ent, ch in named:
                    p = p.replace(ent, ch)
                out.append(p)
            else:
                num = int(p[1:], 16) if p[0] in "xX" else int(p)
                out.append(chr(num) if 9 <= num <= 126 else f"&#{p};")
        # .strip(" ") not .strip(): Python's bare strip eats \x1c-\x1f
        # (Unicode whitespace), Spark's trim only spaces
        return re.sub(r"[ \t\n\x0b\f\r]+", " ", "".join(out)).strip(" ")

    rng = random.Random(1234)
    frags = (["plain ", "x", "; ", "&", "#", "&#", "&#;", "&#x;", "0", "9",
              "\x00", "\x01", " & # 6 5 ;", "&amp;#65;", "&#38;lt;",
              "&#99999999;", "&#xFFFFFFF;", "&#0000072;", "&#x0041;",
              "&#0160;", "&#00160;",
              "&nbsp;", "&lt;b&gt;", "&#160;", "&#xA0;", "&#xa0;"]
             + [f"&#{n};" for n in (0, 8, 9, 10, 13, 31, 32, 64, 65, 126,
                                    127, 128, 160, 255, 1070, 100000)]
             + [f"&#x{n:x};" for n in (8, 9, 33, 65, 126, 127, 160, 0x4F60)]
             + [f"&#x{n:X};" for n in (9, 65, 126, 255)])
    cases = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 12)))
             for _ in range(200)]
    df = spark.createDataFrame([(c,) for c in cases], "html string")
    got = [r.t for r in
           df.select(html_to_text(F.col("html"), decoded=True).alias("t"))
           .collect()]
    for c, g in zip(cases, got):
        assert g == ref(c), (repr(c), repr(g), repr(ref(c)))


def test_html_to_text_is_native(spark):
    """The extractor must stay JVM-side: no Python/Arrow eval nodes in the
    plan (it is built for the 100 TB parse hot path)."""
    from fluent_plugin_geoip_spark.operators.parse import html_to_text
    df = generate_pages(spark, 10)
    plan = df.select(html_to_text(F.col("html")).alias("t")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_parse_fields(spark, pages_dir):
    pages = spark.read.parquet(pages_dir)
    parsed = parse_pages(pages, include_access=True)
    row = (parsed.filter(F.col("client_ip").rlike(r"^\d+\.")).select("access")
           .first()["access"])
    assert row["method"] == "GET"
    assert row["status"] in (200, 301, 404, 500)
    assert row["bytes"] is not None
    # host extracted from url
    h = parsed.select("host").first()["host"]
    assert h.startswith("www.site")


def test_pipeline_counts_match_duckdb(spark, pages_dir):
    pages = spark.read.parquet(pages_dir)
    result = GeoipPipeline(spark).run(pages)
    got = sorted(tuple(r) for r in result.counts.collect())
    expected = sorted(tuple(r) for r in duckdb_expected_counts(pages_dir))
    assert got == expected
    m = result.metrics
    assert m["rows_total"] == N
    assert m["rows_enriched"] + m["rows_missed"] == N
    assert m["rows_parsed"] >= m["rows_enriched"]


def test_route_write_and_sink_equality(spark, pages_dir, tmp_path):
    pages = spark.read.parquet(pages_dir)
    out = str(tmp_path / "routed")
    result = GeoipPipeline(spark).run(pages, out_dir=out)
    # per-sink counts from written files == manifest == independent recount
    manifest = read_manifest(out)
    sink_rows = {d.split("=")[-1] for d in glob.glob(f"{out}/route_country=*")}
    assert sink_rows == set(manifest.keys())
    written = spark.read.parquet(out)
    recount = {r["route_country"]: r["rows"]
               for r in written.groupBy("route_country").agg(
                   F.count("*").alias("rows")).collect()}
    assert recount == {k: v["rows"] for k, v in manifest.items()}
    assert sum(recount.values()) == N
    # counts from the written sinks match the duckdb oracle too
    got = sorted(tuple(r) for r in result.counts.collect())
    expected = sorted(tuple(r) for r in duckdb_expected_counts(pages_dir))
    assert got == expected


def test_resume_skips_completed_partitions(spark, pages_dir, tmp_path):
    pages = spark.read.parquet(pages_dir)
    out = str(tmp_path / "routed")
    pipe = GeoipPipeline(spark)
    first = pipe.run(pages, out_dir=out)
    full = dict(first.manifest)
    # simulate a crash that completed only the US + JP partitions
    partial = {k: v for k, v in full.items() if k in ("US", "JP")}
    write_manifest(out, partial)
    second = pipe.run(pages, out_dir=out, resume=True)
    assert set(second.manifest.keys()) == set(full.keys())
    assert {k: v["rows"] for k, v in second.manifest.items()} == \
           {k: v["rows"] for k, v in full.items()}
    # resume preserved the completed partitions' entries untouched
    assert second.manifest["US"]["completed_at"] == partial["US"]["completed_at"]
    written = spark.read.parquet(out)
    assert written.count() == N


def test_asn_enrichment_self_consistent(spark):
    """FIXTURES.md §4: every generated IP's ASN matches the generator table."""
    import ipaddress
    from fluent_plugin_geoip_spark.sources.fixtures import asn_rows
    pages = generate_pages(spark, 1500)
    enr = GeoipPipeline(spark, enable_asn=True).enrich(pages)
    rows = enr.select("client_ip", "asn", "as_org") \
              .filter(F.col("asn").isNotNull()).collect()
    assert rows
    table = sorted((r["range_start"], r["range_end"], r["asn"], r["as_org"])
                   for r in asn_rows())
    for r in rows[:300]:
        ip = int(ipaddress.ip_address(r.client_ip))
        hit = [(a, o) for s, e, a, o in table if s <= ip <= e]
        assert hit and hit[0] == (r.asn, r.as_org)


def test_sink_format_fallback(spark):
    from fluent_plugin_geoip_spark.operators.route import (
        iceberg_available, resolve_sink_format)
    # sandbox has no iceberg jars → parquet fallback; explicit always wins
    assert resolve_sink_format(spark) in ("parquet", "iceberg")
    if not iceberg_available(spark):
        assert resolve_sink_format(spark) == "parquet"
    assert resolve_sink_format(spark, "orc") == "orc"


def test_iceberg_roundtrip_when_available(spark, pages_dir, tmp_path):
    """Real Iceberg round-trip of the routed partition layout — runs only
    when the Iceberg Spark runtime is on the classpath (VERDICT r2 item 8:
    exercise the branch or skip with an explicit reason)."""
    from fluent_plugin_geoip_spark.operators.route import iceberg_available
    if not iceberg_available(spark):
        pytest.skip(
            "no Iceberg jars in this sandbox (no network to fetch "
            "iceberg-spark-runtime); the sink auto-falls back to parquet "
            "with the identical per-country partition layout, which the "
            "manifest/resume/fan-out tests cover end-to-end")
    # with jars present: hadoop catalog over tmp_path, write the routed
    # layout as an Iceberg table partitioned by route key, read it back
    spark.conf.set("spark.sql.catalog.it",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    pages = spark.read.parquet(pages_dir)
    enriched = GeoipPipeline(spark).enrich(pages)
    enriched.writeTo("it.db.routed").partitionedBy(
        F.col("route_country")).createOrReplace()
    back = spark.read.table("it.db.routed")
    assert back.count() == pages.count()
    assert (back.groupBy("route_country").count().count()
            == enriched.select("route_country").distinct().count())


def test_input_lineage_recorded(spark, pages_dir, tmp_path):
    from fluent_plugin_geoip_spark.operators.route import read_input_lineage
    out = str(tmp_path / "routed")
    GeoipPipeline(spark).run(spark.read.parquet(pages_dir), out_dir=out)
    inputs = read_input_lineage(out)
    assert inputs and all(pages_dir.split("/")[-1] in p or "pages" in p
                          for p in inputs)


def test_non_resume_cleans_stale_partitions(spark, pages_dir, tmp_path):
    """resume=False into a non-empty sink must not leave partitions from a
    previous run on disk or in the manifest (round-1 ADVICE, medium)."""
    pages = spark.read.parquet(pages_dir)
    out = str(tmp_path / "routed")
    pipe = GeoipPipeline(spark)
    pipe.run(pages, out_dir=out)
    # fake a partition left behind by an earlier run over different input
    spark.createDataFrame([("stale", "en", "x")],
                          "url string, lang string, text string") \
        .write.parquet(f"{out}/route_country=ZZ")
    res = pipe.run(pages, out_dir=out)  # resume=False: clean rebuild
    assert not os.path.exists(f"{out}/route_country=ZZ")
    assert "ZZ" not in res.manifest
    assert sum(v["rows"] for v in res.manifest.values()) == N
    assert spark.read.parquet(out).count() == N


def test_resume_audit_is_partition_pruned(spark, pages_dir, tmp_path):
    """The post-write lineage audit must scan only partitions written this
    run: stats cover no completed partition, and the pruning mechanism (an
    isin filter on the partition column) reaches the source as a
    PartitionFilter, not a post-scan filter."""
    from fluent_plugin_geoip_spark.operators.route import route_and_write
    pages = spark.read.parquet(pages_dir)
    out = str(tmp_path / "routed")
    pipe = GeoipPipeline(spark)
    first = pipe.run(pages, out_dir=out)
    done = {k: v for k, v in first.manifest.items() if k not in ("FR",)}
    write_manifest(out, done)
    enriched = pipe.enrich(pages)
    manifest, stats = route_and_write(enriched.drop("access"), out,
                                      resume=True, stat_cols=("lang",))
    assert {r["route_country"] for r in stats} == {"FR"}
    assert manifest["US"]["completed_at"] == done["US"]["completed_at"]
    # the audit read prunes at the file-source partition level
    plan = spark.read.parquet(out).filter(
        F.col("route_country").isin(["FR"]))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "FR" in plan.split("PartitionFilters")[1][:200]


def test_manifest_io_through_hadoop_fs(spark, tmp_path):
    """Manifest/lineage I/O must go through the Hadoop FS API so out_dir on
    s3a://hdfs:// works (round-4 VERDICT finding 2). An explicit file://
    URI proves the Hadoop-FS code path end-to-end: plain open() would fail
    on the scheme-qualified string."""
    from fluent_plugin_geoip_spark.operators.route import (
        read_input_lineage, write_input_lineage)
    out = "file://" + str(tmp_path / "routed")
    m = {"US": {"rows": 3, "checksum": 7, "completed_at": 1}}
    write_manifest(out, m)
    assert not os.path.exists(str(tmp_path / "routed") + "file:")  # sanity
    assert read_manifest(out) == m
    # overwrite is atomic-rename based and replaces cleanly
    m2 = {"JP": {"rows": 1, "checksum": 2, "completed_at": 2}}
    write_manifest(out, m2)
    assert read_manifest(out) == m2
    write_input_lineage(out, ["a.parquet", "b.parquet"])
    assert read_input_lineage(out) == ["a.parquet", "b.parquet"]
    # the same bytes are visible through the plain local path too
    assert read_manifest(str(tmp_path / "routed")) == m2


def test_resume_through_scheme_qualified_out_dir(spark, pages_dir, tmp_path):
    """Full route→manifest→resume cycle with a scheme-qualified out_dir —
    every FS touch (partition listing, stale clean, manifest, lineage) must
    survive the file:// prefix."""
    pages = spark.read.parquet(pages_dir)
    out = "file://" + str(tmp_path / "routed")
    pipe = GeoipPipeline(spark)
    first = pipe.run(pages, out_dir=out)
    assert sum(v["rows"] for v in first.manifest.values()) == N
    partial = {k: v for k, v in first.manifest.items() if k in ("US",)}
    write_manifest(out, partial)
    second = pipe.run(pages, out_dir=out, resume=True)
    assert {k: v["rows"] for k, v in second.manifest.items()} == \
           {k: v["rows"] for k, v in first.manifest.items()}
    assert spark.read.parquet(out).count() == N


def test_audit_modes(spark, pages_dir, tmp_path):
    """audit='counts' keeps exact per-partition rows without the checksum
    re-read; audit='off' skips the read-back job entirely (round-4 VERDICT
    finding 4 — bounding audit I/O for 100 TB-written runs)."""
    from fluent_plugin_geoip_spark.operators.route import route_and_write
    pages = spark.read.parquet(pages_dir)
    pipe = GeoipPipeline(spark)
    enriched = pipe.enrich(pages).drop("access")

    full = str(tmp_path / "full")
    m_full, _ = route_and_write(enriched, full, stat_cols=("lang",))

    counts = str(tmp_path / "counts")
    m_counts, stats = route_and_write(enriched, counts, stat_cols=("lang",),
                                      audit="counts")
    assert {k: v["rows"] for k, v in m_counts.items()} == \
           {k: v["rows"] for k, v in m_full.items()}
    assert all(v["checksum"] == 0 for v in m_counts.values())
    assert stats and all("checksum" not in r.asDict() for r in stats)

    off = str(tmp_path / "off")
    m_off, stats_off = route_and_write(enriched, off, audit="off")
    assert stats_off == []
    assert set(m_off.keys()) == set(m_full.keys())
    assert all(v["rows"] is None and v["checksum"] is None
               for v in m_off.values())
    # the data itself is identical regardless of audit level
    assert spark.read.parquet(off).count() == N

    with pytest.raises(ValueError, match="audit"):
        route_and_write(enriched, str(tmp_path / "bad"), audit="sampled")


def test_rebalance_strategy_one_file_per_small_sink(spark, tmp_path):
    """Round-6 fan-out default: AQE REBALANCE sizes write partitions, so at
    small scale every sink coalesces to exactly ONE file (static salting
    wrote up to salt_buckets near-empty files per sink), and the manifest
    records files/bytes per sink for write-leg diagnosability."""
    pages = generate_pages(spark, 20_000, seed=11, partitions=8)
    res = GeoipPipeline(spark).run(pages, out_dir=str(tmp_path / "rb"),
                                   strategy="rebalance")
    assert res.manifest
    for v in res.manifest.values():
        assert v["files"] >= 1 and v["bytes"] > 0
    assert (sum(v["files"] for v in res.manifest.values())
            == len(res.manifest))
    # salted fan-out on the same input writes strictly more files
    res_salt = GeoipPipeline(spark).run(pages, out_dir=str(tmp_path / "sa"),
                                        strategy="salt")
    assert (sum(v["files"] for v in res_salt.manifest.values())
            > len(res_salt.manifest))
    assert ({k: v["rows"] for k, v in res_salt.manifest.items()}
            == {k: v["rows"] for k, v in res.manifest.items()})


def test_compact_sinks_merges_fragmented_partitions(spark, tmp_path):
    """Round-6 maintenance operator: after several incremental runs leave
    multiple files per sink, compact_sinks rewrites ONLY the fragmented
    partitions down to right-sized files, preserves every row, refreshes
    manifest files/bytes, and refuses nothing it shouldn't."""
    from fluent_plugin_geoip_spark.operators.route import (
        compact_sinks, read_manifest, sink_file_stats,
    )
    out = str(tmp_path / "sink")
    pages = generate_pages(spark, 10_000, seed=3, partitions=8)
    pipe = GeoipPipeline(spark)
    res = pipe.run(pages, out_dir=out)
    # fragment: three resumed incremental appends of new partitions would
    # each add files; simulate by salting a second run into the same dirs
    pages2 = generate_pages(spark, 10_000, seed=3, partitions=8)
    enriched = pipe.enrich(pages2)
    keep = [c for c in enriched.columns if c != "access"]
    (enriched.select(*keep).repartition(8)
     .write.mode("append").partitionBy("route_country").parquet(out))
    vals = sorted(res.manifest)
    before = sink_file_stats(spark, out, "route_country", vals)
    assert any(f > 1 for f, _ in before.values())
    total_before = spark.read.parquet(out).count()

    # manifest rows are stale (we appended outside route_and_write), so
    # compact without manifest verification first
    done = compact_sinks(spark, out, resume_manifest=False)
    assert done  # something was fragmented and got compacted
    after = sink_file_stats(spark, out, "route_country", vals)
    assert all(f == 1 for f, _ in after.values())
    assert spark.read.parquet(out).count() == total_before
    # second compaction is a no-op
    assert compact_sinks(spark, out, resume_manifest=False) == {}


def test_compact_sinks_verifies_manifest_rows(spark, tmp_path):
    """With a manifest present, compaction cross-checks per-partition row
    counts against lineage and fails loudly on disagreement."""
    from fluent_plugin_geoip_spark.operators.route import (
        compact_sinks, read_manifest, write_manifest,
    )
    out = str(tmp_path / "sink")
    pages = generate_pages(spark, 5_000, seed=5, partitions=4)
    res = GeoipPipeline(spark).run(pages, out_dir=out, strategy="salt",
                                   salt_buckets=4)
    # salt wrote >1 file for at least the hot sinks; manifest rows accurate
    done = compact_sinks(spark, out)   # verifies against manifest: passes
    assert done
    m = read_manifest(out)
    assert all(v["files"] == 1 for k, v in m.items()
               if k in done)
    # corrupt the manifest → compaction must refuse
    m[next(iter(m))]["rows"] += 1
    write_manifest(out, m)
    # re-fragment so there is something to compact
    spark.read.parquet(out).repartition(4) \
        .write.mode("append").partitionBy("route_country").parquet(out)
    with pytest.raises(IOError, match="disagrees with its lineage"):
        compact_sinks(spark, out)


def test_auto_strategy_respects_v6_fraction_hint(spark):
    """Round-9 adaptive auto (round-8 VERDICT item 1): on a v6-capable
    database, a v6-majority text hint flips the enrich kernel to the
    dual-Arrow path (where it wins — docs/v6_auto_r9.jsonl); no hint, a
    sub-majority hint, or a v4-only database stay on the zero-Python
    jvm kernel."""
    from fluent_plugin_geoip_spark.operators.geolookup import GeoDatabase
    v6db = GeoDatabase.from_mmdb(os.path.join(
        os.path.dirname(__file__), "fixtures", "geolite2-city-v6-test.mmdb"))
    assert v6db.has_ipv6
    assert GeoipPipeline(spark, database=v6db,
                         v6_text_fraction=0.9).enricher.strategy == "arrow"
    assert GeoipPipeline(spark, database=v6db,
                         v6_text_fraction=0.2).enricher.strategy == "jvm_join"
    assert GeoipPipeline(spark, database=v6db).enricher.strategy == "jvm_join"
    # v4-only database: the hint is irrelevant, jvm_join stands
    assert GeoipPipeline(spark,
                         v6_text_fraction=0.9).enricher.strategy == "jvm_join"
    # explicit strategies are never overridden by the hint
    assert GeoipPipeline(spark, database=v6db, enrich_strategy="jvm_join",
                         v6_text_fraction=0.9).enricher.strategy == "jvm_join"
