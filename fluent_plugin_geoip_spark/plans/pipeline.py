"""The flagship parse → enrich → route → aggregate plan (north_rule,
BASELINE.json:14) composed from the stage operators.

The logical plan is fully declarative: parse is native regex projection,
enrich is one ArrowEvalPython crossing (broadcast searchsorted kernel),
route adds a salted repartition (the ONLY shuffle before the sink), aggregate
is a Catalyst partial+final hash agg. At 1000 executors nothing here changes:
the scan parallelizes by file split, the enrich stage is a narrow map, the
broadcast DB replicates once per executor, and the fan-out shuffle is salted
against country skew.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import GeoipConfig
from ..operators.aggregate import (
    country_lang_counts, observe_pipeline_metrics, sink_counts,
)
from ..operators.enrich import GeoipEnricher
from ..operators.geolookup import GeoDatabase
from ..operators.parse import parse_pages
from ..operators.route import route_and_write, with_route_key
from ..sources.fixtures import world_db

# The flagship <record> config — Spark restatement of the reference tutorial
# (/root/reference/README.md:248-276: host → city / lat / lon) plus the
# country key the router needs.
FLAGSHIP_RECORDS = {
    "country": "${country.iso_code['client_ip']}",
    "city": "${city.names.en['client_ip']}",
    "latitude": "${location.latitude['client_ip']}",
    "longitude": "${location.longitude['client_ip']}",
}


@dataclass
class PipelineResult:
    enriched: DataFrame
    counts: DataFrame
    metrics: dict = field(default_factory=dict)
    manifest: dict = field(default_factory=dict)


ASN_RECORDS = {
    "asn": "${asn['client_ip']}",
    "as_org": "${as_org['client_ip']}",
}


class GeoipPipeline:
    """parse → enrich → route → aggregate over a pages DataFrame.

    Two lookup stages (city DB + ASN DB, per the north_star's "city/ASN"
    enrichment) run back-to-back; both UDFs depend only on the parsed ip
    long, so Spark's ExtractPythonUDFs batches them into a single
    ArrowEvalPython crossing.
    """

    def __init__(self, spark: SparkSession, database: GeoDatabase | None = None,
                 records: dict[str, str] | None = None,
                 skip_adding_null_record: bool = False,
                 asn_database: GeoDatabase | None = None,
                 enable_asn: bool = False,
                 enrich_strategy: str = "auto",
                 v6_text_fraction: float | None = None):
        # enrich_strategy: "auto" (default) → "jvm_join" (broadcast
        # prefix-bucket join; zero Python workers — measured 1.75× the
        # Arrow kernel on the compute leg, round 7) for EVERY database:
        # round 8 extended the kernel to v6 tables (JVM ipv6 parse +
        # second bias-flipped broadcast join), so a dual-stack GeoLite2
        # no longer demotes the stage to the Arrow crossing. "arrow"
        # (pandas-UDF searchsorted) stays available explicitly. Both are
        # pinned equal by the reference differential and a shared oracle
        # query.
        #
        # v6_text_fraction (round 9, the round-8 VERDICT item-1 hint):
        # the caller's estimate of how much of the address TEXT is
        # v6-shaped. The jvm kernel's Catalyst ipv6 parse is interpreted
        # (CodegenFallback — a pure-codegen parse blows the fused stage
        # past the JVM's JIT method ceiling, docs/v6_parse_r9.jsonl), so
        # its cost grows with the v6 fraction (interleaved A/B,
        # docs/v6_auto_r9.jsonl: 0.64 s at 0/6 v6 → 1.06 s at 5/6 on the
        # same rows, while the dual-Arrow kernel stays flat at ~0.13 s).
        # On a v6-capable database, "auto" therefore picks the Arrow
        # kernel when the hint says the text is v6-majority; with no
        # hint it stays on the zero-Python jvm kernel (the v4-dominant
        # flagship default, where jvm wins and the Python-worker memory
        # ceiling is the scale risk).
        self.spark = spark
        self.db = database or world_db()
        cfg = GeoipConfig(
            lookup_keys=["client_ip"],
            records=dict(records or FLAGSHIP_RECORDS),
            skip_adding_null_record=skip_adding_null_record,
        )

        def resolve(db: GeoDatabase) -> str:
            if enrich_strategy == "auto":
                if (db.has_ipv6 and v6_text_fraction is not None
                        and float(v6_text_fraction) >= 0.5):
                    return "arrow"
                return "jvm_join"
            return enrich_strategy

        self.enricher = GeoipEnricher(spark, cfg, self.db,
                                      strategy=resolve(self.db))
        self.asn_enricher = None
        if enable_asn:
            from ..sources.fixtures import asn_db
            adb = asn_database or asn_db()
            asn_cfg = GeoipConfig(lookup_keys=["client_ip"],
                                  records=dict(ASN_RECORDS))
            self.asn_enricher = GeoipEnricher(
                spark, asn_cfg, adb, strategy=resolve(adb))

    def enrich(self, pages: DataFrame) -> DataFrame:
        parsed = parse_pages(pages)
        out = self.enricher.transform(parsed)
        if self.asn_enricher is not None:
            out = self.asn_enricher.transform(out)
        return with_route_key(out)

    def run(self, pages: DataFrame, out_dir: str | None = None,
            resume: bool = False, salt_buckets: int = 16,
            collect_metrics: bool = True, audit: str = "full",
            strategy: str = "rebalance") -> PipelineResult:
        enriched = self.enrich(pages)
        obs = None
        if collect_metrics:
            enriched, obs = observe_pipeline_metrics(enriched)
        manifest = {}
        if out_dir is not None:
            keep = [c for c in enriched.columns if c != "access"]
            manifest, stats = route_and_write(
                enriched.select(*keep), out_dir, salt_buckets=salt_buckets,
                resume=resume, stat_cols=("lang",), audit=audit,
                strategy=strategy)
            # counts derive from the SAME lineage aggregate (no extra scan);
            # on resume the stats cover only partitions written this run
            rows = [("__miss__" if r["route_country"] == "__unrouted__"
                     else r["route_country"], r["lang"], r["rows"]) for r in stats]
            counts = self.spark.createDataFrame(
                rows, "country string, lang string, n long")
        else:
            counts = country_lang_counts(enriched)
            counts = counts.cache()
            counts.count()  # force the aggregate (and metrics)
        metrics = dict(obs.get) if obs is not None else {}
        return PipelineResult(enriched=enriched, counts=counts,
                              metrics=metrics, manifest=manifest)

    def sink_counts(self, enriched: DataFrame) -> DataFrame:
        return sink_counts(enriched)
