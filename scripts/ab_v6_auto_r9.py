#!/usr/bin/env python
"""Round-9 A/B: jvm_join vs arrow enrich kernels as a function of the
input's v6-text fraction, on a v6-capable database.

Motivates the ``v6_text_fraction`` hint consumed by GeoipPipeline's
``enrich_strategy="auto"``: the all-JVM kernel wins on v4-dominant text
(zero Python crossings, measured 1.75x the Arrow kernel on the compute
leg in round 7), but its Catalyst ipv6 parse is interpreted
(CodegenFallback — see docs/v6_parse_r9.jsonl for why a pure-codegen
parse is not attainable inside this fused stage), so on v6-HEAVY text
the vectorized dual-Arrow kernel is cheaper per core. This script
measures both kernels at several v6 fractions, interleaved, warm
best-of-N, and appends one JSON line to docs/v6_auto_r9.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import make_spark  # noqa: E402
from fluent_plugin_geoip_spark.config import GeoipConfig  # noqa: E402
from fluent_plugin_geoip_spark.operators.enrich import GeoipEnricher  # noqa: E402
from fluent_plugin_geoip_spark.operators.geolookup import GeoDatabase  # noqa: E402
from fluent_plugin_geoip_spark.plans import testdata_queries as tq  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

# v6-shaped and v4-shaped address pools (the bench row's own pool plus
# plain dotted quads)
V6_POOL = ["2001:db8::1234", "::ffff:66.102.3.80", "::66.102.3.80",
           "2400:cb00:dead::1", "2001:db9::1"]
V4_POOL = ["66.102.3.80", "8.8.8.8", "81.2.69.160", "1.0.16.1",
           "66.102.3.81", ""]


def best_of(fn):
    fn()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    db = GeoDatabase.from_mmdb(tq._MMDB_V6_FIXTURE)
    cfg = GeoipConfig(lookup_keys=["ip"], records={
        "city": "${city.names.en['ip']}",
        "country": "${country.iso_code['ip']}",
        "latitude": "${location.latitude['ip']}",
    })
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = {}
    for v6_sixths in (0, 1, 3, 5):
        pool = V6_POOL[:v6_sixths] + V4_POOL[:6 - v6_sixths]
        df = ev.withColumn("ip", F.element_at(
            F.array(*[F.lit(s) for s in pool]),
            (F.col("event_id") % 6).cast("int") + 1))
        res = {}
        for strat in ("jvm_join", "arrow", "jvm_join", "arrow"):
            spark.sparkContext.setJobDescription(
                f"ab_v6_auto:{v6_sixths}/6:{strat}")
            enr = GeoipEnricher(spark, cfg, db, strategy=strat)
            t = best_of(lambda: enr.transform(df)
                        .select("event_id", "city", "country", "latitude")
                        .count())
            res[strat] = min(res.get(strat, float("inf")), t)
        out[f"v6_frac_{v6_sixths}_of_6"] = res
    rec = {"bench": "v6_auto_r9", "sf_dir": sf_dir, "cpus": cpus,
           "reps": REPS, "interleaved": True, "cases": out}
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "v6_auto_r9.jsonl"),
            "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
