#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline queries:
- ``pipeline``: the flagship parse→enrich→route→aggregate job over a
  deterministically generated pages table (rows scaled to the sf of
  $SPARK_GRAFT_SF_DIR), including the partitioned fan-out write;
- the driver-contract queries over the testdata tables.

Every number is warm best-of-N (default N=3, env SPARK_GRAFT_REPS): one
untimed warm-up materialization per query (codegen, Arrow worker spin-up,
broadcast/db-cache population), then the min of N timed runs — the protocol
the scaling sweeps use, so single-shot substrate noise (the box's documented
±50% windows, BASELINE.md) stops leaking into per-round BENCH files.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PAGES (override row count),
     SPARK_GRAFT_REPS (default 3 timed reps per query).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from fluent_plugin_geoip_spark.plans import testdata_queries as tq  # noqa: E402
from fluent_plugin_geoip_spark.plans.pipeline import GeoipPipeline  # noqa: E402
from fluent_plugin_geoip_spark.sources.pages import generate_pages  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def best_of(fn, reps: int = None) -> tuple[float, object]:
    """One untimed warm-up call, then min wall-clock of ``reps`` timed calls.
    ``fn`` must fully materialize (count/collect) — it returns the result of
    the last timed call."""
    reps = REPS if reps is None else reps
    fn()  # warm-up: codegen, Python workers, broadcasts, driver db caches
    best, result = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn()
        best = min(best, time.perf_counter() - t0)
    return best, result


# EVERY driver-contract query is benched, derived from tq.QUERIES itself so
# a newly added query can't silently skip the bench (round-4 VERDICT
# finding 5). The operator-level extras below carry an `_op`-style label.
BENCH_QUERIES = sorted(tq.QUERIES)


def bench_training_ops(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Heavier training-data operators benched at their operator-level entry
    points, at sizes the small oracle-query forms don't reach: MinHash-LSH
    near-dup over the full documents table, SimHash ditto, LSH ANN over the
    embeddings table, real PPM decode over 20k generated images. Labels end
    in ``_op``/``_stats`` to keep them distinct from the oracle-query names
    (which are all benched above)."""
    from pyspark.sql import functions as F

    from fluent_plugin_geoip_spark.operators import dedup, similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out: dict[str, float] = {}

    dt, _ = best_of(lambda: dedup.minhash_lsh_dedup(docs, threshold=0.8).count())
    out["dedup_minhash_lsh_op"] = round(dt, 3)

    dt, _ = best_of(lambda: dedup.simhash_dedup(docs, max_hamming=3).count())
    out["dedup_simhash_op"] = round(dt, 3)

    q = embs.filter(F.col("vec_id") < 20)
    dt, _ = best_of(
        lambda: similarity.lsh_topk(embs, q, k=10, nbits=8, n_tables=4).count())
    out["ann_lsh_topk_op"] = round(dt, 3)

    # real image decode throughput: 20k binary PPMs → pixel stats + ahash
    from fluent_plugin_geoip_spark.operators import multimodal
    dt, _ = best_of(lambda: multimodal.image_stats(
        multimodal.generate_ppm_images(spark, 20_000, width=16, height=16)).count())
    out["multimodal_ppm_stats"] = round(dt, 3)
    return out


def make_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fluent_plugin_geoip_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def bench_pipeline(spark: SparkSession, n_pages: int) -> tuple[float, dict]:
    out_dir = tempfile.mkdtemp(prefix="geoip_bench_")
    try:
        pages = generate_pages(spark, n_pages,
                               partitions=spark.sparkContext.defaultParallelism * 2)
        pages = pages.cache()
        n = pages.count()  # materialize input outside the timed window
        pipe = GeoipPipeline(spark)
        # warm up Python/Arrow workers + codegen + write path outside the
        # timed window (measures steady-state throughput, not JVM warm-up)
        pipe.run(generate_pages(spark, 1000), collect_metrics=False,
                 out_dir=os.path.join(out_dir, "warmup"))
        dt = float("inf")
        # headline metric gets extra reps: the round-6 interleaved A/B
        # (BASELINE.md) measured ±18% best-of-3 swing within one hour on
        # this box, which had produced contradictory per-round artifacts
        for i in range(max(REPS, 5)):  # best-of-N to damp co-tenant noise
            t0 = time.perf_counter()
            res = pipe.run(pages, out_dir=os.path.join(out_dir, f"routed{i}"))
            dt = min(dt, time.perf_counter() - t0)
        pages.unpersist()
        return dt, {"rows": n, "rows_per_sec": n / dt,
                    "metrics": res.metrics, "sinks": len(res.manifest)}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", str(int(5_000_000 * sf))))

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    extra: dict[str, object] = {}

    dt, info = bench_pipeline(spark, n_pages)
    queries["pipeline"] = round(dt, 3)
    extra["pipeline"] = info

    for name in BENCH_QUERIES:
        fn = tq.QUERIES[name]
        dt, n = best_of(lambda: fn(spark, sf_dir).count())
        queries[name] = round(dt, 3)
        extra[name] = {"rows": n}

    queries.update(bench_training_ops(spark, sf_dir))

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "e2e_enrich_pipeline_and_queries_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "reps": REPS,
        "pages_rows": n_pages,
        "pipeline_rows_per_sec": round(extra["pipeline"]["rows_per_sec"], 1),
        "detail": {k: v for k, v in extra.items() if k == "pipeline"},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
