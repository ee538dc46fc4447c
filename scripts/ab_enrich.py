#!/usr/bin/env python
"""Interleaved same-window A/B of the ENRICH compute leg (round-6 VERDICT
item 1: with the sink leg fixed, the noop-sink leg reads raw 0.65-0.88 and
the suspected ceiling is Arrow/Python-worker bandwidth at 16 cores).

Levers measured (each variant is a fresh pinned child; variants alternate
A, B, C, A, B, C ... so every variant samples the same noise window):

- ``arrow``         — the pandas-UDF searchsorted kernel, default 64k
                      Arrow batch (what rounds 1-6 shipped)
- ``arrow_8k`` /
  ``arrow_256k``    — the same kernel at smaller/larger
                      ``spark.sql.execution.arrow.maxRecordsPerBatch``
- ``jvm``           — ``enrich_strategy='jvm_join'``: broadcast prefix-
                      bucket join, ZERO Python workers (round 7) — bounds
                      what the Python crossing costs at all

Each child: generate-and-cache n rows, 2 full-size warm-ups, best-of-3
timed ``enrich → noop sink`` (the exact compute leg bench_scaling
measures). Output: one JSON line with per-variant medians/bests and
ratios vs ``arrow``.

Usage: python scripts/ab_enrich.py [n_rows] [cpus] [pairs]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time, json
repo, cpus, n, workdir, strategy, batch = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5], sys.argv[6])
sys.path.insert(0, repo)
from pyspark.sql import SparkSession
from fluent_plugin_geoip_spark.plans.pipeline import GeoipPipeline
from fluent_plugin_geoip_spark.sources.pages import generate_pages

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.ui.enabled", "false")
         .config("spark.local.dir", workdir + "/local")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
         .config("spark.python.worker.faulthandler.enabled", "true")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pipe = GeoipPipeline(spark, enrich_strategy=strategy)
pages = generate_pages(spark, n, partitions=cpus * 4)
enr = pipe.enrich(pages).select("url", "lang", "country", "route_country")
best, times = 1e18, []
for i in range(5):                       # 2 warm + best-of-3
    t0 = time.perf_counter()
    enr.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    times.append(round(dt, 2))
    if i >= 2:
        best = min(best, dt)
print(json.dumps({"sec": round(best, 3),
                  "rows_per_sec": round(n / best, 1), "reps": times}))
"""

VARIANTS = [
    ("arrow", "arrow", "65536"),
    ("arrow_8k", "arrow", "8192"),
    ("arrow_256k", "arrow", "262144"),
    ("jvm", "jvm_join", "65536"),
]


def run_child(cpus: int, n: int, strategy: str, batch: str) -> dict:
    workdir = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        prefix="geoip_abe_")
    try:
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", _CHILD,
             REPO, str(cpus), str(n), workdir, strategy, batch],
            capture_output=True, text=True, timeout=1800,
            env=dict(os.environ, PYTHONFAULTHANDLER="1"))
        lines = out.stdout.strip().splitlines()
        if not lines:
            raise RuntimeError(
                f"child produced no output (rc={out.returncode}); "
                f"stderr tail: {out.stderr[-2000:]}")
        return json.loads(lines[-1])
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    results: dict[str, list[dict]] = {label: [] for label, _, _ in VARIANTS}
    for i in range(pairs):
        for label, strategy, batch in VARIANTS:
            r = run_child(cpus, n, strategy, batch)
            results[label].append(r)
            print(f"round {i + 1}/{pairs} {label}: best {r['sec']} s "
                  f"({r['rows_per_sec']:,.0f} rows/s) reps={r['reps']}",
                  flush=True)
    summary: dict = {"n_rows": n, "cpus": cpus, "pairs": pairs}
    for label, _, _ in VARIANTS:
        bests = [r["sec"] for r in results[label]]
        summary[label] = {
            "bests_sec": bests,
            "median_best_sec": round(statistics.median(bests), 3),
            "median_rows_per_sec": round(n / statistics.median(bests), 1),
            "max_rows_per_sec": round(n / min(bests), 1),
        }
    base = summary["arrow"]["median_best_sec"]
    for label, _, _ in VARIANTS[1:]:
        summary[f"speedup_{label}_vs_arrow"] = round(
            base / summary[label]["median_best_sec"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
