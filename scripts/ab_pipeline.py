#!/usr/bin/env python
"""Interleaved same-session A/B of the flagship pipeline across two code
versions (round-6 VERDICT item 1: driver BENCH_r05 read 129k rows/s where
BENCH_r04 read 197k and the builder's own round-5 run read 224k — on a box
with documented ±50% window variance, only an INTERLEAVED comparison can
separate a code regression from weather).

Protocol:
- two checkouts (e.g. the repo HEAD and a `git worktree` of the round-4
  verdict commit) are exercised by alternating child processes:
  A, B, A, B, ... `pairs` times — both versions sample the same window.
- each child is the flagship bench leg exactly as bench.py measures it:
  generate-and-cache n_rows pages, one full-size warm-up rep, then
  best-of-`reps` timed `pipe.run(out_dir=...)` (parse → enrich → route
  fan-out write → lineage audit), tmpfs sinks.
- output: per-child bests per version, plus median-of-bests and
  best-of-bests, and the ratio.

Usage:
  python scripts/ab_pipeline.py labelA=/path/to/repoA labelB=/path/to/repoB \
      [n_rows] [cpus] [pairs]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

_CHILD = r"""
import sys, time, json, shutil
repo, cpus, n, workdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession
from fluent_plugin_geoip_spark.plans.pipeline import GeoipPipeline
from fluent_plugin_geoip_spark.sources.pages import generate_pages

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.ui.enabled", "false")
         .config("spark.local.dir", workdir + "/local")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = generate_pages(spark, n,
                       partitions=spark.sparkContext.defaultParallelism * 2)
pages = pages.cache(); pages.count()
pipe = GeoipPipeline(spark)
pipe.run(generate_pages(spark, 1000), collect_metrics=False,
         out_dir=workdir + "/warmup")
best, times = 1e18, []
for i in range(3):
    t0 = time.perf_counter()
    pipe.run(pages, out_dir=f"{workdir}/r{i}")
    dt = time.perf_counter() - t0
    shutil.rmtree(f"{workdir}/r{i}", ignore_errors=True)
    times.append(round(dt, 3)); best = min(best, dt)
print(json.dumps({"sec": round(best, 3), "rows_per_sec": round(n / best, 1),
                  "reps": times}))
"""


def run_child(repo: str, cpus: int, n: int) -> dict:
    workdir = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        prefix="geoip_ab_")
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, repo, str(cpus), str(n), workdir],
            capture_output=True, text=True, timeout=1800)
        lines = out.stdout.strip().splitlines()
        if not lines:
            raise RuntimeError(f"child produced no output (rc={out.returncode}); "
                               f"stderr tail: {out.stderr[-2000:]}")
        return json.loads(lines[-1])
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    specs = [a for a in sys.argv[1:] if "=" in a]
    rest = [a for a in sys.argv[1:] if "=" not in a]
    if len(specs) != 2:
        sys.exit("need exactly two label=path specs")
    n = int(rest[0]) if len(rest) > 0 else 500_000
    cpus = int(rest[1]) if len(rest) > 1 else 32
    pairs = int(rest[2]) if len(rest) > 2 else 5
    versions = [tuple(s.split("=", 1)) for s in specs]
    results: dict[str, list[dict]] = {label: [] for label, _ in versions}
    for i in range(pairs):
        for label, repo in versions:
            r = run_child(repo, cpus, n)
            results[label].append(r)
            print(f"pair {i + 1}/{pairs} {label}: best {r['sec']} s "
                  f"({r['rows_per_sec']:,.0f} rows/s) reps={r['reps']}",
                  flush=True)
    summary: dict[str, dict] = {"n_rows": n, "cpus": cpus, "pairs": pairs}
    for label, _ in versions:
        bests = [r["sec"] for r in results[label]]
        summary[label] = {
            "bests_sec": bests,
            "median_best_sec": round(statistics.median(bests), 3),
            "min_best_sec": round(min(bests), 3),
            "median_rows_per_sec": round(n / statistics.median(bests), 1),
            "max_rows_per_sec": round(n / min(bests), 1),
        }
    (a, _), (b, _) = versions
    summary["ratio_median_a_over_b"] = round(
        summary[a]["median_best_sec"] / summary[b]["median_best_sec"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
