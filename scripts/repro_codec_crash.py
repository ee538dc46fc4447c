#!/usr/bin/env python
"""Codec crash-rate repro loop (round-5 gate for the zstd session default).

Round 4 observed 2/3 zstd scaling children dying with a Python-worker
"Connection reset" during the enrich Arrow read, vs 0/10 snappy levels —
a correlation that blocks shipping zstd as the session default until the
crash rate is bounded. This loop runs N alternating zstd/snappy children
in the exact failing configuration (4 pinned cores, 20M-row full
parse→enrich→route job, multiple full reps per child) and reports crash
counts per codec.

Usage: python scripts/repro_codec_crash.py [children_per_codec] [n_rows] [reps]
(defaults 6, 20_000_000, 2). Prints one JSON line per child as it finishes
plus a final summary line; append stdout to docs/codec_repro_r5.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time, json, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from fluent_plugin_geoip_spark.plans.pipeline import GeoipPipeline
from fluent_plugin_geoip_spark.sources.pages import generate_pages

cpus, n, reps, workdir, codec = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4], sys.argv[5])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.ui.enabled", "false")
         .config("spark.local.dir", workdir + "/local")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.parquet.compression.codec", codec)
         .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pipe = GeoipPipeline(spark)
pages = generate_pages(spark, n, partitions=cpus * 4)
times = []
for i in range(reps):
    t0 = time.perf_counter()
    pipe.run(pages, out_dir=f"{{workdir}}/r{{i}}", collect_metrics=False)
    times.append(round(time.perf_counter() - t0, 2))
    shutil.rmtree(f"{{workdir}}/r{{i}}", ignore_errors=True)
print(json.dumps({{"reps": times}}))
"""


def run_child(cpus: int, n: int, reps: int, codec: str) -> dict:
    workdir = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        prefix=f"geoip_repro_{codec}_")
    t0 = time.time()
    try:
        cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
               _CHILD.format(repo=REPO), str(cpus), str(n), str(reps),
               workdir, codec]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600)
        lines = out.stdout.strip().splitlines()
        rec = {"codec": codec, "rc": out.returncode,
               "wall_sec": round(time.time() - t0, 1)}
        if out.returncode == 0 and lines:
            rec.update(json.loads(lines[-1]))
        else:
            rec["stderr_tail"] = out.stderr[-1500:]
        return rec
    except subprocess.TimeoutExpired:
        return {"codec": codec, "rc": "timeout",
                "wall_sec": round(time.time() - t0, 1)}
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    per_codec = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    crashes = {"zstd": 0, "snappy": 0}
    for i in range(per_codec):
        for codec in ("zstd", "snappy"):
            rec = run_child(4, n, reps, codec)
            rec["child"] = i
            if rec["rc"] != 0:
                crashes[codec] += 1
            print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": True, "children_per_codec": per_codec,
                      "reps_per_child": reps, "rows": n,
                      "crashes": crashes}), flush=True)


if __name__ == "__main__":
    main()
