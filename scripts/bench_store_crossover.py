#!/usr/bin/env python
"""Characterize the bucketed-vs-plain incremental-dedup store crossover
(round-6 VERDICT item 4): at sf0.1 the key-bucketed store costs ~+1 s per
probe vs the plain band-partitioned store (constant catalog + bucketed-scan
overhead), while at scale it wins because the plain path re-shuffles the
ENTIRE store on every probe. This measures where the lines cross ON THIS
BOX, so `incremental_minhash_dedup` can hint when a caller's store layout
looks wrong-sided (the hint threshold lives in
`operators/dedup.py:BUCKETED_STORE_CROSSOVER_BYTES`; results are recorded
in docs/SCALE.md).

Protocol (window-noise rules from BASELINE.md apply):

- ONE session (local[CPUS]); both paths interleaved per store size
  (plain, bucketed, plain, bucketed, ...) so they sample the same noise
  window; 1 warm-up + best-of-REPS each.
- Corpus texts are unique by construction (tokens are per-doc hashes), so
  the candidate set is ~empty and the timed work is exactly the probe
  join — the quantity whose scaling differs between the two layouts.
- The probed batch is fixed (BATCH docs) across all store sizes: the
  bucketed path's claim is that probe cost stops scaling with store size.

Usage: python scripts/bench_store_crossover.py [cpus] [reps] [sizes...]
Output: one JSON line per store size + a summary line with the crossover.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 2_000
BANDS, ROWS, NUM_HASHES, BUCKETS = 32, 4, 128, 16


def synth_docs(spark, n: int, offset: int = 0):
    """n docs with globally unique 30-token texts (tokens are hex hashes of
    (doc_id, position)) — no near-dups, so probe cost is isolated."""
    from pyspark.sql import functions as F
    return (spark.range(n)
            .select((F.col("id") + offset).alias("doc_id"))
            .withColumn("text", F.expr(
                "concat_ws(' ', transform(sequence(0, 29), j -> "
                "hex(xxhash64(concat(cast(doc_id as string), '-', "
                "cast(j as string))))))")))


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sizes = ([int(s) for s in sys.argv[3:]]
             or [5_000, 20_000, 80_000, 320_000, 1_280_000])

    from pyspark.sql import SparkSession

    from fluent_plugin_geoip_spark.operators.dedup import (
        incremental_minhash_dedup, write_signature_store,
    )

    work = tempfile.mkdtemp(prefix="crossover_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.ui.enabled", "false")
             .config("spark.local.dir", work + "/local")
             .config("spark.sql.parquet.compression.codec", "snappy")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    batch = synth_docs(spark, BATCH, offset=10_000_000).cache()
    batch.count()
    results = []
    try:
        for n in sizes:
            corpus = synth_docs(spark, n).cache()
            corpus.count()
            plain_dir = f"{work}/plain_{n}"
            bucket_dir = f"{work}/bucket_{n}"
            write_signature_store(corpus, plain_dir, bands=BANDS, rows=ROWS,
                                  num_hashes=NUM_HASHES)
            table = write_signature_store(
                corpus, bucket_dir, bands=BANDS, rows=ROWS,
                num_hashes=NUM_HASHES, bucket_by=BUCKETS,
                table=f"crossover_store_{n}")

            def probe(store_table):
                t0 = time.monotonic()
                incremental_minhash_dedup(
                    batch, corpus, plain_dir, bands=BANDS, rows=ROWS,
                    num_hashes=NUM_HASHES, threshold=0.8, exact_grams=True,
                    store_table=store_table).count()
                return time.monotonic() - t0

            for st in (None, table):        # warm both paths
                probe(st)
            plain, bucketed = [], []
            for _ in range(reps):           # interleaved: same window
                plain.append(probe(None))
                bucketed.append(probe(table))
            rec = {
                "docs": n,
                "store_rows": n * BANDS,
                "plain_store_bytes": dir_bytes(plain_dir),
                "bucketed_store_bytes": dir_bytes(bucket_dir),
                "plain_best_s": round(min(plain), 3),
                "bucketed_best_s": round(min(bucketed), 3),
                "plain_all": [round(t, 3) for t in plain],
                "bucketed_all": [round(t, 3) for t in bucketed],
                "bucketed_over_plain": round(min(bucketed) / min(plain), 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            corpus.unpersist()
            shutil.rmtree(plain_dir, ignore_errors=True)
            shutil.rmtree(bucket_dir, ignore_errors=True)

        cross = next((r for r in results if r["bucketed_best_s"]
                      < r["plain_best_s"]), None)
        print(json.dumps({
            "summary": "bucketed_store_crossover",
            "cpus": cpus, "reps": reps, "batch_docs": BATCH,
            "bands": BANDS, "buckets": BUCKETS,
            "crossover_docs": cross["docs"] if cross else None,
            "crossover_plain_store_bytes":
                cross["plain_store_bytes"] if cross else None,
        }), flush=True)
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
