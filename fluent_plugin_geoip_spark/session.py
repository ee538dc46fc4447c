"""Recommended SparkSession configuration for this engine.

These are the knobs that measurably matter for the pipeline (derived from
the benchmarks in BASELINE.md, not guessed):

- AQE on (runtime re-plan; skew-join handling for the routing shuffle)
- shuffle partitions ≈ total cores (the fan-out repartition is the only
  pre-sink shuffle; 200 default over-parallelizes small runs and
  under-parallelizes big ones)
- Arrow batch 64k (default 10k pays the JVM↔Python crossing 6× as often
  for the searchsorted kernel at identical memory footprint)
- dynamic partition overwrite (idempotent per-partition routing writes)
- parquet codec snappy (default). zstd writes 37% fewer sink bytes at
  wall-clock parity (measured A/B at 16 cores / 5M rows on tmpfs: snappy
  11.96 s / 706 MB, zstd 12.07 s / 444 MB, uncompressed 15.37 s / 2546 MB)
  and is worth opting into per job — BUT across rounds 4-5 three zstd
  scaling-sweep children died with Python-worker "Connection reset" during
  the enrich Arrow read (3/14 zstd sweep children vs 0/13 snappy; a
  dedicated 12-child repro loop was clean on both, so the crash is rare
  and window-dependent, but codec-correlated). Per BASELINE.md's decision
  rule the session DEFAULT stays on the codec with zero observed crashes;
  pass ``codec="zstd"`` (or spark.sql.parquet.compression.codec) to opt
  in where worker stability has been verified.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(master: str | None = None, cores: int | None = None,
                  app_name: str = "fluent_plugin_geoip_spark",
                  codec: str = "snappy",
                  **extra: str) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    if cores:
        b = b.config("spark.sql.shuffle.partitions", str(cores))
    b = (b.config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
         .config("spark.sql.parquet.compression.codec", codec)
         .config("spark.sql.session.timeZone", "UTC"))
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
