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
- parquet codec zstd (measured A/B at 16 cores / 5M rows on tmpfs:
  snappy 11.96 s / 706 MB, zstd 12.07 s / 444 MB, lz4 11.29 s / 687 MB,
  uncompressed 15.37 s / 2546 MB — zstd matches snappy's wall-clock while
  writing 37% fewer bytes, and the uncompressed row shows the write path
  IS bandwidth-sensitive; at cluster scale fewer sink bytes is strictly
  better for storage, network and the shared-bus contention the scaling
  sweeps surfaced)
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(master: str | None = None, cores: int | None = None,
                  app_name: str = "fluent_plugin_geoip_spark",
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
         .config("spark.sql.parquet.compression.codec", "zstd")
         .config("spark.sql.session.timeZone", "UTC"))
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
