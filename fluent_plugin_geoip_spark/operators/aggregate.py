"""Aggregate + metrics stage (A1/A2 in SURVEY.md §2.4).

A1: per-country / per-lang rollups — plain Catalyst hash aggregates
(partial map-side combine + final), the correctness oracle of
BASELINE.json:2 ("per-sink count equality").

A2: accumulator metrics — the reference-era equivalent would be fluentd
counters; Spark-native form is ``DataFrame.observe`` (Arrow-safe, computed
inside the same job, no second pass and no accumulator double-counting on
task retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def country_lang_counts(df: DataFrame, country_col: str = "country") -> DataFrame:
    return (df.groupBy(F.coalesce(F.col(country_col), F.lit("__miss__")).alias("country"),
                       F.col("lang"))
              .agg(F.count("*").alias("n")))


def sink_counts(df: DataFrame, route_col: str = "route_country") -> DataFrame:
    return df.groupBy(route_col).agg(F.count("*").alias("rows"))


def observe_pipeline_metrics(df: DataFrame, country_col: str = "country",
                             ip_col: str = "client_ip") -> tuple[DataFrame, Observation]:
    """Attach rows_total / rows_parsed / rows_enriched / rows_missed counters.

    Metrics materialize when the returned DataFrame is consumed by an action;
    read them via ``observation.get``.
    """
    obs = Observation("geoip_pipeline")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.count(F.when(F.col(ip_col).rlike(r"^\d+\.\d+\.\d+\.\d+$"), 1))
         .alias("rows_parsed"),
        F.count(F.col(country_col)).alias("rows_enriched"),
        F.count(F.when(F.col(country_col).isNull(), 1)).alias("rows_missed"),
    )
    return observed, obs
