"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship parse→enrich→route→aggregate rollup at sf0.001;
``queries``/``oracle_sql`` expose one entry per implemented operator family
from SURVEY.md §2 (plus the training-data operators), each paired with an
independent DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fluent_plugin_geoip_spark.plans import testdata_queries as tq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tq.q_geoip_route_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(tq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(tq.ORACLES)
