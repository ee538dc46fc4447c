"""Metadata injection (P4 in SURVEY.md §2.2) — the fluentd ``inject``
helper's Spark form.

The reference calls ``inject_values_to_record(tag, time, record)`` after
enrichment (/root/reference/lib/fluent/plugin/filter_geoip.rb:111), which —
per the inject section config (/root/reference/README.md:360-367) — can add
the event tag, event time and worker hostname under configurable keys.
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame, functions as F


def inject_metadata(
    df: DataFrame,
    tag: str | None = None,
    tag_key: str = "tag",
    time_col: str | None = None,
    time_key: str = "time",
    hostname_key: str | None = None,
    hostname: str | None = None,
    time_format: str | None = None,
) -> DataFrame:
    """Append tag / time / hostname columns (each optional).

    ``time_col`` names an existing event-time column to expose under
    ``time_key`` (fluentd carries event time alongside the record); when
    None and ``time_key`` requested via ``time_format``, processing time is
    used. ``hostname`` sets a configured literal (the deterministic form of
    fluentd's inject helper — one logical worker identity per job); when
    None, the driver's hostname is used (executors writing per-row
    hostnames would be non-deterministic noise).
    """
    out = df
    if tag is not None:
        out = out.withColumn(tag_key, F.lit(tag))
    if time_col is not None:
        c = F.col(time_col)
        if time_format:
            c = F.date_format(c, time_format)
        out = out.withColumn(time_key, c)
    if hostname_key is not None:
        out = out.withColumn(
            hostname_key,
            F.lit(hostname if hostname is not None else socket.gethostname()))
    return out
