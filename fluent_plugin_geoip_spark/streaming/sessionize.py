"""Custom stateful streaming operator: per-client sessionization.

The reference filter is stateless (SURVEY.md §2.7), but a log pipeline at
scale wants session rollups (visits per client_ip with an inactivity gap).
Two implementations, batch and streaming, with identical semantics for
in-order arrivals (cross-batch late events are absorbed into the open
session rather than re-opening closed ones — see ``make_session_fn``):

- batch: the classic lag/cumsum window formulation (pure Catalyst)
- streaming: ``applyInPandasWithState`` keeping an open session per client
  key with a processing-time timeout — the custom-stateful-operator pattern
  (GroupState), emitting a session row when the gap closes it

State per key is O(1) (last timestamp + counters) so executor state stores
stay small no matter how many events a key sees; keys partition the state
across executors.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("client_ip", T.StringType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_ts", T.DoubleType()),
    T.StructField("last_ts", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])


def sessionize_batch(df: DataFrame, ts_col: str = "warc_ts",
                     key_col: str = "client_ip",
                     gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: gap > threshold starts a new session
    (lag + conditional cumsum window)."""
    gap = gap_minutes * 60
    w = Window.partitionBy(key_col).orderBy(ts_col)
    marked = (df
              .withColumn("__prev", F.lag(ts_col).over(w))
              .withColumn("__new", (F.col("__prev").isNull() |
                                    (F.unix_timestamp(F.col(ts_col)) -
                                     F.unix_timestamp(F.col("__prev")) > gap))
                          .cast("int"))
              .withColumn("__sid", F.sum("__new").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    return (marked.groupBy(key_col, "__sid")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"))
            .drop("__sid"))


def make_session_fn(gap_minutes: int = 30):
    gap = gap_minutes * 60.0

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (client_ip,) = key
        if state.hasTimedOut:
            if state.exists:
                start_ts, last_ts, n = state.get
                state.remove()
                yield pd.DataFrame({
                    "client_ip": [client_ip],
                    "session_start": [pd.Timestamp(start_ts, unit="s")],
                    "session_end": [pd.Timestamp(last_ts, unit="s")],
                    "n_events": [n],
                })
            return
        ts: list[float] = []
        for pdf in pdfs:
            ts.extend(pdf["ts_sec"].tolist())
        ts.sort()
        if not ts:
            return
        if state.exists:
            start_ts, last_ts, n = state.get
        else:
            start_ts, last_ts, n = ts[0], ts[0], 0
        closed = []
        for t in ts:
            if t <= last_ts:
                # cross-batch late/duplicate event: absorb into the open
                # session without moving last_ts backwards (a regressed
                # last_ts would spuriously split on the next event and emit
                # a wrong session_end). Approximation vs batch semantics:
                # a late event older than the open session's start extends
                # it backwards instead of reopening a closed session.
                start_ts = min(start_ts, t)
                n += 1
                continue
            if t - last_ts > gap:
                closed.append((start_ts, last_ts, n))
                start_ts, n = t, 0
            last_ts = t
            n += 1
        state.update((start_ts, last_ts, n))
        state.setTimeoutDuration(int(gap * 1000))
        if closed:
            yield pd.DataFrame({
                "client_ip": [client_ip] * len(closed),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
                "n_events": [n_ for _, _, n_ in closed],
            })

    return fn


def sessionize_stream(events: DataFrame, ts_col: str = "warc_ts",
                      key_col: str = "client_ip",
                      gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization with ``applyInPandasWithState``: one open
    session kept per client key; closed sessions emit immediately, idle
    sessions flush on processing-time timeout."""
    prepared = events.select(
        F.col(key_col).alias("client_ip"),
        F.unix_timestamp(F.col(ts_col)).cast("double").alias("ts_sec"))
    return (prepared.groupBy("client_ip")
            .applyInPandasWithState(
                make_session_fn(gap_minutes),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
