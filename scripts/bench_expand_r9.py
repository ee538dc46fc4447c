#!/usr/bin/env python
"""Round-9 evidence for VERDICT item 2: expanded-table construction at
real-GeoLite2 scale (~3M v4 ranges, ~200k v6 ranges here) — the old
row-tuple ``createDataFrame`` vs the vectorized pyarrow path.

Times DRIVER-side construction + one count() materialization of the
local relation. Appends one JSON line to docs/expand_construction_r9.jsonl.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

from bench import make_spark  # noqa: E402
from fluent_plugin_geoip_spark.operators.geolookup import (  # noqa: E402
    GeoDatabase, _SPARK_TYPES, expanded_bucket_table, expanded_bucket_table_v6,
    sanitize_attr,
)
from pyspark.sql import types as T  # noqa: E402


def synth_db(n4=3_000_000, n6=200_000) -> GeoDatabase:
    rng = np.random.default_rng(7)
    # disjoint v4 ranges tiled over the space
    width = (1 << 32) // n4
    starts = (np.arange(n4, dtype=np.int64) * width)
    ends = starts + rng.integers(1, width, n4)
    attrs = {
        "country.iso_code": np.array(
            [f"C{i % 250:03d}" for i in range(n4)], dtype=object),
        "city.names.en": np.array(
            [f"City-{i % 100000}" for i in range(n4)], dtype=object),
        "location.latitude": rng.uniform(-90, 90, n4),
    }
    db = GeoDatabase(profile="geoip2_c", starts=starts, ends=ends,
                     attrs=attrs, dtypes={"location.latitude": "double"})
    # v6: /32-ish allocations under 2001::/16
    s6 = np.zeros((n6, 16), dtype=np.uint8)
    s6[:, 0] = 0x20; s6[:, 1] = 0x01
    s6[:, 2] = (np.arange(n6) >> 8) & 0xFF
    s6[:, 3] = np.arange(n6) & 0xFF
    e6 = s6.copy(); e6[:, 4:8] = 0xFF
    db.starts6 = np.frombuffer(s6.tobytes(), dtype="S16")
    db.ends6 = np.frombuffer(e6.tobytes(), dtype="S16")
    db.attrs6 = {"country.iso_code": attrs["country.iso_code"][:n6],
                 "location.latitude": attrs["location.latitude"][:n6]}
    return db


def old_expanded_bucket_table(spark, db, attr_paths, shift=16):
    """The round-8 row-tuple construction, verbatim (for the A/B)."""
    n = len(db.starts)
    b0 = (db.starts >> shift).astype(np.int64)
    b1 = (db.ends >> shift).astype(np.int64)
    counts = (b1 - b0 + 1) if n else np.zeros(0, dtype=np.int64)
    idx = np.repeat(np.arange(n), counts)
    offs = np.arange(len(idx)) - np.repeat(np.cumsum(counts) - counts, counts)
    buckets = (b0[idx] + offs).tolist()

    def attr_values(p):
        arr = db.attrs.get(p)
        if arr is None:
            return [None] * len(idx)
        return [None if v is None or (isinstance(v, float) and np.isnan(v))
                else (v.item() if isinstance(v, np.generic) else v)
                for v in arr[idx]]

    schema = T.StructType(
        [T.StructField("__gb", T.LongType(), False),
         T.StructField("__gs", T.LongType(), False),
         T.StructField("__ge", T.LongType(), False)]
        + [T.StructField(sanitize_attr(p), _SPARK_TYPES[db.attr_type(p)], True)
           for p in attr_paths])
    rows = list(zip(buckets, db.starts[idx].tolist(), db.ends[idx].tolist(),
                    *[attr_values(p) for p in attr_paths]))
    return spark.createDataFrame(rows, schema=schema)


def main():
    spark = make_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    db = synth_db()
    attrs = ["country.iso_code", "city.names.en", "location.latitude"]
    out = {"n4": len(db.starts), "n6": len(db.starts6)}

    t0 = time.perf_counter()
    df_new = expanded_bucket_table(spark, db, attrs)
    out["v4_new_construct_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["v4_rows"] = df_new.count()
    out["v4_new_count_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    df6, bits = expanded_bucket_table_v6(spark, db, attrs)
    out["v6_new_construct_s"] = round(time.perf_counter() - t0, 3)
    out["v6_prefix_bits"] = bits
    t0 = time.perf_counter()
    out["v6_rows"] = df6.count()
    out["v6_new_count_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    df_old = old_expanded_bucket_table(spark, db, attrs)
    out["v4_old_construct_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df_old.count()
    out["v4_old_count_s"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out))
    with open("/root/repo/docs/expand_construction_r9.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
