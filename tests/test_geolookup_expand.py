"""Round-9 pins for the expanded-range-table construction (geolookup):

- the v6 adaptive prefix coarsening (round-8 VERDICT item 3): a
  pathological wide range must degrade ``prefix_bits`` instead of
  emitting an unbounded bucket expansion, the expansion bound must hold,
  and jvm/arrow value parity must survive the coarser buckets — probes
  inside, at both edges of, and outside the wide range;
- the shift floor (``>4``): a near-/0 range drives ``prefix_bits`` to
  the floor of 4 and lookups still work (a JVM shift count is mod 64,
  so prefix_bits=0 would silently break the bucket equi-key);
- the vectorized pyarrow construction (round-8 VERDICT item 2) yields
  the same rows as a hand-built expectation, including NaN → SQL null
  for double attrs (F7).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_plugin_geoip_spark.config import GeoipConfig
from fluent_plugin_geoip_spark.operators.enrich import GeoipEnricher
from fluent_plugin_geoip_spark.operators.geolookup import (
    GeoDatabase, expanded_bucket_table, expanded_bucket_table_v6,
)


def _v6_bytes(s: str) -> bytes:
    import socket
    return socket.inet_pton(socket.AF_INET6, s)


def _mk_db(ranges6: list[tuple[str, str, dict]]) -> GeoDatabase:
    """v4 golden row + explicit v6 ranges (16-byte bounds + attrs)."""
    db = GeoDatabase.from_rows([{
        "range_start": (66 << 24) | (102 << 16), "range_end": (66 << 24) | (102 << 16) | 0xFFFF,
        "city.names.en": "Mountain View", "location.latitude": 37.4192,
    }], profile="geoip2_c")
    ranges6 = sorted(ranges6, key=lambda r: _v6_bytes(r[0]))
    db.starts6 = np.array([_v6_bytes(s) for s, _, _ in ranges6], dtype="S16")
    db.ends6 = np.array([_v6_bytes(e) for _, e, _ in ranges6], dtype="S16")
    keys = sorted({k for _, _, a in ranges6 for k in a})
    for k in keys:
        dt = db.attr_type(k)
        vals = [a.get(k) for _, _, a in ranges6]
        if dt == "double":
            db.attrs6[k] = np.array(
                [np.nan if v is None else float(v) for v in vals])
        else:
            db.attrs6[k] = np.array(vals, dtype=object)
        db.dtypes.setdefault(k, dt)
    return db


WIDE = [
    # a /8-class range: hi spans 2^56 addresses → at /32 buckets that is
    # 2^24 emitted rows, far past 2n+65536 → the loop must coarsen
    ("2000::", "20ff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
     {"city.names.en": "Wide City", "location.latitude": -5.5}),
    # narrow /32 neighbours on both sides of the wide range
    ("1ffe::", "1ffe::ffff:ffff:ffff:ffff",
     {"city.names.en": "Low City", "location.latitude": 1.25}),
    ("2d00::", "2d00::ffff:ffff:ffff:ffff",
     {"city.names.en": "High City"}),  # latitude absent → nil → 0.0 (F7)
]


def test_v6_coarsening_bounds_expansion(spark):
    db = _mk_db(WIDE)
    df, bits = expanded_bucket_table_v6(spark, db, ["city.names.en"])
    # the /8-class range spans 2^(bits-8) buckets: 2^24 at /32, 2^20 at
    # /28 — both past 2n+65536 — and exactly 2^16 at /24, which fits
    assert bits == 24
    n_rows = df.count()
    assert n_rows <= 2 * len(db.starts6) + 65536
    # wide range: one row per /24 bucket it intersects; narrows: one each
    assert n_rows == (1 << 16) + 1 + 1


def test_v6_coarsening_full_space_and_floor(spark):
    db = _mk_db([("::", "efff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
                  {"city.names.en": "Everything"})])
    df, bits = expanded_bucket_table_v6(spark, db, ["city.names.en"])
    # a near-/0 range coarsens until the bound holds: 0xf000 buckets at
    # /16 is the first level under 2n+65536. (The adaptive loop can in
    # fact ALWAYS stop by /16: disjoint ranges give Σ(k_i−1) ≤ 2^bits,
    # so total ≤ n + 65536 ≤ 2n + 65536 — the >4 floor is a pure
    # defensive backstop, pinned below via the explicit-arg path.)
    assert bits == 16
    assert df.count() == 0xF000
    # explicit prefix_bits=4 (the floor): bucket math must stay correct —
    # the range spans hi prefixes 0x0..0xe at /4
    df4, bits4 = expanded_bucket_table_v6(
        spark, db, ["city.names.en"], prefix_bits=4)
    assert bits4 == 4
    assert df4.count() == 15


@pytest.mark.parametrize("probe", [
    "2000::",                                          # wide range start edge
    "2080:1234::99",                                   # wide range middle
    "20ff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",         # wide range end edge
    "2100::1",                                         # just past the end
    "1ffe::42",                                        # narrow low hit
    "1ffe:0:0:1::",                                    # past narrow low end
    "2d00::7",                                         # narrow high hit (lat nil)
    "66.102.3.80",                                     # v4 golden
    "::ffff:66.102.3.80",                              # v4-mapped
    "9999::1",                                         # clean miss
])
def test_v6_coarsened_jvm_matches_arrow(spark, probe):
    db = _mk_db(WIDE)
    cfg = GeoipConfig(lookup_keys=["ip"], records={
        "city": "${city.names.en['ip']}",
        "latitude": "${location.latitude['ip']}"})
    df = spark.createDataFrame([(probe,)], "ip string")
    cols = ["ip", "city", "latitude"]
    a = GeoipEnricher(spark, cfg, db, strategy="arrow") \
        .transform(df).select(cols).collect()
    j = GeoipEnricher(spark, cfg, db, strategy="jvm_join") \
        .transform(df).select(cols).collect()
    assert a == j, f"jvm/arrow divergence on {probe}: {a} vs {j}"


def test_v4_expansion_rows_match_reference(spark):
    """The pyarrow construction must emit exactly the rows the old
    row-tuple path emitted: same buckets, same bounds, NaN latitude →
    SQL null."""
    db = GeoDatabase.from_rows([
        {"range_start": 0x00010000, "range_end": 0x0003FFFF,  # spans 3 /16s
         "city.names.en": "A", "location.latitude": 1.5},
        {"range_start": 0x00050000, "range_end": 0x0005FFFF,
         "city.names.en": "B"},  # latitude absent → NaN in the attr array
    ], profile="geoip2_c")
    df = expanded_bucket_table(
        spark, db, ["city.names.en", "location.latitude"])
    rows = sorted([tuple(r) for r in df.collect()])
    assert rows == [
        (1, 0x00010000, 0x0003FFFF, "A", 1.5),
        (2, 0x00010000, 0x0003FFFF, "A", 1.5),
        (3, 0x00010000, 0x0003FFFF, "A", 1.5),
        (5, 0x00050000, 0x0005FFFF, "B", None),
    ]
