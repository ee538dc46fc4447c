"""Generate the committed .mmdb test fixture from the golden range rows.

Writes tests/fixtures/geolite2-city-test.mmdb: the GEOIP2_CITY_ROWS golden
ranges (the reference suite's expected values,
/root/reference/test/plugin/test_filter_geoip.rb) as a real MaxMind-format
database in the GeoLite2 layout (ip_version=6, record_size=28), built by the
from-scratch writer in fluent_plugin_geoip_spark.sources.mmdb.

Run: python scripts/build_test_mmdb.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fluent_plugin_geoip_spark.sources.fixtures import GEOIP2_CITY_ROWS
from fluent_plugin_geoip_spark.sources.mmdb import build_mmdb
from fluent_plugin_geoip_spark.sources.mmdb import unflatten_doc

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "geolite2-city-test.mmdb")
OUT_V6 = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                      "geolite2-city-v6-test.mmdb")

# Native-IPv6 networks for the v6 fixture (alongside the golden v4 ranges):
# a full city doc, and a country-only doc (lat absent → the reference's
# 0.0-on-hit default applies to ${location.latitude}).
V6_EXTRA_NETS = [
    ("2001:db8::/32", {"city": {"names": {"en": "V6 City"}},
                       "country": {"iso_code": "V6"},
                       "location": {"latitude": -5.5}}),
    ("2400:cb00::/32", {"country": {"iso_code": "AU"}}),
]


def range_to_cidr(start: int, end: int) -> str:
    width = end - start + 1
    assert width & (width - 1) == 0, "range width must be a power of two"
    plen = 32 - width.bit_length() + 1
    assert start % width == 0, "range must be CIDR-aligned"
    return (f"{start >> 24 & 255}.{start >> 16 & 255}."
            f"{start >> 8 & 255}.{start & 255}/{plen}")


def main() -> None:
    networks = []
    for row in GEOIP2_CITY_ROWS:
        flat = {k: v for k, v in row.items()
                if k not in ("range_start", "range_end")}
        cidr = range_to_cidr(row["range_start"], row["range_end"])
        networks.append((cidr, unflatten_doc(flat)))
    blob = build_mmdb(networks, database_type="GeoLite2-City-Test",
                      ip_version=6, record_size=28)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(blob)
    print(f"wrote {OUT} ({len(blob)} bytes, {len(networks)} networks)")

    nets6 = networks + V6_EXTRA_NETS
    blob6 = build_mmdb(nets6, database_type="GeoLite2-City-V6-Test",
                       ip_version=6, record_size=28)
    with open(OUT_V6, "wb") as f:
        f.write(blob6)
    print(f"wrote {OUT_V6} ({len(blob6)} bytes, {len(nets6)} networks)")


if __name__ == "__main__":
    main()
