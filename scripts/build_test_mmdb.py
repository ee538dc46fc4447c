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


if __name__ == "__main__":
    main()
