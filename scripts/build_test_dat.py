"""Generate the committed legacy .dat test fixture from the golden rows.

Writes tests/fixtures/geolite-city-test.dat: the _LEGACY_COMMON golden
ranges (the reference suite's legacy-backend expected values,
/root/reference/test/plugin/test_filter_geoip.rb:986-1060, incl. the
single-precision 37.4192008972168 coordinates) as a real legacy-format
GeoIP city database (CITY_EDITION_REV1), built by the from-scratch writer
in fluent_plugin_geoip_spark.sources.dat.

Run: python scripts/build_test_dat.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fluent_plugin_geoip_spark.sources.dat import CITY_EDITION_REV1, build_dat
from fluent_plugin_geoip_spark.sources.fixtures import _LEGACY_COMMON
from scripts.build_test_mmdb import range_to_cidr

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "geolite-city-test.dat")

# attrs the legacy file format carries (region_name exists only in the
# gem-side FIPS name table, never in the .dat record)
_DAT_KEYS = ("country_code", "region", "city", "postal_code",
             "latitude", "longitude", "dma_code", "area_code")


def main() -> None:
    networks = []
    for row in _LEGACY_COMMON:
        attrs = {k: row[k] for k in _DAT_KEYS if row.get(k) is not None}
        networks.append(
            (range_to_cidr(row["range_start"], row["range_end"]), attrs))
    blob = build_dat(networks, edition=CITY_EDITION_REV1)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(blob)
    print(f"wrote {OUT} ({len(blob)} bytes, {len(networks)} networks)")


if __name__ == "__main__":
    main()
