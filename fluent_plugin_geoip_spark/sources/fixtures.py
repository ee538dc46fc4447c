"""Synthetic lookup databases reproducing the reference's golden values.

The reference bundles real MaxMind DBs (absent here,
/root/reference/.MISSING_LARGE_BLOBS:1-2); its tests assert exact outputs for
a handful of IPs (/root/reference/test/plugin/test_filter_geoip.rb). These
tables embed exactly those golden rows, so every reference test scenario can
be re-run against our engine with the reference's expected values.

Also provides the deterministic "world" range table used by the scale
generator and the DuckDB oracles, plus a seeded ASN table (no reference
goldens — self-consistency tested, FIXTURES.md §4).
"""

from __future__ import annotations

from ..operators.geolookup import GeoDatabase


def ip_u32(a: int, b: int, c: int, d: int) -> int:
    return (a << 24) | (b << 16) | (c << 8) | d


# ---------------------------------------------------------------------------
# GeoIP2 (geoip2_c) profile — nested attr dot-paths
# golden values: reference test:283-291 (Mountain View), :179-186 (8.8.8.8),
# :343-349 (Tokorozawa), :456-480 (empty-attr hit → lat/lon 0.0 default)
# ---------------------------------------------------------------------------

GEOIP2_CITY_ROWS: list[dict] = [
    {
        "range_start": ip_u32(66, 102, 0, 0), "range_end": ip_u32(66, 102, 15, 255),
        "city.names.en": "Mountain View",
        "country.iso_code": "US", "country.names.en": "United States",
        "location.latitude": 37.419200000000004, "location.longitude": -122.0574,
        "postal.code": "94043",
        "subdivisions.0.iso_code": "CA", "subdivisions.0.names.en": "California",
    },
    {
        "range_start": ip_u32(8, 8, 8, 0), "range_end": ip_u32(8, 8, 8, 255),
        "country.iso_code": "US", "country.names.en": "United States",
    },
    {
        "range_start": ip_u32(125, 54, 15, 0), "range_end": ip_u32(125, 54, 15, 255),
        "city.names.en": "Tokorozawa",
        "country.iso_code": "JP", "country.names.en": "Japan",
    },
    # hit with every attr nil → exercises the lat/lon 0.0 default
    # (mocked `lookup → {}` in the reference, test:33-40, 456-480)
    {
        "range_start": ip_u32(180, 94, 85, 0), "range_end": ip_u32(180, 94, 85, 255),
    },
    # deliberately NOT covered: 203.0.113.1 (RFC5737), '0', '' → misses
]


def geoip2_city_db() -> GeoDatabase:
    return GeoDatabase.from_rows(GEOIP2_CITY_ROWS, profile="geoip2_c")


# ---------------------------------------------------------------------------
# Legacy (geoip) / geoip2_compat profiles — flat attrs, legacy float precision
# golden values: reference test:1024-1027, 1124-1131 (legacy floats), :943,
# :972-973 (Tokorozawa), :524-542 (compat country_code)
# ---------------------------------------------------------------------------

_LEGACY_COMMON = [
    {
        "range_start": ip_u32(66, 102, 0, 0), "range_end": ip_u32(66, 102, 15, 255),
        "city": "Mountain View", "country_code": "US", "country_code3": "USA",
        "country_name": "United States",
        "latitude": 37.4192008972168, "longitude": -122.05740356445312,
        "postal_code": "94043", "region": "CA", "region_name": "California",
        "dma_code": 807, "area_code": 650,
    },
    {
        "range_start": ip_u32(8, 8, 8, 0), "range_end": ip_u32(8, 8, 8, 255),
        "country_code": "US", "country_code3": "USA", "country_name": "United States",
    },
    {
        "range_start": ip_u32(125, 54, 15, 0), "range_end": ip_u32(125, 54, 15, 255),
        "city": "Tokorozawa", "country_code": "JP", "country_code3": "JPN",
        "country_name": "Japan",
    },
    {"range_start": ip_u32(180, 94, 85, 0), "range_end": ip_u32(180, 94, 85, 255)},
]


def geoip_legacy_db() -> GeoDatabase:
    rows = [{k: v for k, v in r.items()} for r in _LEGACY_COMMON]
    return GeoDatabase.from_rows(rows, profile="geoip")


def geoip2_compat_db() -> GeoDatabase:
    """geoip2_compat reads the GeoLite2 mmdb → GeoIP2 float precision
    (37.419200000000004, reference test:623-627), unlike the legacy ``geoip``
    backend's GeoCityLite floats (37.4192008972168, test:1024-1027)."""
    compat_keys = {"range_start", "range_end", "city", "country_code",
                   "country_name", "latitude", "longitude", "postal_code",
                   "region", "region_name"}
    rows = [{k: v for k, v in r.items() if k in compat_keys} for r in _LEGACY_COMMON]
    for r in rows:
        if r.get("latitude") is not None:
            r["latitude"] = 37.419200000000004
            r["longitude"] = -122.0574
    return GeoDatabase.from_rows(rows, profile="geoip2_compat")


# ---------------------------------------------------------------------------
# "World" table — deterministic synthetic coverage of the IPv4 space for the
# scale generator, the routed-fan-out fixtures and the DuckDB oracles.
# 48 ranges × 2^25 addresses in the low half of the space; Zipf-ish country
# mix (US/CN hotspots per BASELINE.json:6 skew note); the upper half of the
# space is deliberately uncovered so a fixed share of lookups miss.
# ---------------------------------------------------------------------------

WORLD_COUNTRIES = [
    # (iso, name, lang, lat, lon) — repetition count below sets the skew
    ("US", "United States", "en", 37.751, -97.822),
    ("CN", "China", "zh", 34.7732, 113.722),
    ("JP", "Japan", "ja", 35.69, 139.69),
    ("DE", "Germany", "de", 51.299, 9.491),
    ("FR", "France", "fr", 46.621, 2.4559),
    ("BR", "Brazil", "pt", -22.8305, -43.2192),
    ("IN", "India", "hi", 21.9974, 79.0011),
    ("RU", "Russia", "ru", 55.7386, 37.6068),
    ("GB", "United Kingdom", "en", 51.4964, -0.1224),
    ("KR", "South Korea", "ko", 37.5112, 126.9741),
    ("ES", "Spain", "es", 40.4172, -3.684),
    ("NL", "Netherlands", "nl", 52.3824, 4.8995),
]

# Zipf-ish assignment of the 48 world ranges to countries (US=12, CN=8, ...).
_WORLD_SKEW = [0] * 12 + [1] * 8 + [2] * 6 + [3] * 5 + [4] * 4 + [5] * 3 \
    + [6] * 3 + [7] * 2 + [8] * 2 + [9] + [10] + [11]
WORLD_RANGE_WIDTH = 1 << 25


def world_rows() -> list[dict]:
    rows = []
    for i, ci in enumerate(_WORLD_SKEW):
        iso, name, _lang, lat, lon = WORLD_COUNTRIES[ci]
        start = i * WORLD_RANGE_WIDTH
        rows.append({
            "range_start": start,
            "range_end": start + WORLD_RANGE_WIDTH - 1,
            "city.names.en": f"City-{iso}-{i}",
            "country.iso_code": iso,
            "country.names.en": name,
            "location.latitude": lat,
            "location.longitude": lon,
        })
    return rows


def world_db() -> GeoDatabase:
    return GeoDatabase.from_rows(world_rows(), profile="geoip2_c")


def world_country_lang() -> dict[str, str]:
    return {iso: lang for iso, _n, lang, _a, _b in WORLD_COUNTRIES}


def world_compat_db() -> GeoDatabase:
    """Same world ranges exposed through the flat geoip2_compat attr profile
    (GEOIP2_COMPAT_KEYS, filter_geoip.rb:32) — exercises the whitelisted
    backend path against the same oracle table."""
    rows = []
    for r in world_rows():
        rows.append({
            "range_start": r["range_start"], "range_end": r["range_end"],
            "city": r["city.names.en"],
            "country_code": r["country.iso_code"],
            "country_name": r["country.names.en"],
            "latitude": r["location.latitude"],
            "longitude": r["location.longitude"],
        })
    return GeoDatabase.from_rows(rows, profile="geoip2_compat")


# ---------------------------------------------------------------------------
# ASN table (FIXTURES.md §4) — seeded synthetic, self-consistency tested
# ---------------------------------------------------------------------------

def asn_rows() -> list[dict]:
    rows = []
    for i in range(64):
        start = i * (1 << 24)
        rows.append({
            "range_start": start,
            "range_end": start + (1 << 24) - 1,
            "asn": 64500 + (i * 7919) % 997,
            "as_org": f"AS-ORG-{(i * 31) % 17}",
        })
    return rows


def asn_db() -> GeoDatabase:
    return GeoDatabase.from_rows(
        asn_rows(), profile="geoip2_c", dtypes={"asn": "long", "as_org": "string"})
