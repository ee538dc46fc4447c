"""Driver-contract queries over /root/testdata tables, with DuckDB oracles.

Each entry restates one operator family from SURVEY.md §2 over the driver's
TPC-H-ish testdata (events / documents / embeddings / lineitem) so the
driver's DuckDB comparison can certify it end-to-end:

- the geoip pipeline queries derive a deterministic synthetic IPv4 per event
  (pure integer arithmetic both sides), push it through the REAL broadcast-
  searchsorted kernel on the Spark side, and through an independent SQL range
  join on the DuckDB side;
- template / parse / aggregate / dedup / text-analysis queries pair a
  Spark-native plan with function-parity ANSI SQL.

Column names are aliased identically on both sides (driver hashes values
after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import GeoipConfig
from ..operators.enrich import SKIP_FLAG, GeoipEnricher
from ..operators.parse import ACCESS_LOG_RE
from ..sources.fixtures import world_db, world_rows

# ---------------------------------------------------------------------------
# shared: deterministic ip derivation + world-range SQL
# ---------------------------------------------------------------------------

_MIX = 2654435761  # Knuth multiplicative hash constant
_M32 = 1 << 32


def world_ranges_values_sql(alias: str = "r") -> str:
    vals = ",\n  ".join(
        f"({r['range_start']}, {r['range_end']}, '{r['country.iso_code']}', "
        f"'{r['city.names.en']}', CAST({r['location.latitude']} AS DOUBLE), "
        f"CAST({r['location.longitude']} AS DOUBLE))"
        for r in world_rows())
    return (f"(VALUES\n  {vals}) AS {alias}"
            "(range_start, range_end, country, city, latitude, longitude)")


def _ip_int_expr(col: str):
    return (F.col(col) * F.lit(_MIX)) % F.lit(_M32)


def _ip_str(ip_int):
    return F.concat_ws(
        ".",
        F.shiftright(ip_int, 24) % 256, F.shiftright(ip_int, 16) % 256,
        F.shiftright(ip_int, 8) % 256, ip_int % 256)


def _ip_int_sql(col: str) -> str:
    return f"(({col} * {_MIX}) % {_M32})"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _with_ip(df: DataFrame) -> DataFrame:
    return df.withColumn("ip", _ip_str(_ip_int_expr("event_id")))


def _enricher(spark: SparkSession, records: dict[str, str],
              lookup_keys: list[str] | None = None, **kw) -> GeoipEnricher:
    cfg = GeoipConfig(lookup_keys=lookup_keys or ["ip"], records=records, **kw)
    return GeoipEnricher(spark, cfg, world_db())


# ---------------------------------------------------------------------------
# J1 + A1: enrich → per-country rollup
# ---------------------------------------------------------------------------

def q_geoip_enrich_country_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_ip(_events(spark, sf_dir))
    enr = _enricher(spark, {"country": "${country.iso_code['ip']}"})
    out = enr.transform(df)
    return (out.groupBy(F.coalesce(F.col("country"), F.lit("__miss__")).alias("country"))
            .agg(F.count("*").alias("n")))


ORACLE_ENRICH_COUNTRY = f"""
SELECT coalesce(r.country, '__miss__') AS country, CAST(count(*) AS BIGINT) AS n
FROM (SELECT {_ip_int_sql('event_id')} AS ip_int FROM events) e
LEFT JOIN {world_ranges_values_sql()}
  ON e.ip_int BETWEEN r.range_start AND r.range_end
GROUP BY 1
"""


# J1 value-level: mode-1 typed city + lat/lon, mode-3 concat
def q_geoip_enrich_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_ip(_events(spark, sf_dir))
    enr = _enricher(spark, {
        "city": "${city.names.en['ip']}",
        "latitude": "${location.latitude['ip']}",
        "latlon": "${location.latitude['ip']},${location.longitude['ip']}",
    })
    return enr.transform(df).select("event_id", "city", "latitude", "latlon")


ORACLE_ENRICH_VALUES = f"""
SELECT e.event_id, r.city AS city, r.latitude AS latitude,
       concat(coalesce(CAST(r.latitude AS VARCHAR), ''), ',',
              coalesce(CAST(r.longitude AS VARCHAR), '')) AS latlon
FROM (SELECT event_id, {_ip_int_sql('event_id')} AS ip_int FROM events) e
LEFT JOIN {world_ranges_values_sql()}
  ON e.ip_int BETWEEN r.range_start AND r.range_end
"""


# J2: multi-key lookup → origin/dest country matrix
def q_geoip_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (_events(spark, sf_dir)
          .withColumn("ip_origin", _ip_str(_ip_int_expr("event_id")))
          .withColumn("ip_dest", _ip_str((F.col("user_id") * F.lit(_MIX) + F.lit(12345)) % F.lit(_M32))))
    enr = _enricher(spark, {
        "origin_country": "${country.iso_code['ip_origin']}",
        "dest_country": "${country.iso_code['ip_dest']}",
    }, lookup_keys=["ip_origin", "ip_dest"])
    out = enr.transform(df)
    return (out.groupBy(
        F.coalesce(F.col("origin_country"), F.lit("__miss__")).alias("origin_country"),
        F.coalesce(F.col("dest_country"), F.lit("__miss__")).alias("dest_country"))
        .agg(F.count("*").alias("n")))


ORACLE_MULTI_KEY = f"""
SELECT coalesce(ro.country, '__miss__') AS origin_country,
       coalesce(rd.country, '__miss__') AS dest_country,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT {_ip_int_sql('event_id')} AS ip_o,
             ((user_id * {_MIX} + 12345) % {_M32}) AS ip_d FROM events) e
LEFT JOIN {world_ranges_values_sql('ro')} ON e.ip_o BETWEEN ro.range_start AND ro.range_end
LEFT JOIN {world_ranges_values_sql('rd')} ON e.ip_d BETWEEN rd.range_start AND rd.range_end
GROUP BY 1, 2
"""


# S4 + A1: route key fan-out counts (per-sink equality restated)
def q_geoip_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_ip(_events(spark, sf_dir))
    enr = _enricher(spark, {"country": "${country.iso_code['ip']}"})
    out = enr.transform(df).withColumn(
        "route_country", F.coalesce(F.col("country"), F.lit("__unrouted__")))
    return (out.groupBy("route_country", "event_type")
            .agg(F.count("*").alias("rows")))


ORACLE_ROUTE_COUNTS = f"""
SELECT coalesce(r.country, '__unrouted__') AS route_country, e.event_type,
       CAST(count(*) AS BIGINT) AS rows
FROM (SELECT event_type, {_ip_int_sql('event_id')} AS ip_int FROM events) e
LEFT JOIN {world_ranges_values_sql()}
  ON e.ip_int BETWEEN r.range_start AND r.range_end
GROUP BY 1, 2
"""


# P3: skip_adding_null_record
def q_geoip_skip_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_ip(_events(spark, sf_dir))
    enr = _enricher(spark, {"city": "${city.names.en['ip']}"},
                    skip_adding_null_record=True)
    out = enr.transform(df)
    return out.groupBy(F.col(SKIP_FLAG).alias("skipped")).agg(F.count("*").alias("n"))


ORACLE_SKIP_NULL = f"""
SELECT (r.city IS NULL) AS skipped, CAST(count(*) AS BIGINT) AS n
FROM (SELECT {_ip_int_sql('event_id')} AS ip_int FROM events) e
LEFT JOIN {world_ranges_values_sql()}
  ON e.ip_int BETWEEN r.range_start AND r.range_end
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# P5: access-log grok parse (build line deterministically, grok it back)
# ---------------------------------------------------------------------------

def q_parse_access_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_ip(_events(spark, sf_dir))
    line = F.concat(
        F.col("ip"), F.lit(' - - [01/Jan/2024:00:00:00 +0000] "GET /p/'),
        F.col("event_id").cast("string"), F.lit(' HTTP/1.1" 200 '),
        F.col("user_id").cast("string"))
    df = df.withColumn("line", line)
    return df.select(
        "event_id",
        F.regexp_extract("line", ACCESS_LOG_RE, 1).alias("client_ip"),
        F.regexp_extract("line", ACCESS_LOG_RE, 5).alias("method"),
        F.regexp_extract("line", ACCESS_LOG_RE, 6).alias("path"),
        F.regexp_extract("line", ACCESS_LOG_RE, 8).cast("int").alias("status"),
        F.regexp_extract("line", ACCESS_LOG_RE, 9).cast("long").alias("bytes"),
    )


_IP_SQL = (
    f"concat(CAST(({_ip_int_sql('event_id')} // 16777216) % 256 AS VARCHAR), '.', "
    f"CAST(({_ip_int_sql('event_id')} // 65536) % 256 AS VARCHAR), '.', "
    f"CAST(({_ip_int_sql('event_id')} // 256) % 256 AS VARCHAR), '.', "
    f"CAST({_ip_int_sql('event_id')} % 256 AS VARCHAR))"
)

ORACLE_PARSE_ACCESS_LOG = f"""
WITH lines AS (
  SELECT event_id,
         concat({_IP_SQL}, ' - - [01/Jan/2024:00:00:00 +0000] "GET /p/',
                CAST(event_id AS VARCHAR), ' HTTP/1.1" 200 ',
                CAST(user_id AS VARCHAR)) AS line
  FROM events)
SELECT event_id,
       regexp_extract(line, '^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]*)" (\\d{{3}}) (\\S+)', 1) AS client_ip,
       regexp_extract(line, '^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]*)" (\\d{{3}}) (\\S+)', 5) AS method,
       regexp_extract(line, '^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]*)" (\\d{{3}}) (\\S+)', 6) AS path,
       CAST(regexp_extract(line, '^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]*)" (\\d{{3}}) (\\S+)', 8) AS INT) AS status,
       CAST(regexp_extract(line, '^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]*)" (\\d{{3}}) (\\S+)', 9) AS BIGINT) AS bytes
FROM lines
"""


# P1/P2: JSON props projection
def q_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (df.select(F.pmod(k, F.lit(7)).alias("k_bucket"))
            .groupBy("k_bucket").agg(F.count("*").alias("n")))


ORACLE_JSON_PROPS = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 7 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


# A1 generic: TPC-H Q1-style pricing summary
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 # exact integer cents → summation-order-insensitive (double
                 # sums of non-representable decimals differ in the last ulp
                 # between engines)
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                  .alias("sum_base_price_cents"),
                 F.count("*").alias("count_order")))


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_price_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


QUERIES = {
    "geoip_enrich_country_counts": q_geoip_enrich_country_counts,
    "geoip_enrich_values": q_geoip_enrich_values,
    "geoip_multi_key": q_geoip_multi_key,
    "geoip_route_counts": q_geoip_route_counts,
    "geoip_skip_null": q_geoip_skip_null,
    "parse_access_log": q_parse_access_log,
    "json_props_rollup": q_json_props_rollup,
    "agg_pricing_summary": q_agg_pricing_summary,
}

ORACLES = {
    "geoip_enrich_country_counts": ORACLE_ENRICH_COUNTRY,
    "geoip_enrich_values": ORACLE_ENRICH_VALUES,
    "geoip_multi_key": ORACLE_MULTI_KEY,
    "geoip_route_counts": ORACLE_ROUTE_COUNTS,
    "geoip_skip_null": ORACLE_SKIP_NULL,
    "parse_access_log": ORACLE_PARSE_ACCESS_LOG,
    "json_props_rollup": ORACLE_JSON_PROPS,
    "agg_pricing_summary": ORACLE_PRICING,
}
