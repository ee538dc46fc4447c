"""Deterministic, scale-parametric generator for the input table of
Common-Crawl-style web pages (schema per BASELINE.json input_hint:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``).

Built entirely from native Spark expressions over ``spark.range`` — no Python
RNG, no driver-side loops — so the same generator that makes 1k pytest rows
makes 10^12 rows on a cluster: generation is a narrow map over a splittable
range source, embarrassingly parallel across executors.

Determinism: every column derives from ``xxhash64(id, <salt>)``; same ``n``
and ``seed`` → byte-identical table at any parallelism. The embedded
access-log line mirrors the tutorial flow the reference documents
(/root/reference/README.md:248-276: apache access log → geoip enrich) and its
``<ip>`` pool includes the reference's oracle addresses: covered hits, the
uncovered upper half of the IPv4 space, RFC5737 203.0.113.1, ``'0'`` and the
empty string (reference test:199-230).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .fixtures import WORLD_RANGE_WIDTH, world_rows

N_WORLD = 48          # ranges 0..47 of the world table
N_BUCKETS = 64        # 48 hits, 12 uncovered-space misses, 4 specials
TLDS = ["com", "net", "org", "io", "jp", "de", "fr", "cn"]
LANGS = ["en", "zh", "ja", "de", "fr", "pt", "hi", "ru", "ko", "es", "nl", "it"]
_BASE_TS = 1704067200  # 2024-01-01T00:00:00Z


def _mix(seed: int, salt: int):
    """Deterministic 63-bit non-negative mix of the row id."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))


def generate_pages(spark: SparkSession, n: int, seed: int = 42,
                   partitions: int | None = None) -> DataFrame:
    """Generate ``n`` pages. Columns: url, warc_ts, html, text, lang."""
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)

    bucket = _mix(seed, 1) % N_BUCKETS
    # world range index for hit rows; miss rows draw from the uncovered space
    starts = F.array(*[F.lit(r["range_start"]) for r in world_rows()])
    start = F.element_at(starts, (bucket % N_WORLD).cast("int") + 1)
    ip_int_hit = start + _mix(seed, 2) % WORLD_RANGE_WIDTH
    ip_int_miss = F.lit(N_WORLD * WORLD_RANGE_WIDTH) + \
        _mix(seed, 3) % F.lit((1 << 32) - N_WORLD * WORLD_RANGE_WIDTH)
    ip_int = F.when(bucket < N_WORLD, ip_int_hit).otherwise(ip_int_miss)
    ip_str = F.concat_ws(
        ".",
        F.shiftright(ip_int, 24) % 256,
        F.shiftright(ip_int, 16) % 256,
        F.shiftright(ip_int, 8) % 256,
        ip_int % 256,
    )
    # special addresses at fixed buckets (reference oracle pool)
    ip_str = (
        F.when(bucket == 60, F.lit(""))
        .when(bucket == 61, F.lit("0"))
        .when(bucket == 62, F.lit("203.0.113.1"))
        .when(bucket == 63, F.lit("not-an-ip"))
        .otherwise(ip_str)
    )

    warc_ts = F.timestamp_seconds(
        F.lit(_BASE_TS) + (F.col("id") % 86400) * 17 + _mix(seed, 4) % 3600)

    tld = F.element_at(F.array(*[F.lit(t) for t in TLDS]),
                       (_mix(seed, 5) % len(TLDS)).cast("int") + 1)
    host = F.concat(F.lit("www.site"), (_mix(seed, 6) % 10000).cast("string"),
                    F.lit("."), tld)
    path = F.concat(F.lit("p/"), F.col("id").cast("string"))
    url = F.concat(F.lit("http://"), host, F.lit("/"), path)

    status = F.element_at(F.array(*[F.lit(s) for s in [200, 200, 200, 200, 301, 404, 500]]),
                          (_mix(seed, 7) % 7).cast("int") + 1)
    nbytes = _mix(seed, 8) % 50000
    log_line = F.concat(
        ip_str, F.lit(" - - ["),
        F.date_format(warc_ts, "dd/MMM/yyyy:HH:mm:ss +0000"),
        F.lit('] "GET /'), path, F.lit(' HTTP/1.1" '),
        status.cast("string"), F.lit(" "), nbytes.cast("string"),
    )

    filler = F.concat(
        F.lit("crawl snapshot of "), host, F.lit(" page "),
        F.col("id").cast("string"), F.lit(" "),
        F.repeat(F.lit("lorem ipsum dolor sit amet "), (_mix(seed, 9) % 8).cast("int") + 1),
    )
    html = F.encode(
        F.concat(F.lit("<html><head><title>page "), F.col("id").cast("string"),
                 F.lit("</title></head><body><pre>"), log_line,
                 F.lit("</pre><p>"), filler, F.lit("</p></body></html>")),
        "UTF-8")

    lang = F.element_at(F.array(*[F.lit(l) for l in LANGS]),
                        (_mix(seed, 10) % len(LANGS)).cast("int") + 1)

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        log_line.alias("text"),
        lang.alias("lang"),
    )
