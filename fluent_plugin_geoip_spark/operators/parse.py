"""Parse stage (P5 in SURVEY.md §2.2): grok/regex extraction of host/IP and
access-log fields from ``url``/``html``/``text``.

All extraction is native Catalyst expressions (``regexp_extract``,
``decode``) — JVM-side, whole-stage-codegen'd, no Python. The per-row
invariant mandated by BASELINE.json:15 — byte-identical extracted text per
url — is ``extract_text(html) == text`` and is asserted in tests and
checkable at scale via ``text_invariant_violations``.

The apache combined-log grok mirrors the reference's documented tutorial
input (/root/reference/README.md:248-276: apache access log fed to the geoip
filter with ``geoip_lookup_keys host``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# apache common/combined access-log prefix: ip - ident [ts] "METHOD path proto" status bytes
ACCESS_LOG_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\S+)'
)
_PRE_RE = r"<pre>(.*?)</pre>"


def extract_text(html: Column) -> Column:
    """Deterministic text extraction from html bytes (the invariant target)."""
    return F.regexp_extract(F.decode(html, "UTF-8"), _PRE_RE, 1)


def url_host(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def access_log_fields(text: Column) -> Column:
    """Struct of grok'd access-log fields; empty-string groups where unmatched
    (regexp_extract semantics) are normalized to null except client_ip, which
    keeps '' to preserve the reference's empty-string-address warning path
    (filter_geoip.rb:172-174)."""
    def g(i: int) -> Column:
        return F.regexp_extract(text, ACCESS_LOG_RE, i)

    def null_if_empty(c: Column) -> Column:
        return F.when(c == "", F.lit(None)).otherwise(c)

    return F.struct(
        g(1).alias("client_ip"),
        null_if_empty(g(4)).alias("ts_raw"),
        null_if_empty(g(5)).alias("method"),
        null_if_empty(g(6)).alias("path"),
        null_if_empty(g(8)).cast("int").alias("status"),
        null_if_empty(g(9)).cast("long").alias("bytes"),
    )


def parse_pages(df: DataFrame, validate_text: bool = False,
                include_access: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → + host, client_ip[, access].

    ``client_ip`` uses a dedicated single-group regex (the hot path feeds only
    the enrich kernel); the full 9-group access-log struct is opt-in via
    ``include_access`` — Catalyst prunes it anyway when unused, but keeping it
    out of the default plan keeps EXPLAIN output honest about the hot path.

    When ``validate_text`` is set, re-extracts text from html and adds a
    ``text_ok`` boolean for the byte-identical invariant (cheap enough to keep
    on in audits; off in the hot path since ``text`` is authoritative).
    """
    out = df.withColumn("host", url_host(F.col("url"))) \
            .withColumn("client_ip", F.regexp_extract(F.col("text"), r"^(\S+) ", 1))
    if include_access:
        out = out.withColumn("access", access_log_fields(F.col("text")))
    if validate_text:
        out = out.withColumn("text_ok", extract_text(F.col("html")) == F.col("text"))
    return out


def text_invariant_violations(df: DataFrame) -> DataFrame:
    """Rows whose html-derived text differs from the stored text column."""
    return df.filter(extract_text(F.col("html")) != F.col("text")).select("url")
