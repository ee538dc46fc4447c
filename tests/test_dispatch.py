"""Tag-pattern dispatch tests (fluentd match-pattern semantics)."""

import re

import pytest

from fluent_plugin_geoip_spark.operators.dispatch import (
    dispatch_table, filter_by_tag, tag_pattern_to_regex,
)


@pytest.mark.parametrize("pattern,tag,expected", [
    ("a", "a", True),
    ("a", "b", False),
    ("a.*", "a.b", True),
    ("a.*", "a.b.c", False),
    ("a.*", "a", False),
    ("a.**", "a", True),          # fluentd: 'a.**' matches 'a' itself
    ("a.**", "a.b", True),
    ("a.**", "a.b.c", True),
    ("a.**", "ab", False),
    ("**", "anything.at.all", True),
    ("a.{b,c}", "a.b", True),
    ("a.{b,c}", "a.c", True),
    ("a.{b,c}", "a.d", False),
    ("access.apache", "access.apache", True),   # README.md:253
    ("test.**", "test.message", True),          # README.md:263
])
def test_pattern_regex(pattern, tag, expected):
    assert bool(re.match(tag_pattern_to_regex(pattern), tag)) is expected


def test_filter_and_dispatch(spark):
    df = spark.createDataFrame(
        [("access.apache", 1), ("access.nginx", 2), ("test.message", 3),
         ("other", 4)], "tag string, v int")
    assert [r.v for r in filter_by_tag(df, "access.*").collect()] == [1, 2]
    routed = dispatch_table(df, [("access.apache", "apache"),
                                 ("access.**", "access_other"),
                                 ("**", "catchall")])
    got = {r.v: r.route for r in routed.collect()}
    assert got == {1: "apache", 2: "access_other", 3: "catchall", 4: "catchall"}


@pytest.mark.parametrize("pattern,tag,expected", [
    ("a.{b.*,c.**}", "a.b.x", True),     # globs inside braces
    ("a.{b.*,c.**}", "a.c.x.y", True),
    ("a.{b.*,c.**}", "a.d.x", False),
])
def test_brace_glob_alternatives(pattern, tag, expected):
    assert bool(re.match(tag_pattern_to_regex(pattern), tag)) is expected


def test_inject_metadata(spark):
    import socket
    from pyspark.sql import functions as F
    from fluent_plugin_geoip_spark.operators.inject import inject_metadata
    df = spark.createDataFrame([("x", "2024-01-01 12:00:00")], "v string, ts string") \
              .withColumn("warc_ts", F.to_timestamp("ts"))
    out = inject_metadata(df, tag="input.access", time_col="warc_ts",
                          hostname_key="hostname",
                          time_format="yyyy-MM-dd HH:mm:ss").first()
    assert out.tag == "input.access"
    assert out.time == "2024-01-01 12:00:00"
    assert out.hostname == socket.gethostname()
