"""Tag-pattern dispatch (S2 in SURVEY.md §2.1).

fluentd routes events to ``<filter>``/``<match>`` blocks by tag glob
(`<filter access.apache>`, `<match test.**>` — /root/reference/README.md:70,
253, 263). Spark restatement: the tag is a column; a match pattern compiles
to a regex filter; a full dispatch table becomes one pass that assigns each
row its first matching route (fluentd's first-match-wins semantics).

Pattern grammar (fluentd match patterns):
- ``*``    matches one tag part (no dots)
- ``**``   matches zero or more parts (including the separator dots)
- ``{a,b}`` alternation
- anything else is literal
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F


def _glob_fragment(pattern: str) -> str:
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if pattern.startswith("**", i):
            # '**' matches zero or more parts; 'a.**' also matches 'a'
            if out and out[-1] == r"\.":
                out.pop()
                out.append(r"(\..*)?" if i + 2 >= len(pattern) else r"\.(.*\.)?")
            else:
                out.append(".*")
            i += 2
        elif c == "*":
            out.append(r"[^.]+")
            i += 1
        elif c == "{":
            j = pattern.index("}", i)
            # alternatives are themselves glob patterns (fluentd allows
            # wildcards inside braces, e.g. 'a.{b.*,c.**}')
            alts = pattern[i + 1:j].split(",")
            out.append("(" + "|".join(_glob_fragment(a) for a in alts) + ")")
            i = j + 1
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


def tag_pattern_to_regex(pattern: str) -> str:
    """Compile one fluentd tag glob to an anchored Java/RE2-safe regex."""
    return "^" + _glob_fragment(pattern) + "$"


def tag_matches(tag: Column, pattern: str) -> Column:
    return tag.rlike(tag_pattern_to_regex(pattern))


def filter_by_tag(df: DataFrame, pattern: str, tag_col: str = "tag") -> DataFrame:
    """``<filter PATTERN>`` — keep rows whose tag matches."""
    return df.filter(tag_matches(F.col(tag_col), pattern))


def dispatch_table(df: DataFrame, routes: list[tuple[str, str]],
                   tag_col: str = "tag", route_col: str = "route") -> DataFrame:
    """``<match>`` chain: assign each row the name of the FIRST route whose
    pattern matches its tag (fluentd first-match-wins); no match → null."""
    expr = F.lit(None).cast("string")
    for pattern, name in reversed(routes):
        expr = F.when(tag_matches(F.col(tag_col), pattern), F.lit(name)) \
                .otherwise(expr)
    return df.withColumn(route_col, expr)
