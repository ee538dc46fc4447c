#!/usr/bin/env python
"""Round-9 A/B: interpreted-HOF expression trees with vs without the
structural let-binding (functions.binding.let_).

Three production expressions had an outer expression (a regex split /
normalize over the whole document) referenced from inside a per-element
lambda, so the interpreter re-evaluated it once per gram/token —
O(len^2) per row:

- dedup._shingle_grams   (char n-gram shingles; verification path)
- curation._token_ngrams (token n-grams; ngram_counts, contamination)
- curation.repetition_features (mode count over distinct tokens)

This script times the OLD (inline) formulation against the CURRENT
(let-bound) module code on the sf0.1 documents table, noop-sink isolated
(guide §1.4), warm best-of-N. Appends one JSON line to
docs/hof_let_r9.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import make_spark  # noqa: E402
from fluent_plugin_geoip_spark.operators import curation, dedup  # noqa: E402
from fluent_plugin_geoip_spark.operators.textstats import tokens  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def best_of(fn):
    fn()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- OLD (pre-round-9) formulations, verbatim ---------------------------

def old_shingle_grams(text, n):
    t = F.lower(F.regexp_replace(text, r"\s+", " "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: t.substr(i, F.lit(n)))


def old_token_ngrams(w, n):
    return F.when(
        F.size(w) >= n,
        F.transform(F.sequence(F.lit(1), F.size(w) - (n - 1)),
                    lambda i: F.array_join(F.slice(w, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def old_repetition_features(text):
    w = tokens(text)
    n = F.size(w)
    safe_n = F.greatest(n, F.lit(1))
    top = F.array_max(F.transform(
        F.array_distinct(w),
        lambda x: F.size(F.filter(w, lambda y: y == x))))
    bi = F.zip_with(F.slice(w, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(w, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b))
    dup_w = F.when(n == 0, F.lit(0.0)) \
             .otherwise(1.0 - F.size(F.array_distinct(w)) / safe_n)
    dup_bi = F.when(F.size(bi) == 0, F.lit(0.0)) \
              .otherwise(1.0 - F.size(F.array_distinct(bi))
                         / F.size(bi).cast("double"))
    return F.struct(
        n.alias("n_words"), dup_w.alias("dup_word_frac"),
        (F.coalesce(top, F.lit(0)) / safe_n).alias("top_word_frac"),
        dup_bi.alias("dup_bigram_frac"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {}

    cases = {
        "shingle_set": (
            lambda: noop(d.select(F.array_distinct(
                old_shingle_grams(F.col("text"), 5)).alias("sh"))),
            lambda: noop(d.select(
                dedup.shingle_set(F.col("text"), 5).alias("sh")))),
        "token_ngrams_n2_counts": (
            lambda: noop(d.select(F.explode(old_token_ngrams(
                tokens(F.col("text")), 2)).alias("g"))
                .groupBy("g").count()),
            lambda: noop(d.select(F.explode(curation._token_ngrams(
                tokens(F.col("text")), 2)).alias("g"))
                .groupBy("g").count())),
        "token_ngrams_n8": (
            lambda: noop(d.select(old_token_ngrams(
                tokens(F.col("text")), 8).alias("g"))),
            lambda: noop(d.select(curation._token_ngrams(
                tokens(F.col("text")), 8).alias("g")))),
        "repetition_features": (
            lambda: noop(d.select(old_repetition_features(
                F.col("text")).alias("r"))),
            lambda: noop(d.select(curation.repetition_features(
                F.col("text")).alias("r")))),
    }
    # interleaved A/B (BASELINE.md protocol): old/new alternating so a
    # substrate drift cannot masquerade as a win
    for name, (old, new) in cases.items():
        spark.sparkContext.setJobDescription(f"ab:{name}:old")
        t_old = best_of(old)
        spark.sparkContext.setJobDescription(f"ab:{name}:new")
        t_new = best_of(new)
        spark.sparkContext.setJobDescription(f"ab:{name}:old2")
        t_old2 = best_of(old)
        spark.sparkContext.setJobDescription(f"ab:{name}:new2")
        t_new2 = best_of(new)
        out[name] = {"old": min(t_old, t_old2), "new": min(t_new, t_new2),
                     "speedup": round(min(t_old, t_old2)
                                      / max(min(t_new, t_new2), 1e-9), 2)}

    rec = {"bench": "hof_let_r9", "sf_dir": sf_dir, "cpus": cpus,
           "reps": REPS, "cases": out}
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "hof_let_r9.jsonl"),
            "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
