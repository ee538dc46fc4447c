"""Interleaved A/B: label-propagation convergence test folded into the
checkpoint job via observe() (round 8) vs the round-7 form (a separate
join-and-count job per round).

The B arm reproduces the round-7 loop verbatim (join new/old labels,
count mismatches) on the same edges; both arms run alternately in one
process/window so substrate drift cancels. Representative input: the
update_clusters shape — many tiny star clusters plus a handful of
bridging chains, where rounds are few and per-round JOB OVERHEAD is the
dominant cost (exactly the regime the verdict flagged for
incremental_clusters).

Usage: python scripts/ab_cc_convergence.py [reps]
Appends one JSON line per rep pair to docs/ab_cc_convergence_r8.jsonl.
"""

import json
import sys
import time

from pyspark.sql import Observation, SparkSession, functions as F

sys.path.insert(0, ".")
from fluent_plugin_geoip_spark.operators.dedup import (  # noqa: E402
    connected_components, release_checkpoint,
)


def make_edges(spark, n_clusters=2000, size=4, chains=5, chain_len=8):
    """Star clusters (comp -> member) + a few multi-hop chains."""
    rows = []
    for c in range(n_clusters):
        base = c * 100
        for m in range(1, size):
            rows.append((base, base + m))
    nxt = n_clusters * 100
    for _ in range(chains):
        for i in range(chain_len):
            rows.append((nxt + i, nxt + i + 1))
        nxt += chain_len + 10
    return spark.createDataFrame(rows, "id_a long, id_b long")


def old_label_prop(pairs, max_iters=25):
    """Round-7 loop: separate join+count job per round."""
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst")))
             .distinct().localCheckpoint())
    ids = edges.select(F.col("src").alias("id")).distinct()
    labels = ids.withColumn("comp", F.col("id")).localCheckpoint()
    for _ in range(max_iters):
        neigh = (edges.join(labels, edges.dst == labels.id)
                 .groupBy("src").agg(F.min("comp").alias("ncomp")))
        new_labels = (labels.join(neigh, labels.id == neigh.src, "left")
                      .select(labels.id,
                              F.least(F.col("comp"),
                                      F.coalesce(F.col("ncomp"),
                                                 F.col("comp")))
                              .alias("comp")).localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        release_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            release_checkpoint(edges)
            return labels
    raise RuntimeError("no convergence")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .appName("ab_cc_convergence").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    pairs = make_edges(spark).persist()
    pairs.count()

    # warmup both arms once
    release_checkpoint(old_label_prop(pairs))
    release_checkpoint(connected_components(pairs, algorithm="label_prop"))

    out = []
    with open("docs/ab_cc_convergence_r8.jsonl", "a") as f:
        for rep in range(reps):
            t0 = time.time()
            release_checkpoint(connected_components(
                pairs, algorithm="label_prop"))
            t_new = time.time() - t0
            t0 = time.time()
            release_checkpoint(old_label_prop(pairs))
            t_old = time.time() - t0
            rec = {"rep": rep, "observe_fold_s": round(t_new, 3),
                   "separate_count_s": round(t_old, 3),
                   "speedup": round(t_old / t_new, 3)}
            out.append(rec)
            f.write(json.dumps(rec) + "\n")
            print(rec)
    med = sorted(r["speedup"] for r in out)[len(out) // 2]
    print(json.dumps({"median_speedup": med}))


if __name__ == "__main__":
    main()
