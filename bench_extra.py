#!/usr/bin/env python
"""Round-9 profiling harness — separate from the FROZEN ``bench.py``.

Isolates where the expensive bench rows spend their time (guide §1):

- ``queries <name>...``  — warm best-of-3 ``count()`` of driver queries
  (the frozen bench's exact methodology) so A/B deltas map 1:1 onto
  BENCH numbers;
- ``phases``             — phase breakdown of the dedup/cluster family
  (signatures → candidates → screen → verify → components → detach);
- ``v6``                 — the jvm_join IPv6 enrich row: full query vs
  the bare ipv6 parse expression vs the joins (noop-sink isolated);
- ``explain <name> <out>`` — ``explain('formatted')`` capture for a
  driver query, written to ``<out>``.

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_REPS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import make_spark, sf_of  # noqa: E402  (frozen file, read-only use)
from fluent_plugin_geoip_spark.plans import testdata_queries as tq  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def best_of(fn, reps: int = None) -> float:
    reps = REPS if reps is None else reps
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    if cmd == "queries":
        names = sys.argv[2:] or sorted(tq.QUERIES)
        for name in names:
            fn = tq.QUERIES[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            out[name] = round(best_of(lambda: fn(spark, sf_dir).count()), 3)

    elif cmd == "explain":
        name, path = sys.argv[2], sys.argv[3]
        df = tq.QUERIES[name](spark, sf_dir)
        with open(path, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(json.dumps({"written": path}))
        spark.stop()
        return

    elif cmd == "phases":
        from fluent_plugin_geoip_spark.operators import dedup
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        kw = dict(threshold=0.8, bands=32, rows=4, num_hashes=128,
                  exact_grams=True, max_bucket=1_000_000)

        spark.sparkContext.setJobDescription("phase:signatures")
        out["signatures_noop"] = round(best_of(lambda: noop(
            dedup.minhash_signatures_pandas(d, num_hashes=128))), 3)

        def cands_only():
            sigs = dedup.minhash_signatures_pandas(d, num_hashes=128).persist()
            c = dedup.lsh_candidate_pairs(sigs, "sig", bands=32, rows=4,
                                          max_bucket=1_000_000)
            n = c.count()
            c.unpersist(); sigs.unpersist()
            return n
        spark.sparkContext.setJobDescription("phase:lsh_candidates")
        out["sig_plus_candidates"] = round(best_of(cands_only), 3)

        def pairs_full():
            p = dedup.minhash_lsh_dedup(d, **kw)
            n = p.count()
            p.unpersist()
            return n
        spark.sparkContext.setJobDescription("phase:minhash_full")
        out["minhash_lsh_full"] = round(best_of(pairs_full), 3)

        # components over a fixed pair set (pairs generated once, reused)
        pairs = dedup.minhash_lsh_dedup(d, **kw)
        pairs.count()
        for algo in ("label_prop", "star"):
            def cc():
                c = dedup.connected_components(pairs, algorithm=algo)
                n = c.count()
                dedup.release_checkpoint(c)
                return n
            spark.sparkContext.setJobDescription(f"phase:cc_{algo}")
            out[f"components_{algo}"] = round(best_of(cc), 3)
        pairs.unpersist()

        # incremental: probe vs update_clusters split
        corpus = d.filter(F.col("doc_id") % 5 != 0)
        new = d.filter(F.col("doc_id") % 5 == 0)
        store, table = tq._incremental_store(spark, sf_dir, corpus)
        clusters = spark.read.parquet(tq._corpus_cluster_table(spark, sf_dir))

        def probe():
            p = dedup.incremental_minhash_dedup(
                new, corpus, store, bands=32, rows=4, num_hashes=128,
                threshold=0.8, exact_grams=True, max_bucket=1_000_000,
                store_table=table, use_sig_store=True)
            n = p.count()
            p.unpersist()
            return n
        spark.sparkContext.setJobDescription("phase:incr_probe")
        out["incremental_probe"] = round(best_of(probe), 3)

        pairs2 = dedup.incremental_minhash_dedup(
            new, corpus, store, bands=32, rows=4, num_hashes=128,
            threshold=0.8, exact_grams=True, max_bucket=1_000_000,
            store_table=table, use_sig_store=True)
        pairs2.count()

        def upd():
            u = dedup.update_clusters(clusters, pairs2.select("id_a", "id_b"))
            n = u.count()
            u.unpersist()
            return n
        spark.sparkContext.setJobDescription("phase:update_clusters")
        out["update_clusters"] = round(best_of(upd), 3)
        pairs2.unpersist()

    elif cmd == "v6":
        from fluent_plugin_geoip_spark.functions.ipv6 import ipv6_str_to_longs
        name = "geoip_mmdb_enrich_v6"
        fn = tq.QUERIES[name]
        spark.sparkContext.setJobDescription("v6:full_query_count")
        out["full_query_count"] = round(best_of(
            lambda: fn(spark, sf_dir).count()), 3)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "ip", F.element_at(
                F.array(*[F.lit(s) for s in tq._MMDB_V6_TEST_IPS]),
                (F.col("event_id") % 6).cast("int") + 1))
        spark.sparkContext.setJobDescription("v6:parse_only_noop")
        out["parse_only_noop"] = round(best_of(lambda: noop(
            ev.select(ipv6_str_to_longs(F.col("ip")).alias("p")))), 3)
        spark.sparkContext.setJobDescription("v6:events_scan_noop")
        out["events_scan_noop"] = round(best_of(lambda: noop(
            ev.select("event_id", "ip"))), 3)

    print(json.dumps({"cmd": cmd, "sf": sf_of(sf_dir), "cpus": cpus,
                      "reps": REPS, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
