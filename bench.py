"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set spans the engine's operator families: full-pipeline
anonymisation, scan+agg, fact-fact join, window, streaming-equivalent
windowing, dedup (minhash), similarity (brute-force top-k), text analysis.
Each query executes to completion (count/collect of the final result), timed
after a warm-up of the Spark session on a trivial action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-2 renames (suite consolidation): agg_group→tpch_q1 subsumed it, so
# agg_multidim stands in for the aggregation slot; window_rank→window_pack;
# tpch_q14→tpch_q6_q14; text_quality→text_profile; func_json_struct→func_json.
# sim_cosine_pairs joins the set now that it's LSH-blocked (was a crossJoin).
# join_asof now computes all THREE directions (backward/forward/nearest) in
# one query — its timing is not comparable 1:1 with round 1's backward-only.
HEADLINE = [
    "anonymise_customer",
    "agg_multidim",
    "join_sortmerge",
    "join_broadcast",
    "join_asof",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6_q14",
    "window_pack",
    "topk_orders",
    "stream_session",
    "dedup_minhash",
    "dedup_exact",
    "sim_topk_bruteforce",
    "sim_cosine_pairs",
    "text_profile",
    "func_json",
    "mm_binary_meta",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from database_anonymiser_spark.session import get_spark
    from database_anonymiser_spark.suite import all_queries

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # warm-up: JVM + parquet footer caches + Arrow Python workers (workers
    # are long-lived under spark.python.worker.reuse, as on a real cluster;
    # interpreter spin-up is environment cost, not query cost)
    spark.range(1000).count()

    def _identity_batches(it):
        yield from it

    spark.range(10_000).repartition(32).mapInPandas(_identity_batches, "id long").count()

    # same-run control: a fixed data-independent job whose timing tracks
    # machine load (timings vary ~1.4x with load across rounds; divide by
    # the control to compare rounds fairly)
    t0 = time.perf_counter()
    spark.range(50_000_000).selectExpr("sum(id * 2)").collect()
    control = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs[name]
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        # queries may .cache() internal stages (e.g. stream_windows'
        # pre-agg); clear between queries so timings stay independent
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "control_sec": control,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
