"""Cross-scale bench for the heavy trio + storage lifecycle (round-5
verdict stretch #8; round-7 verdict #4 adds the storage_churn point with
its metadata-read counters per scale).

Times curate_corpus_full, join_bloom (both hash families) and
dedup_minhash at one or more scale-factor directories — by default the
driver fixtures sf0.01/sf0.1 plus the derived sf1 set from
tools/gen_benchdata.py — with bench.py's methodology (same session,
warm-up, min of REPS, cache cleared between reps). Prints one JSON line:
{"scales": {"sf0.1": {"curate_corpus_full": s, ...}, "sf1": {...}},
 "control_sec": s}

Run: python tools/bench_scale.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(repo, ".benchdata", "sf1"),
    ]
    from pyspark.sql import functions as F

    from database_anonymiser_spark.operators.bloom import bloom_semi_join
    from database_anonymiser_spark.operators.curate import curate_corpus
    from database_anonymiser_spark.session import get_spark
    from database_anonymiser_spark.suite import all_queries
    from database_anonymiser_spark.suite.base import load

    spark = get_spark(app_name="bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    spark.range(1000).count()

    def _identity_batches(it):
        yield from it

    spark.range(10_000).repartition(32).mapInPandas(
        _identity_batches, "id long"
    ).count()

    def _time(job) -> float:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            job()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    control = _time(
        lambda: spark.range(50_000_000).selectExpr("sum(id * 2)").collect()
    )

    def _bloom(sf_dir, family):
        orders = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000.0)
        li = load(spark, sf_dir, "lineitem")
        passed = bloom_semi_join(li, "l_orderkey", orders, "o_orderkey", family=family)
        bloom_agg = passed.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("bloom_rows")
        )
        exact_agg = (
            li.join(
                orders.select("o_orderkey").distinct(),
                li.l_orderkey == F.col("o_orderkey"),
                "left_semi",
            )
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("exact_rows"))
        )
        return bloom_agg.join(exact_agg, "l_returnflag").count()

    def _curate(sf_dir):
        n = curate_corpus(
            load(spark, sf_dir, "documents"),
            min_tokens=3,
            drop_boilerplate=True,
            dedup_lines_min_docs=3,
            drop_repetitive=True,
            near_dedup=True,
            decontam_n=8,
            mixture_rates={"src0": 2.0, "src1": 0.5},
            token_budgets={"src2": 2_000},
        ).count()
        assert n > 0
        return n

    from tools.storage_probe import storage_churn

    out: dict[str, dict] = {}
    for sf_dir in dirs:
        tag = "sf" + sf_dir.rstrip("/").split("sf")[-1]
        row: dict = {}
        row["dedup_minhash"] = _time(
            lambda: specs["dedup_minhash"].spark(spark, sf_dir).count()
        )
        row["join_bloom"] = _time(lambda: _bloom(sf_dir, "md5"))
        row["join_bloom_xxhash64"] = _time(lambda: _bloom(sf_dir, "xxhash64"))
        row["curate_corpus_full"] = _time(lambda: _curate(sf_dir))
        # storage lifecycle (same code as bench.py's storage_churn via
        # tools/storage_probe): trickle is FIXED-SIZE across scales, so
        # merge/update/delete should stay ~flat while create/compact
        # scale with the data — counters from the LAST rep
        meta: dict = {}
        row["storage_churn"] = _time(lambda: storage_churn(spark, sf_dir, meta))
        row["storage_meta_reads"] = meta
        # composite-key lifecycle (round 11): tuple-point trickle over a
        # FIXED 32-key band — files_touched must stay bounded by the
        # trickle's tuple count, not grow with the table's file count
        from tools.storage_probe import composite_churn

        ck_meta: dict = {}
        t0 = time.perf_counter()
        ck_meta["rows"] = composite_churn(spark, sf_dir, ck_meta)
        ck_meta["lifecycle_sec"] = round(time.perf_counter() - t0, 3)
        row["composite_meta"] = ck_meta
        # near-dedup ingest lifecycle (round-8 verdict #4: the sink's
        # scale claim — probe reads bounded by the batch's bucket count,
        # not the store size — needs more than one scale point). One rep:
        # the number of interest is the COUNTER, wall is secondary.
        from tools.storage_probe import clustering_churn

        cl_meta: dict = {}
        t0 = time.perf_counter()
        cl_meta["rows"] = clustering_churn(spark, sf_dir, cl_meta)
        cl_meta["lifecycle_sec"] = round(time.perf_counter() - t0, 3)
        row["clustering_meta"] = cl_meta
        from tools.storage_probe import neardedup_stream

        nd_meta: dict = {}
        t0 = time.perf_counter()
        nd_meta["kept_docs"] = neardedup_stream(spark, sf_dir, nd_meta)
        nd_meta["lifecycle_sec"] = round(time.perf_counter() - t0, 3)
        row["neardedup_meta"] = nd_meta
        # transactional fan-out lifecycle (round 9): 3 epochs into two
        # tables, one cross-table transaction each. One rep; the scale
        # claim is the COMMIT_READS-per-epoch counter (checkpoint-
        # bounded metadata, flat across corpus size), wall secondary.
        from tools.storage_probe import txn_fanout

        tx_meta: dict = {}
        t0 = time.perf_counter()
        tx_meta["rows"] = txn_fanout(spark, sf_dir, tx_meta)
        tx_meta["lifecycle_sec"] = round(time.perf_counter() - t0, 3)
        row["txn_fanout_meta"] = tx_meta
        # DataSource read faces + CDC replication (round 9): native vs
        # Arrow-source snapshot aggregate, one CDF drain, one replica.
        # The scale claims: the Arrow-source stays same-ORDER as native,
        # the CDF drain scales with delivered events (file-parallel),
        # the replica's apply rewrites only key-intersecting files.
        from tools.storage_probe import datasource_read

        ds_meta: dict = {}
        ds_meta["rows"] = datasource_read(spark, sf_dir, ds_meta)
        row["datasource_meta"] = ds_meta
        # ANN recall at production defaults (round-8 verdict #5): only
        # where the scale dir carries an embeddings table
        if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            from tools.ann_probe import ann_recall_headline

            row["ann_recall"] = ann_recall_headline(spark, sf_dir)
            # round-12 verdict #8: sim_cosine_pairs joins the scale-
            # sensitive set (LSH-blocked all-pairs is the entry most
            # exposed to candidate-pair growth at 10×)
            row["sim_cosine_pairs"] = _time(
                lambda: specs["sim_cosine_pairs"].spark(spark, sf_dir).count()
            )
        # training-shard export lifecycle (round 9): write + verify
        # walls and the structural counters (one file per shard,
        # manifest totals). Fixed token budget per shard across scales:
        # a 10x corpus should land ~10x shards in ~1 scan/shuffle.
        from tools.storage_probe import shard_export_probe

        ex_meta: dict = {}
        ex_meta["rows"] = shard_export_probe(spark, sf_dir, ex_meta)
        row["export_meta"] = ex_meta
        out[tag] = row
        print(f"# {tag}: {row}", file=sys.stderr)

    print(json.dumps({"scales": out, "control_sec": control, "reps": REPS}))


if __name__ == "__main__":
    main()
