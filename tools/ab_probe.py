"""Same-machine A/B probe for bench drift attribution.

Runs the two queries under investigation (curate_corpus_full,
sim_cosine_pairs — the round-8 unattributed regressions) in one fresh
JVM against whatever package PYTHONPATH points at, printing one JSON
line of warm per-rep timings. Interleave invocations across package
trees (r7 archive vs HEAD) to attribute a bench delta to code vs
machine drift — the method the round-8 notes used for
storage_churn/join_bloom_xxhash64.
"""
import json
import os
import sys
import time

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from database_anonymiser_spark.operators.curate import curate_corpus
from database_anonymiser_spark.operators import similarity as SIM
from database_anonymiser_spark.suite.base import load


def curate_job():
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


def sim_job():
    emb = load(spark, sf_dir, "embeddings")
    return SIM.cosine_lsh_pairs(
        emb, "vec_id", "embedding", threshold=0.5, n_planes=16, rows_per_band=4
    ).count()


out = {"pkg": sys.argv[1] if len(sys.argv) > 1 else "?"}
for name, job in (("curate_corpus_full", curate_job), ("sim_cosine_pairs", sim_job)):
    job()  # warm-up (JIT, parquet footer cache, broadcast warm)
    spark.catalog.clearCache()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        job()
        reps.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    out[name] = reps
print(json.dumps(out))
