"""SparkSession factory with the engine's scale-tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "database-anonymiser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build/get a SparkSession.

    Defaults chosen for the engine's workloads:
    - AQE on (runtime coalescing, skew-join splitting) — essential at scale,
      harmless locally.
    - Arrow on for any Pandas-UDF path (multimodal / similarity fallbacks).
    - shuffle partitions sized to cores locally; on a real cluster leave AQE's
      coalescing to right-size post-shuffle partitions.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (e.g. events.ts) is unreadable natively;
        # read as long and let ParquetCatalog convert ns → timestamp losslessly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: the driver JVM hosts ALL executor memory — 8g across
        # 32 concurrent tasks (~250 MB/task + cached frames) produced
        # measured multi-minute GC storms during pipeline cache fills
        # (guide §5: size memory to the workload). 16g is the local
        # default for this host class; env-overridable, and irrelevant on
        # a real cluster where executor memory is provisioned explicitly.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
