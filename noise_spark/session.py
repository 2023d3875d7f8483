"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the local[N] sandbox but expressed the way a
1000-executor cluster job would set them: AQE on (runtime coalesce +
skew-join handling), Arrow transfers on, shuffle partitions sized to the
parallelism level instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "noise_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("NOISE_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Sandbox-scale default: the test corpora are a few hundred MB, so
        # the 128MB default packs everything into a handful of input
        # splits and caps scan/tokenize parallelism at ~4 tasks. 4MB keeps
        # all local[N] cores busy; a real 100TB job overrides this back up
        # via the env var (input splits are plentiful there).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("NOISE_SPARK_MAX_PARTITION_BYTES", "4m"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
