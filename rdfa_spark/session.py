"""SparkSession factory with scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rdfa_spark",
              cpus: int | str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """local[N] session tuned for the extraction workload.

    At cluster scale the same confs apply (AQE on, skew-join on,
    bounded Arrow batches so big ``html`` blobs don't blow executor
    memory — SURVEY.md §4 'Spill / memory').
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    # When the session is confined to N cores (taskset / cgroup), the
    # JVM still sees the whole box and sizes GC/netty/fork-join pools
    # for os.cpu_count() — oversubscription that real cluster
    # managers (YARN/k8s) prevent by setting the container cpu count.
    # Mirror that here so a local[N] "executor" behaves like one.
    java_opts = ""
    try:
        java_opts = f"-XX:ActiveProcessorCount={int(cpus)}"
    except (TypeError, ValueError):
        pass
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html blobs are large; keep Arrow batches bounded (~2-4 MB:
        # big enough to amortize the per-batch channel cost, small
        # enough that giant pages can't blow worker memory)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # scan-split and post-shuffle sizing for the crawl workload:
        # 64 MB input splits keep page-blob scan tasks balanced for
        # the Python workers; AQE coalesces small shuffles toward
        # 32 MB partitions (our intermediate tables are narrow), so
        # tiny-stage queries don't schedule hundreds of empty tasks
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(32 * 1024 * 1024))
        # parquet sinks (materialize.py) write zstd: ~30% smaller
        # than snappy at similar scan speed — at 100 TB the storage
        # and shuffle-read savings dominate the encode cost
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if java_opts:
        b = b.config("spark.driver.extraJavaOptions", java_opts)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
