"""SparkSession factory with the engine's pinned config."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "lucene_rust_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(32, cores)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.local.dir", "/dev/shm/lrs_spark_local")
        # JDK17's default G1 caps allocation-heavy stages (tokenize/explode)
        # at ~8-thread throughput in local mode; ParallelGC restores linear
        # scaling (measured 5x on the tokenize stage at local[32]).
        # MaxNewSize bounds young-gen growth: with a large Xmx, ParallelGC
        # ergonomics let eden balloon to ~Xmx/3 of mostly-garbage pages —
        # on lazily-backed VMs every fresh page is a high-latency fault, so
        # a bounded, reused young gen is much cheaper than a huge one-shot
        # one (OPTIMIZATION_r07.md §2); 2g still gives each of 32 tasks
        # ~60MB of eden between minor GCs
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC -XX:MaxNewSize=2g")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
