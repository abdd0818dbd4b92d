"""SparkSession factory with the engine's pinned config."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# literal-relation ceiling for local_rows_df: above this the SQL text and
# parse time outgrow the job they replace
LOCAL_ROWS_MAX = 1024


def local_rows_df(spark: SparkSession, rows, cols):
    """Small driver-resident result as a LocalTableScan (VALUES literal):
    collect() runs ZERO Spark jobs, unlike createDataFrame(parallelize(..))
    whose collect pays a full Python-task round trip (~140 ms on this
    host). cols: [(name, sql_type)]; rows: tuples of int/float/str/None.
    Falls back to the RDD path above LOCAL_ROWS_MAX rows."""
    schema = ", ".join(f"{n} {t}" for n, t in cols)
    if not rows:
        return spark.createDataFrame([], schema)
    if len(rows) > LOCAL_ROWS_MAX:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(list(rows), 1), schema
        )

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(v)  # shortest round-trip decimal: exact for f64
        import numpy as _np

        if isinstance(v, _np.floating):
            return repr(float(v))
        return str(int(v))

    vals = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    casts = ", ".join(
        f"CAST(col{i + 1} AS {t}) AS {n}" for i, (n, t) in enumerate(cols)
    )
    return spark.sql(f"SELECT {casts} FROM VALUES {vals}")


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
