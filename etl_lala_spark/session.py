"""SparkSession factory with scale-aware defaults.

The reference bounds memory with hand-rolled physical strategies (sequential
job scheduling, spill-to-disk, forced GC — SURVEY.md §4); here those concerns
are delegated to Spark's unified memory manager and AQE. The settings below
are the ones that matter at 100 TB: AQE (runtime re-plan, skew-join handling,
partition coalescing), Arrow for the Python boundary, and a UTC session
timezone so results are stable across engines (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-level SQL confs that every entry point must ensure, whether the
# session was built by us or handed in by an external driver.
SESSION_CONFS: dict[str, str] = {
    # Driver-generated events.parquet stores TIMESTAMP(NANOS); Spark has no
    # nanosecond timestamp type, so read as long and convert (io.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing of small shuffle partitions and skew-join
    # splitting — essential on real clusters where stats are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / applyInPandas / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Partition values stay strings (the record model is string-typed —
    # competência "202501" must not come back as an int).
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
}


def apply_session_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The correctness driver builds its own SparkSession; all confs in
    SESSION_CONFS are runtime-settable SQL confs, so this is safe to call on
    any session before reading tables.
    """
    for k, v in SESSION_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment — keep going; readers that
            # depend on a conf re-check and degrade explicitly.
            pass
    return spark


def get_spark(
    app_name: str = "etl_lala_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Local mode is a single JVM, so ``spark.driver.memory`` is the only memory
    knob; on a real cluster the same code runs with executor sizing instead.
    ``shuffle_partitions`` defaults to the local core count — the 200 default
    over-parallelizes small data and under-parallelizes 100 TB; production
    deployments should size it to ~2-3× total cores with AQE coalescing the
    rest.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in SESSION_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # getOrCreate may have returned a pre-existing session with different
    # runtime confs — re-apply the settable ones.
    return apply_session_confs(spark)
