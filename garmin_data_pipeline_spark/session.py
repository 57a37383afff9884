"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the config block is
written so the same code scales to a multi-executor cluster: AQE for
runtime re-planning (partition coalescing, skew-join splitting, join
strategy switches), Arrow for any pandas-interop path, UTC session
timezone so results hash-match a UTC-naive DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "garmin_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # switch sort-merge -> broadcast at runtime. Essential at scale,
        # harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamps vs the UTC-naive DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / toPandas / applyInPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep scan partitions big enough to amortize task overhead but
        # small enough to fit executor memory at high SF.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # The testdata's events.parquet stores TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert at the edge
        # (sources/registry handles the cast).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def snapshot_persistent_rdds(spark) -> set[int]:
    """IDs of every currently-persisted RDD (long-lived serve indexes,
    caches, and any already-materialized lazy checkpoints)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_new_persistent_rdds(spark, baseline: set[int]) -> int:
    """Unpersist every RDD persisted since ``baseline``; returns the
    count released.

    The ANN serve paths materialize per-CALL lazy ``localCheckpoint``
    relations (query LUTs, residuals, shortlists — the r6
    expression-blowup fix). Spark frees those only when the
    ContextCleaner notices the Python wrapper has been
    garbage-collected, which lags under load, so a long serving
    session — or a 7-rep bench cell — accumulates them as
    storage-memory pressure and GC noise (measured in the r10
    serving bench: v9ps reps grew monotonically 5.4 -> 12.9s in one
    session; flat after releasing between reps). Per-call
    checkpoints are never shared across calls — they are NOT
    CacheManager entries, so no plan-fragment reuse can point at
    them — which makes everything past the baseline strictly
    garbage once the call's action completes. Long-lived indexes
    persisted BEFORE the baseline are untouched. Serving loops
    should snapshot once after the index warm-up and release after
    every batch."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for k in list(jmap.keySet().toArray()):
        if int(k) not in baseline:
            jmap.get(k).unpersist(False)
            n += 1
    return n
