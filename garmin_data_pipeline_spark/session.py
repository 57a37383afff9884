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
