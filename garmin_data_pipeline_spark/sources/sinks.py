"""Warehouse sinks + catalog operations (SURVEY.md §2.1 S8-S12).

The reference loads every cleaned dataset into a PostgreSQL ``garmin``
schema with a truncate-and-reload strategy (``db_utils.py:121-159``,
strategy from config ``etl_settings.load_strategy``) and verifies each
load with an existence probe + ``SELECT COUNT(*)``
(``db_utils.py:189-245``). Here the warehouse is the Spark session
catalog backed by parquet:

- truncate-and-reload  -> ``saveAsTable(mode="overwrite")``
- append               -> ``saveAsTable(mode="append")``
- chunked JDBC insert  -> ``batchsize`` option on the JDBC writer
- B-tree indexes       -> no Spark equivalent; date partitioning
  (``partitionBy``) supplies partition pruning instead
  (create_summarized_activities_table.sql:93-96 / README tip).

At 100 TB the sink decisions that matter: partition column choice
(prunable predicates), target file size (``maxRecordsPerFile`` /
AQE coalesce so you don't write 10^6 tiny files), and sorted-within-
partition writes for downstream merge joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: list[str] | None = None,
    buckets: int = 32,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Load a DataFrame into the session catalog (reference
    ``DatabaseManager.load_dataframe``, db_utils.py:121-159).

    ``mode='overwrite'`` is the reference's truncate-and-reload
    (``if_exists='replace'``); ``'append'`` maps to its append
    strategy. The reference's four B-tree indexes
    (create_summarized_activities_table.sql:93-96) map to the three
    physical-layout levers Spark has: ``partition_by`` (partition
    pruning on the predicate column), ``bucket_by`` (shuffle-free
    equi-joins/aggs on the key), and ``sort_within_partitions``
    (clustered parquet row groups -> min/max page skipping for range
    predicates — the closest thing to an index scan).
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        writer = writer.bucketBy(buckets, *bucket_by).sortBy(*bucket_by)
    writer.saveAsTable(table)


def table_exists(spark: SparkSession, table: str) -> bool:
    """Existence probe (reference information_schema query,
    db_utils.py:189-219)."""
    return spark.catalog.tableExists(table)


def verify_row_count(spark: SparkSession, table: str) -> int:
    """Post-load row-count verification (reference SELECT COUNT(*),
    db_utils.py:221-245; used by the pipeline summary,
    etl_pipeline.py:126-128)."""
    if not table_exists(spark, table):
        raise ValueError(f"table does not exist: {table}")
    return spark.table(table).count()


def drop_view(spark: SparkSession, view: str) -> None:
    """DROP VIEW IF EXISTS (reference drops the running_summary view
    before reloading its base table, load_final_datasets.py:62-67)."""
    spark.sql(f"DROP VIEW IF EXISTS {view}")


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink (reference ``df.to_csv(index=False)``,
    transform_running_data.py:248 and the eight WRANGLE exports).

    ``single_file=True`` coalesces to one partition for byte-level
    parity with the reference's one-file outputs — driver-adjacent and
    only sane for small presentation tables; leave False at scale.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def jdbc_writer_options(
    url: str,
    table: str,
    batch_size: int = 1000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Validated option dict for the JDBC sink (pure function — the
    config plumbing is testable without a database, like
    :func:`jdbc_reader_options`)."""
    if not table:
        raise ValueError("table is required")
    opts = {"url": url, "dbtable": table, "batchsize": str(batch_size)}
    opts.update(properties or {})
    return opts


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink with chunked inserts (reference ``to_sql(chunksize=
    batch_size, method='multi')``, db_utils.py:145-153; batch size from
    config.template.yaml etl_settings). The mapping is 1:1: every
    executor writes its partitions in ``batchsize`` batches, so load
    parallelism = partition count (the reference is single-threaded
    here)."""
    opts = jdbc_writer_options(url, table, batch_size, properties)
    df.write.format("jdbc").options(**opts).mode(mode).save()


def jdbc_reader_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 1000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Validated option dict for a JDBC *read* (S10; reference
    ``DatabaseManager.execute_query`` -> ``pd.read_sql``,
    db_utils.py:161-187).

    Exactly one of ``table``/``query``. Partitioned scans (the scale
    path — N executors each read one ``partition_column`` stripe
    instead of one connection streaming everything) require ``table``
    plus all three of partition_column / bounds / num_partitions:
    Spark rejects ``query`` + ``partitionColumn`` because it can't
    wrap an arbitrary query in stripe predicates. Pure function so the
    config plumbing is testable without a database."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query
    part_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in part_opts):
        if any(o is None for o in part_opts):
            raise ValueError(
                "partitioned read needs partition_column, lower_bound, "
                "upper_bound, and num_partitions together"
            )
        if query is not None:
            raise ValueError(
                "partition_column cannot be combined with query; "
                "use table (or a subquery alias as dbtable)"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(properties or {})
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 1000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC query/table scan (reference ``pd.read_sql`` over the
    ``garmin`` schema, db_utils.py:161-187). Where the reference
    streams the whole result through one connection, the partitioned
    form issues ``num_partitions`` stripe queries in parallel — and
    Catalyst pushes filters/column pruning into the generated SQL."""
    opts = jdbc_reader_options(
        url,
        table,
        query,
        partition_column,
        lower_bound,
        upper_bound,
        num_partitions,
        fetch_size,
        properties,
    )
    return spark.read.format("jdbc").options(**opts).load()


def create_summarized_activities_table(
    spark: SparkSession, table: str = "garmin.summarized_activities"
) -> None:
    """DDL for the warehouse activity table (reference
    create_summarized_activities_table.sql:10-90 — 46 business columns
    + 2 audit timestamps). Parquet-backed with date partitioning in
    place of the reference's four B-tree indexes (:93-96)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS garmin")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
            activity_id BIGINT NOT NULL,
            activity_name STRING,
            activity_type STRING,
            sport_type STRING,
            begin_timestamp TIMESTAMP,
            start_time_gmt TIMESTAMP,
            start_time_local TIMESTAMP,
            distance_km DECIMAL(10,3),
            duration_seconds DECIMAL(10,3),
            elapsed_duration_seconds DECIMAL(10,3),
            moving_duration_seconds DECIMAL(10,3),
            avg_speed_ms DECIMAL(10,3),
            max_speed_ms DECIMAL(10,3),
            avg_hr INT,
            max_hr INT,
            avg_run_cadence DECIMAL(10,3),
            max_run_cadence DECIMAL(10,3),
            steps BIGINT,
            calories DECIMAL(10,3),
            bmr_calories DECIMAL(10,3),
            aerobic_training_effect DECIMAL(4,1),
            anaerobic_training_effect DECIMAL(4,1),
            avg_stride_length DECIMAL(10,3),
            elevation_gain_m DECIMAL(10,3),
            elevation_loss_m DECIMAL(10,3),
            min_elevation_m DECIMAL(10,3),
            max_elevation_m DECIMAL(10,3),
            avg_power DECIMAL(10,3),
            max_power DECIMAL(10,3),
            norm_power DECIMAL(10,3),
            training_effect_label STRING,
            activity_training_load DECIMAL(10,3),
            lap_count INT,
            favorite BOOLEAN,
            start_latitude DECIMAL(10,6),
            start_longitude DECIMAL(10,6),
            end_latitude DECIMAL(10,6),
            end_longitude DECIMAL(10,6),
            location_name STRING,
            device_id BIGINT,
            manufacturer STRING,
            vo2_max_value DECIMAL(4,1),
            water_estimated DECIMAL(10,3),
            moderate_intensity_minutes INT,
            vigorous_intensity_minutes INT,
            created_at TIMESTAMP,
            updated_at TIMESTAMP,
            start_date DATE
        )
        USING parquet
        PARTITIONED BY (start_date)
        """
    )


def write_bucketed_table(
    df,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) parquet
    table — the warehouse layout that makes repeated big-big joins on
    ``bucket_col`` shuffle-free: two tables bucketed the same way
    co-locate matching keys file-by-file, so a join on the bucket
    column needs NO Exchange (and with ``sort=True`` no Sort either,
    just a zip of pre-sorted buckets).

    This is the Spark analog of the reference warehouse's B-tree
    indexes on the join keys (create_summarized_activities_table
    .sql:93-96): pay the layout cost once at write time, amortize it
    over every downstream join/aggregate on that key. At 100 TB the
    bucket count is the parallelism floor of downstream joins — size
    it to cluster cores x small multiple (e.g. 4096 for a 1000-
    executor fleet), NOT to this demo's 8.

    Bucketing requires the table catalog (``saveAsTable``); ``path``
    pins the parquet files to an explicit location so tests/demos
    stay out of the default warehouse dir. (:func:`load_table` is the
    general catalog loader with the same ``bucket_by`` lever; this
    writer adds the path pinning plus the one-file-per-bucket layout
    below.)

    The pre-write ``repartition(n_buckets, key)`` uses the same
    Murmur3-mod hash as the bucket spec, so every write task receives
    exactly one bucket and each bucket lands in ONE file — the layout
    under which Spark can also honor the written sort order at scan
    time (``spark.sql.legacy.bucketedTableScan.outputOrdering``; with
    multiple files per bucket the scan would have to merge-sort and
    the ordering claim would be wrong, which is why that conf is
    ignored otherwise).
    """
    writer = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer.saveAsTable(table)
