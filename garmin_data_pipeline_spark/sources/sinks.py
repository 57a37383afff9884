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

from pyspark.sql import Column, DataFrame, SparkSession
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


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (columnar alternative the warehouse can serve to Hive/
    Trino consumers; same partition-pruning layout levers as parquet).
    Beyond-reference: the reference emits CSV + PostgreSQL only."""
    writer = df.write.mode("overwrite").format("orc")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — predicate pushdown + column pruning work exactly as
    for parquet (ORC carries min/max stripe stats and bloom filters)."""
    return spark.read.orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    partition_by: list[str] | None = None,
) -> None:
    """JSON-Lines sink — the lingua franca of LLM training corpora
    (one JSON object per line; Spark's native ``json`` format IS
    JSONL). Beyond-reference: the reference emits CSV + PostgreSQL
    only.

    gzip by default: JSONL text compresses 5-10x and every trainer
    ingests .jsonl.gz. Note gzip is NOT splittable — fine for
    training shards (the shard is the parallelism unit, see
    :func:`export_training_shards`), but for ad-hoc re-analysis in
    Spark prefer parquet or ``compression=None``.
    """
    writer = df.write.mode("overwrite").format("json")
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL scan. ALWAYS pass an explicit schema at scale: without
    one Spark runs a full inference pre-pass over every byte of the
    corpus — at 100 TB that is a second full read before the first
    real job, and a single malformed line can flip a column to
    string. With a schema, corrupt lines land in NULLs (default
    PERMISSIVE mode) instead of failing the scan — the same
    corrupt-data posture as the multimodal decoders."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    salt: str = "shuffle-v1",
    compression: str | None = "gzip",
) -> None:
    """Export a corpus as ``n_shards`` deterministically-shuffled
    JSONL shards — the canonical hand-off from a data pipeline to a
    trainer's data loader.

    Shard membership is a pure function of (key, salt): the shard id
    is a RANGE bucket of the salted 32-bit shuffle hash
    (``hash * n div 2^32`` — contiguous in shuffle order, balanced
    for a uniform hash), NOT a sampled ``repartitionByRange``
    boundary, whose RangePartitioner samples depend on the INPUT
    partitioning and would make "the same corpus" shard differently
    on a laptop vs a cluster. Rows sort by (shuffle_key, key) inside
    each shard, so same corpus + same salt ⇒ byte-identical shard
    contents regardless of how the input was partitioned (tested by
    exporting under different input partitionings) and a training
    run is reproducible from the manifest alone. Output layout:
    ``shard=K/`` directories (one file each — every shard lands
    wholly in one task), per-shard gzip (the shard is the trainer's
    parallelism unit, so non-splittable compression is safe).
    """
    from garmin_data_pipeline_spark.operators.sampling import (
        _salted_hash,
    )

    key = F.col(key_col)
    shuffle_key = _salted_hash(key_col, salt)
    shard = (
        (shuffle_key * n_shards / F.lit(1 << 32))
        .cast("bigint")
        .alias("shard")
    )
    out = (
        df.withColumn("shuffle_key", shuffle_key)
        .withColumn("shard", shard)
        # one Exchange; hash collisions may co-locate two shards in
        # one task, but each shard is never SPLIT across tasks, so
        # partitionBy('shard') writes exactly one file per shard
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(F.col("shard"), F.col("shuffle_key"), key)
        .drop("shuffle_key")
    )
    writer = out.write.mode("overwrite").format("json").partitionBy("shard")
    if compression:
        writer = writer.option("compression", compression)
    writer.save(path)


def _contains_map(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def tiebreak_hash(schema, exclude: tuple = ()) -> Column:
    """Stable full-payload xxhash64 for dedup/merge tiebreaks, over
    sorted column names so it never depends on projection order.

    Spark's xxhash64 (like hash) raises AnalysisException on MapType
    input, including maps nested inside arrays or structs. Excluding
    those columns (the r8 fix) reintroduced the nondeterminism the
    tiebreak exists to prevent — two updates with equal (order_col,
    keys) differing ONLY in a map column tied, so replays could
    converge to different table states — and only covered TOP-LEVEL
    maps (array<map>/struct-with-map still raised). Instead,
    map-bearing columns are hashed over a canonicalized JSON form
    (ADVICE r9): a top-level map becomes its entry list sorted by
    key, so logically-equal maps built in different entry orders hash
    alike; map-bearing nested types (and maps whose VALUES contain
    further maps — entry structs with unorderable fields cannot be
    sort_array'd) fall back to to_json of the whole cell, which is
    deterministic for any fixed stored entry order (parquet
    round-trips preserve it) and — the load-bearing property — always
    DIFFERS between payloads that differ."""
    from pyspark.sql.types import MapType

    cols = []
    for f in sorted(schema.fields, key=lambda f: f.name):
        if f.name in exclude:
            continue
        c = F.col(f.name)
        if isinstance(f.dataType, MapType) and not _contains_map(
            f.dataType.valueType
        ):
            c = F.to_json(F.sort_array(F.map_entries(c)))
        elif _contains_map(f.dataType):
            c = F.to_json(c)
        cols.append(c)
    return F.xxhash64(*cols)


def merge_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    partition_col: str | None = None,
    staging_dir: str | None = None,
    validate_partition_stability: bool = False,
) -> None:
    """MERGE/upsert into a parquet warehouse table: rows in
    ``updates`` replace target rows with the same ``keys`` (latest
    ``order_col`` wins; ties prefer the update), new keys append.

    INVARIANT: a key's ``partition_col`` value must never change
    between the target and an update. The merge prunes the target
    scan to the partitions the update batch touches, so a key that
    moved partitions would leave its old row stale in the old
    partition (the new row lands correctly — the table then holds a
    duplicate key). This is the same contract every partition-pruned
    MERGE (Delta/Iceberg with partition predicates) imposes; derive
    the partition from an immutable attribute of the key (e.g.
    ``day = to_date(event ts)`` keyed by event_id). Set
    ``validate_partition_stability=True`` to enforce it with one
    key-semi-join against the unpruned target (a full-table key scan
    — fine in tests and small tables, measurable at 100 TB, hence
    opt-in).

    NULL partition values in ``updates`` are handled null-safely:
    target rows in the NULL partition (__HIVE_DEFAULT_PARTITION__)
    are included in the merge whenever the batch touches it, so
    existing keys there survive (a plain ``isin`` would drop them
    from the merge while dynamic overwrite still replaced that
    partition — silent deletion).

    The reference explicitly rejects the upsert load strategy
    (db_utils.py raises on ``load_strategy: upsert``;
    pipelines/config.py mirrors that) — this supplies it, designed
    for scale rather than row-at-a-time SQL MERGE:

    - With ``partition_col``, only partitions that actually contain
      updated keys are rewritten: the update batch's distinct
      partition values (a small driver-side list — one value per
      touched partition, NOT per row) prune the target scan, and
      ``partitionOverwriteMode=dynamic`` replaces just those
      partitions at commit. A 100-partition day-keyed table absorbing
      one late day rewrites 1/100 of its bytes.
    - Without it, the merge is a full rewrite through staging (the
      honest cost of an unpartitioned upsert — document, don't hide).

    The merged result must be materialized to ``staging_dir`` before
    the overwrite: Spark (correctly) refuses plans that overwrite a
    path they are still reading. Write-staging-then-replace also makes
    the swap crash-safe — a failure before the final insert leaves the
    target untouched.
    """
    prefer_update = F.col("__src").desc()
    updates = updates.withColumn("__src", F.lit(1))
    staging = staging_dir or f"/tmp/spark-merge-staging-{table}"

    current = spark.table(table).withColumn("__src", F.lit(0))
    if partition_col is not None:
        touched = [
            r[0]
            for r in updates.select(partition_col).distinct().collect()
        ]
        non_null = [t for t in touched if t is not None]
        # isin() is three-valued: NULL partition values never match,
        # so build the prune predicate null-safely (ADVICE r6).
        prune = (
            F.col(partition_col).isin(non_null)
            if non_null
            else F.lit(False)
        )
        if len(non_null) != len(touched):
            prune = prune | F.col(partition_col).isNull()
        if validate_partition_stability:
            moved = (
                spark.table(table)
                .filter(~F.coalesce(prune, F.lit(False)))
                .select(*keys)
                .join(updates.select(*keys).distinct(), keys, "semi")
                .limit(1)
                .count()
            )
            if moved:
                raise ValueError(
                    "merge_upsert: update batch contains key(s) whose "
                    f"{partition_col!r} differs from the target row's "
                    "— the old-partition row would go stale (see the "
                    "partition-stability invariant in the docstring)"
                )
        current = current.filter(prune)

    from pyspark.sql.window import Window

    # Final tiebreak: a stable hash of the full payload (sorted
    # column order so it never depends on projection order). Without
    # it, two UPDATE rows with the same key and order_col (both
    # __src=1 — at-least-once redelivery within one batch) resolve
    # nondeterministically and replays could converge to different
    # table states (ADVICE r7, flagged on the creation path; the
    # hazard is identical here). Map-bearing columns are hashed over
    # a canonicalized JSON form — see tiebreak_hash.
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(),
        prefer_update,
        tiebreak_hash(updates.schema, exclude=("__src",)).asc(),
    )
    merged = (
        current.unionByName(updates)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    merged.write.mode("overwrite").parquet(staging)

    staged = spark.read.parquet(staging)
    if partition_col is not None:
        mode_key = "spark.sql.sources.partitionOverwriteMode"
        old_mode = spark.conf.get(mode_key, "static")
        spark.conf.set(mode_key, "dynamic")
        try:
            staged.createOrReplaceTempView("__merge_staged")
            # catalog order: data columns first, partition column last
            cols = ", ".join(
                f"`{c}`" for c in spark.table(table).columns
            )
            spark.sql(
                f"INSERT OVERWRITE TABLE {table} SELECT {cols} "
                "FROM __merge_staged"
            )
        finally:
            spark.conf.set(mode_key, old_mode)
            spark.catalog.dropTempView("__merge_staged")
    else:
        staged.write.mode("overwrite").saveAsTable(table)
