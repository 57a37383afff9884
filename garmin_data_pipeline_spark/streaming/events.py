"""Structured Streaming ingest (SURVEY.md §2.10, build plan §7 step 9).

The reference is strictly batch truncate-and-reload; its aspirational
scheduling ("run nightly via cron", ETL README) is re-expressed here as
a continuous ingest: a file-source stream over event shards feeding the
same daily-summary semantics the UDS pipeline computes in batch — one
row per (day, event_type) with counts and value sums, plus a stateful
sessionization operator the reference has no equivalent for.

Scale notes:
- Watermarking bounds state: late events older than the watermark are
  dropped instead of growing the store forever.
- The tumbling-window aggregate shuffles once on (window, event_type);
  state lives in the state store keyed the same way.
- ``applyInPandasWithState`` is the escape hatch for custom stateful
  logic (per-user sessionization with an inactivity gap) — Arrow-
  batched, partitioned by user, timeout-driven eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over event parquet shards. New files landing
    under ``path`` become micro-batches; schema is declared, never
    inferred (a streaming source must not sample)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def daily_event_summary(
    events: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Tumbling daily (window, event_type) aggregate with a watermark —
    the streaming analog of the UDS one-row-per-day summary
    (SURVEY.md §2.10). Works on both batch and streaming frames."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", "1 day").alias("day_window"),
            "event_type",
        )
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.to_date(F.col("day_window.start")).alias("calendarDate"),
            "event_type",
            "event_count",
            "total_value",
            "approx_users",
        )
    )


def start_daily_summary_stream(
    spark: SparkSession,
    source_path: str,
    checkpoint: str,
    sink_table: str = "events_daily",
    available_now: bool = True,
    sink: str = "memory",
):
    """Wire source -> daily summary -> sink with a checkpoint.

    ``sink='memory'`` registers an in-memory query-able table (tests);
    ``sink='table'`` appends to a catalog parquet table (production —
    exactly-once via the checkpoint). ``availableNow`` processes the
    current backlog then stops — the streaming equivalent of the
    reference's one-shot batch run, but restartable/incremental."""
    events = read_events_stream(spark, source_path)
    summary = daily_event_summary(events)
    writer = summary.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    if sink == "table":
        return writer.toTable(sink_table)
    return writer.format("memory").queryName(sink_table).start()


def dedupe_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    ``dedupe_exact`` (SURVEY.md A4): at-least-once file sources and
    replayed shards deliver duplicate events; state keyed on ``keys``
    drops them, and the watermark bounds how long each key is
    remembered (state store size = keys seen within the watermark
    horizon, not all time).

    Uses ``dropDuplicatesWithinWatermark`` so two duplicates stamped
    with slightly different event times still collapse (the common
    replay case), falling back to plain ``dropDuplicates`` semantics
    on batch frames.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(keys)


def attribute_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    window_minutes: int = 60,
    watermark: str = "2 hours",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Click->purchase attribution: each purchase matched to every
    click by the SAME user within the preceding ``window_minutes``
    (click_ts in [purchase_ts - W, purchase_ts]) — the canonical
    stream-stream interval join.

    Streaming frames: both sides get an event-time watermark and the
    join carries the time-interval predicate, so Spark bounds BOTH
    state stores to watermark + interval (late rows age out instead of
    accumulating forever) — this is Structured Streaming's
    stream-stream inner equi-join with an interval condition, the
    shape its state-cleanup planning is built for.

    Batch frames: the same semantics via the bin-bucketed
    :func:`~garmin_data_pipeline_spark.operators.joins.join_range`
    composition (explode intervals into time bins, hash-join on
    (user, bin), exact BETWEEN refilter) — a plan AQE can size,
    instead of a nested-loop theta join. Output columns:
    (purchase_id, user_id, purchase_ts, purchase_value, click_id,
    click_ts).
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user_id"),
        F.col("ts").alias("click_ts"),
    )
    out_cols = [
        "purchase_id",
        "user_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    ]
    if purchases.isStreaming or clicks.isStreaming:
        pw = p.withWatermark("purchase_ts", watermark)
        cw = c.withWatermark("click_ts", watermark)
        cond = (
            (F.col("user_id") == F.col("click_user_id"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts")
                - F.expr(f"INTERVAL {window_minutes} MINUTES")
            )
            & (F.col("click_ts") <= F.col("purchase_ts"))
        )
        return pw.join(cw, cond, "inner").select(*out_cols)

    from ..operators.joins import join_range

    pr = p.withColumn(
        "win_start",
        F.col("purchase_ts")
        - F.expr(f"INTERVAL {window_minutes} MINUTES"),
    )
    joined = join_range(
        c.withColumnRenamed("click_user_id", "user_id"),
        pr,
        ts_col="click_ts",
        start_col="win_start",
        end_col="purchase_ts",
        by=["user_id"],
        bin_seconds=bin_seconds,
    )
    return joined.select(*out_cols)


def overlap_intervals(
    a: DataFrame,
    b: DataFrame,
    start_a: str,
    end_a: str,
    start_b: str,
    end_b: str,
    by: tuple[str, ...] = ("user_id",),
    max_interval_minutes: int = 120,
    watermark: str = "2 hours",
    bin_seconds: int = 86400,
) -> DataFrame:
    """Stream-stream interval x interval OVERLAP join (st8) — the
    streaming twin of
    :func:`~garmin_data_pipeline_spark.operators.joins.join_interval_overlap`
    (j9), completing the interval family one step past st4's
    point-in-interval attribution. Closed-interval semantics:
    touching intervals match with ``overlap_us = 0``.

    BOTH frames first DROP intervals longer than
    ``max_interval_minutes`` — that cap is the state-bound contract,
    not a convenience: with durations <= D, any overlapping pair
    satisfies ``|start_b - start_a| <= D`` (overlap means
    start_b <= end_a <= start_a + D and symmetrically), so the
    streaming join carries that bound as an explicit condition on
    the two WATERMARKED start columns and Spark can age both state
    stores out at watermark + D. An uncapped interval stream cannot
    bound state: a still-open year-long interval forces a year of
    the other side to stay buffered.

    Batch frames apply the identical cap and delegate to the
    bin-bucketed ``join_interval_overlap`` (hash join, dedup by
    overlap-start bin) — like for like, which is what the
    stream-vs-batch equivalence test compares. Output columns:
    ``by + [start_a, end_a, start_b, end_b, overlap_us]``.

    Watermarks reject TIMESTAMP_NTZ — cast interval bounds to
    TIMESTAMP upstream (UTC session keeps wall-clock equality with
    batch NTZ plans)."""
    from ..functions.durations import epoch_micros
    from ..operators.joins import join_interval_overlap

    by = list(by)
    cap_us = max_interval_minutes * 60 * 1_000_000

    def us(df, col):
        return epoch_micros(col, df.schema[col].dataType)

    ac = a.filter(us(a, end_a) - us(a, start_a) <= cap_us)
    bc = b.filter(us(b, end_b) - us(b, start_b) <= cap_us)
    out_cols = by + [start_a, end_a, start_b, end_b, "overlap_us"]

    if a.isStreaming or b.isStreaming:
        aw = ac.withWatermark(start_a, watermark)
        bw = bc.withWatermark(start_b, watermark)
        bound = F.expr(f"INTERVAL {max_interval_minutes} MINUTES")
        cond = (
            (bw[start_b] >= aw[start_a] - bound)
            & (bw[start_b] <= aw[start_a] + bound)
            & (aw[start_a] <= bw[end_b])
            & (bw[start_b] <= aw[end_a])
        )
        for k in by:
            cond = cond & (aw[k] == bw[k])
        ov_start = F.greatest(us(a, start_a), us(b, start_b))
        ov_end = F.least(us(a, end_a), us(b, end_b))
        joined = aw.join(bw, cond, "inner").withColumn(
            "overlap_us", ov_end - ov_start
        )
        return joined.select(
            *[aw[k] for k in by],
            start_a,
            end_a,
            start_b,
            end_b,
            "overlap_us",
        )

    return join_interval_overlap(
        ac, bc, start_a, end_a, start_b, end_b,
        by=by, bin_seconds=bin_seconds,
    ).select(*out_cols)


# ---------------------------------------------------------------------------
# Custom stateful operator: per-user sessionization
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize(
    events: DataFrame, gap_minutes: int = 30, timeout_minutes: int = 60
) -> DataFrame:
    """Split each user's event stream into sessions separated by
    ``gap_minutes`` of inactivity.

    Streaming frames use ``applyInPandasWithState`` (state = the open
    session per user, closed either by a large-enough gap inside a
    batch or by processing-time timeout). Batch frames get the
    window-function equivalent (lag + cumulative session id) so the
    same API serves both — and the batch form is what the DuckDB
    oracle can check.
    """
    # No event time -> no session, in BOTH modes: a streaming frame
    # could never assign such an event (the watermark needs event
    # time), and in batch a NULL ts would sort NULLS FIRST on Spark
    # but NULLS LAST on most SQL engines — silently different session
    # boundaries. Dropping them is the only engine-portable contract.
    events = events.filter(F.col("ts").isNotNull())
    if not events.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.lag("ts").over(w)
        # Microsecond precision so the gap predicate is exact (and
        # matches a DuckDB epoch_us-difference oracle bit-for-bit).
        # timestamp_diff is one JVM intrinsic accepting BOTH timestamp
        # types; the r4 plan evaluated epoch_micros twice per row,
        # which on the testdata's TIMESTAMP_NTZ shape meant ~10 field
        # extractions including two date_format string renders — the
        # st2 bench regression (r3 0.50s -> r4 0.76s). Semantics:
        # wall-clock difference in the session zone (engine default
        # UTC => identical to an instant difference; NTZ inputs are
        # session-tz independent by construction).
        new_session = (
            F.timestamp_diff("MICROSECOND", gap, F.col("ts"))
            > gap_minutes * 60 * 1_000_000
        ) | gap.isNull()
        with_id = events.withColumn(
            "session_id",
            F.sum(new_session.cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        return (
            with_id.groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count("*").alias("events"),
                F.sum("value").alias("total_value"),
            )
            .drop("session_id")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s0, last, n, tot = state.get
                closed.append((user_id, s0, last, n, tot))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            if state.exists:
                s0, last, n, tot = state.get
            else:
                s0 = last = None
                n, tot = 0, 0.0
            for ts, val in zip(rows["ts"], rows["value"]):
                ts = ts.to_pydatetime()
                if last is not None and (ts - last).total_seconds() > gap_s:
                    closed.append((user_id, s0, last, n, tot))
                    s0, n, tot = ts, 0, 0.0
                if s0 is None:
                    s0 = ts
                last = ts
                n += 1
                tot += float(val) if val == val else 0.0
            state.update((s0, last, n, tot))
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "events",
                "total_value",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def enrich_events(
    events: DataFrame,
    customers: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each event is
    joined to the static customer dimension (user_id -> market
    segment), then aggregated per (tumbling window, segment).

    Streaming frames: the stream-static join is STATELESS — Spark
    re-plans the static side per micro-batch and broadcasts it, so
    unlike the stream-stream join (see :func:`attribute_purchases`)
    there is no join state store at all; only the downstream windowed
    aggregate keeps state, bounded by the watermark. This is the
    canonical enrichment topology for a 100 TB/day event firehose:
    dims live in the warehouse, refresh per batch, never shuffle the
    stream.

    Batch frames: the identical code path (``F.window`` works in
    batch; only the watermark call is gated), so batch backfill and
    the live stream share one definition — the driver-checked twin.

    Output: (day, mktsegment, n_events, total_value) with the decimal
    accumulation discipline for cross-engine hash parity.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    e = events.select("user_id", "ts", "value")
    if events.isStreaming:
        e = e.withWatermark("ts", watermark)
    joined = e.join(F.broadcast(dim), "user_id", "inner")
    return (
        joined.groupBy(
            F.window("ts", window).alias("w"), "mktsegment"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "mktsegment",
            "n_events",
            "total_value",
        )
    )


def start_upsert_stream(
    spark: SparkSession,
    source_path: str,
    table: str,
    checkpoint: str,
    staging_dir: str | None = None,
    validate_partition_stability: bool = True,
):
    """Continuous MERGE ingest: stream event shards and upsert each
    micro-batch into a day-partitioned warehouse table keyed by
    ``event_id`` (st6 — the standing-pipeline shape: at-least-once
    file delivery + keyed idempotent upsert = exactly-once table
    contents).

    ``foreachBatch`` is the right tool here, not a built-in sink:
    parquet's append sink cannot replace rows, and the merge needs a
    batch-scoped view of the target. Each micro-batch pre-dedupes
    itself (same key may repeat within a batch), then
    :func:`~garmin_data_pipeline_spark.sources.sinks.merge_upsert`
    rewrites ONLY the day-partitions the batch touches (dynamic
    partition overwrite) — a day of late events rewrites 1/365 of a
    year-scale table, and replayed shards converge to the same table
    state instead of duplicating. Checkpointing makes the replay
    window [last commit, crash] and the upsert makes that window
    harmless.

    ``validate_partition_stability`` defaults ON here (it is opt-in
    on the batch :func:`merge_upsert`): the stream derives ``day``
    from the event ``ts``, and a late CORRECTION that changes a key's
    ts across midnight moves its partition — exactly the drift the
    partition-pruned merge cannot absorb (the old-day row would go
    stale and the table would hold the key twice). The cost is one
    key-semi-join against the unpruned target per micro-batch —
    bounded by batch size on the probe side; disable only for tables
    whose partition key is provably immutable (r7 verdict item 7).
    """
    from garmin_data_pipeline_spark.sources.sinks import merge_upsert

    events = read_events_stream(spark, source_path).withColumn(
        "day", F.to_date("ts")
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        if not s.catalog.tableExists(table):
            # The creation path must uphold the same exactly-once
            # contract as the merge path: at-least-once delivery can
            # duplicate event_ids WITHIN the very first batch, and a
            # direct write would persist them (merge_upsert only
            # collapses dups when the partition is touched again).
            # Keep the latest-ts row per key — identical tiebreak to
            # merge_upsert's window (ADVICE r6), including its stable
            # payload-hash final key (ADVICE r7): first-batch
            # duplicate event_ids with EQUAL ts but different payloads
            # must resolve the same way on every replay.
            from pyspark.sql.window import Window

            from garmin_data_pipeline_spark.sources.sinks import (
                tiebreak_hash,
            )

            w = Window.partitionBy("event_id").orderBy(
                F.col("ts").desc(),
                tiebreak_hash(batch.schema).asc(),
            )
            deduped = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            deduped.write.partitionBy("day").saveAsTable(table)
            return
        merge_upsert(
            s,
            table,
            batch,
            keys=["event_id"],
            order_col="ts",
            partition_col="day",
            staging_dir=staging_dir,
            validate_partition_stability=validate_partition_stability,
        )

    return (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via the BUILT-IN session_window
    aggregate (st7) — the fully-JVM-side alternative to
    :func:`sessionize`'s applyInPandasWithState: session-merge state
    lives in the state store keyed by (user, session), evicted when
    the watermark passes a session's close. Use THIS form whenever
    the per-session result is expressible as an aggregate (count /
    sum / min / max); reach for ``applyInPandasWithState`` only when
    per-event custom logic inside the session is genuinely needed.

    Emits one row per CLOSED session (append mode): late events
    inside the watermark horizon still merge/extend their session;
    events older than the watermark are dropped.
    """
    return (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes")
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "events",
            "total_value",
        )
    )
