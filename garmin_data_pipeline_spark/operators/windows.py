"""Window operators: cumulative sums, lag-with-fill, LOCF forward-fill,
daily densification (SURVEY.md §2.5 W1-W5).

Every reference op that leaned on implicit pandas row order (cumsum,
shift, ffill, reindex) gets an explicit deterministic ordering here.

Scale notes:
- All of these shuffle once on the partition key; the per-partition
  sort is local. Unpartitioned windows (a global ffill) serialize onto
  one task — fine for a per-user daily series (hundreds of rows), wrong
  for a billion-row table; callers must supply a partition key at scale.
- Densification generates the date scaffold *per group* with
  ``sequence()`` — no driver-side date_range, no cross join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec


def _window(
    partition_by: Sequence[str], order_by: Sequence[Column | str]
) -> WindowSpec:
    if partition_by:
        return Window.partitionBy(*partition_by).orderBy(*order_by)
    return Window.orderBy(*order_by)


def cumulative_sum(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    out_col: str,
) -> DataFrame:
    """Grouped running cumulative sum (reference Weekly/Monthly
    cumulative run minutes, transform_running_data.py:194,199).
    rowsBetween(unboundedPreceding, currentRow) — order must include a
    unique tiebreaker for determinism."""
    w = _window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def cumulative_sum_sharded(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    bucket_col: Column,
    out_col: str,
) -> DataFrame:
    """Skew-hardened grouped cumulative sum — identical output to
    :func:`cumulative_sum`, two-level physical shape.

    A window partitioned on a hot key puts that key's entire history in
    one task (AQE cannot split window partitions). Here the running sum
    is computed per (key, bucket) — a partitioned window whose largest
    group is ``1/n_buckets`` of the hot key — then made global by
    adding each bucket's exclusive prefix of per-bucket totals, itself
    a window over ≤ #buckets rows per key. Same trick as the sharded
    sequence packer (sampling.pack_sequences_sharded); one extra
    shuffle on (key, bucket) buys an n_buckets× cut in the max task.

    ``bucket_col`` MUST be monotone non-decreasing w.r.t. ``order_by``
    within each key (e.g. month(Date) when ordering by Date) — bucket
    boundaries then cut the order into contiguous runs, which is what
    makes local-cumsum + bucket-prefix equal the global cumsum. Ties in
    ``order_by`` must not straddle a bucket boundary; a unique
    tiebreaker in ``order_by`` (standard for determinism) guarantees
    that.
    """
    keys = list(partition_by)
    bucketed = df.withColumn("__bucket", bucket_col)
    w_local = (
        Window.partitionBy(*keys, "__bucket")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__local_cum", F.sum(value_col).over(w_local))
    totals = bucketed.groupBy(*keys, "__bucket").agg(
        F.sum(value_col).alias("__bucket_total")
    )
    w_prefix = (
        Window.partitionBy(*keys)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Keep the raw prefix (no coalesce): its NULL-ness distinguishes
    # "no prior non-NULL bucket" from "prior total is zero", which the
    # final combine needs to reproduce window-sum NULL semantics.
    offsets = totals.withColumn(
        "__offset", F.sum("__bucket_total").over(w_prefix)
    ).select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col("__bucket").alias("__k_bucket"),
        "__offset",
    )
    # eqNullSafe: a NULL key or NULL bucket value is still a group and
    # must find its offset (a plain equi-join would null out its cumsum).
    cond = [local[k].eqNullSafe(offsets[f"__k_{k}"]) for k in keys]
    cond.append(local["__bucket"].eqNullSafe(offsets["__k_bucket"]))
    joined = local.join(offsets, cond, "left")
    # Window-sum NULL contract: the direct cumsum is NULL only while NO
    # non-NULL value has appeared for the key. A bucket whose leading
    # rows are NULL has __local_cum NULL, but if an earlier bucket
    # already contributed values the direct cumsum there is that prior
    # total — so NULL survives only when BOTH parts are NULL.
    combined = F.when(
        F.col("__local_cum").isNull() & F.col("__offset").isNull(),
        F.lit(None),
    ).otherwise(
        F.coalesce(F.col("__local_cum"), F.lit(0))
        + F.coalesce(F.col("__offset"), F.lit(0))
    )
    return joined.withColumn(out_col, combined).select(
        *df.columns, out_col
    )


def lag_with_default(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    out_col: str,
    default: float = 0,
) -> DataFrame:
    """shift(1) with fill (reference Weekly_Mins_Prior_to_Run,
    transform_running_data.py:195,200)."""
    w = _window(partition_by, order_by)
    return df.withColumn(
        out_col, F.lag(F.col(value_col), 1, default).over(w)
    )


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """LOCF forward-fill (reference ffill of vo2MaxValue/maxMet,
    WRANGLE cell 101, MERGE cell 24): ``last(col, ignorenulls=True)``
    over an unbounded-preceding frame."""
    w = _window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def densify_daily(
    df: DataFrame,
    date_col: str,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Build the complete daily date scaffold spanning [min, max] of
    ``date_col`` (per group if ``partition_by``) and left-join the
    observations onto it (reference ``pd.date_range`` + ``reindex``,
    WRANGLE cell 99, MLPREP cell 45).

    Spark-first shape: ``sequence(min, max, interval 1 day)`` computed
    inside a (grouped) aggregate, then ``explode`` — the scaffold is
    generated distributed, sized by data, never collected. The join is
    on (group, date): with few groups it broadcasts; at scale it's a
    sort-merge on the same key the caller will ffill over.
    """
    group = list(partition_by)
    span = df.groupBy(*group).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    scaffold = span.select(
        *group,
        F.explode(
            F.sequence(
                F.col("__d0"), F.col("__d1"), F.expr("interval 1 day")
            )
        ).alias(date_col),
    )
    return scaffold.join(df, group + [date_col], "left")


def densify_daily_ffill(
    df: DataFrame,
    date_col: str,
    fill_cols: Sequence[str],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Densify to a gap-free daily grid then LOCF-fill ``fill_cols``
    (the reference's reindex+ffill composite, WRANGLE cell 99)."""
    dense = densify_daily(df, date_col, partition_by)
    return forward_fill(dense, fill_cols, list(partition_by), [date_col])
