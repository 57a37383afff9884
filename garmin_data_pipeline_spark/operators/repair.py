"""Keyed data repairs (SURVEY.md §2.8 F28).

The reference patches bad rows by *positional index*
(``combined_sleep.loc[109, 'calendarDate'] = '2024-03-14'``, WRANGLE
cell 39) — Spark has no row identity, so positional fixes must be
re-expressed as data-derived rules. For the sleep dataset the two
patched rows are entirely blank placeholder records whose hand-assigned
dates are exactly the days missing from the otherwise-gap-free daily
sequence; :func:`patch_null_dates_from_gaps` derives that assignment
instead of hardcoding indices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def patch_null_dates_from_gaps(df: DataFrame, date_col: str) -> DataFrame:
    """Assign each null-``date_col`` row one of the calendar days
    missing from the daily sequence spanned by the non-null rows.

    Matching is rank-to-rank: the k-th null row (ordered by source
    shard — ``input_file_name()`` — so earlier shards take earlier
    gaps) gets the k-th missing day ascending. Deterministic, driver-
    free, and exact for the reference data (two blank rows, two gaps).
    If there are more null rows than gaps the extras keep a null date.
    """
    with_file = df.withColumn("__file", F.input_file_name())
    good = with_file.filter(F.col(date_col).isNotNull())
    nulls = with_file.filter(F.col(date_col).isNull())

    present = good.select(date_col).distinct()
    missing = (
        present.agg(
            F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("__d0"), F.col("__d1"), F.expr("interval 1 day")
                )
            ).alias(date_col)
        )
        .join(present, date_col, "left_anti")
        .withColumn(
            "__rk", F.row_number().over(Window.orderBy(date_col))
        )
    )
    ranked_nulls = nulls.withColumn(
        "__rk", F.row_number().over(Window.orderBy("__file"))
    ).drop(date_col)
    patched = ranked_nulls.join(missing, "__rk", "left").drop("__rk")
    return good.unionByName(patched).drop("__file")
