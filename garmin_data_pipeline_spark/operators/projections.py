"""Projection operators, incl. data-dependent ones (SURVEY.md §2.2).

P3/P4 (drop all-null / drop single-unique-value columns) are
*data-dependent projections*: the output schema depends on the data, so
one eager metadata pass (a single aggregate job over the table) is
unavoidable. We isolate that pass here — ONE job computing all column
stats at once (not one job per column), after which the projection
itself is lazy again. At 100 TB the stats pass is a full scan; callers
that already know the live columns should pass them explicitly instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """Drop columns whose every value is NULL (reference
    ``dropna(axis=1, how='all')``, transform_all_datasets.py:47,
    transform_running_data.py:48, WRANGLE cell 6).

    Single aggregate job: count(col) for every column in one pass
    (map-side partial aggregation; no shuffle beyond the final reduce).
    """
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*keep)


def drop_constant_columns(df: DataFrame, max_distinct: int = 1) -> DataFrame:
    """Drop columns with <= ``max_distinct`` distinct non-null values
    (reference ``nunique()==1`` drops, WRANGLE cells 29,95).

    Uses one pass of approx_count_distinct to pre-filter (cheap at
    scale) and exact countDistinct only for candidate columns.
    """
    approx = df.agg(
        *[F.approx_count_distinct(c).alias(c) for c in df.columns]
    ).first()
    # approx_count_distinct error ~2% — anything reported well above the
    # threshold is definitely non-constant; verify only the candidates.
    candidates = [c for c in df.columns if approx[c] <= max_distinct * 2 + 2]
    if candidates:
        exact = df.agg(
            *[F.countDistinct(c).alias(c) for c in candidates]
        ).first()
        dropped = {c for c in candidates if exact[c] <= max_distinct}
    else:
        dropped = set()
    return df.select(*[c for c in df.columns if c not in dropped])


def clean_header(name: str) -> str:
    """The reference's header normalization (transform_all_datasets.py:51-52,
    WRANGLE cell 7): spaces -> underscores, strip non-alphanumerics."""
    return re.sub(r"[^0-9a-zA-Z_]", "", name.replace(" ", "_"))


def clean_headers(df: DataFrame) -> DataFrame:
    """Apply :func:`clean_header` to every column (driver-side rename —
    a pure projection, no job)."""
    return df.toDF(*[clean_header(c) for c in df.columns])


def drop_last_columns(df: DataFrame, n: int) -> DataFrame:
    """Positional drop ``iloc[:, :-n]`` (reference WRANGLE cell 46).
    Position == schema order, deterministic in Spark."""
    return df.select(*df.columns[:-n])


def reorder_after(df: DataFrame, col: str, anchor: str) -> DataFrame:
    """Move ``col`` immediately after ``anchor`` (reference insert-after
    pattern, transform_running_data.py:84-88). Pure projection."""
    cols = [c for c in df.columns if c != col]
    idx = cols.index(anchor) + 1
    return df.select(*cols[:idx], col, *cols[idx:])
