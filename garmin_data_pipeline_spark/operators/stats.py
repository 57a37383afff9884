"""Profiling / stats operators (SURVEY.md §2.4 A6-A11) and imputation.

All single-pass aggregates (map-side combine, one reduce) — the
reference's ``isna().sum()`` / ``nunique()`` / ``value_counts()`` /
``corr()`` probes, distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_counts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE job (reference ``isna().sum()``,
    WRANGLE cells 24,43,71)."""
    cols = list(cols) if cols else df.columns
    return df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in cols
        ]
    )


def distinct_counts(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column distinct counts (reference ``nunique()``, WRANGLE cell 28).
    ``exact=False`` switches to approx_count_distinct (HLL sketch) — the
    right call at 100 TB where exact distinct is a full shuffle per col."""
    cols = list(cols) if cols else df.columns
    fn = F.countDistinct if exact else F.approx_count_distinct
    return df.agg(*[fn(c).alias(c) for c in cols])


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """Frequency table, most-common first (reference ``value_counts()``,
    WRANGLE cell 154)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("count")).orderBy(
        F.desc("count"), F.col(col)
    )


def impute_mean(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Fill nulls with the column mean (reference mean imputation,
    transform_all_datasets.py:115-119, MLPREP cell 176). One stats job,
    then a lazy na.fill."""
    means = df.agg(*[F.avg(c).alias(c) for c in cols]).first()
    fill = {c: means[c] for c in cols if means[c] is not None}
    return df.na.fill(fill)


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations (reference ``df.corr()``,
    ANALYSIS cell 66) as a long (col_a, col_b, corr) table.

    One aggregate job computes all pairs: corr is an algebraic
    aggregate, so n*(n-1)/2 pairs still make a single pass.
    """
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.corr(a, b).alias(f"{a}__{b}"))
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    data = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            v = row[f"{a}__{b}"]
            data.append((a, b, float(v) if v is not None else None))
            if a != b:
                data.append((b, a, float(v) if v is not None else None))
    return spark.createDataFrame(data, "col_a string, col_b string, corr double")
