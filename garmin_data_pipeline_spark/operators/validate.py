"""Data-quality validation (the reference's declared-but-unbuilt
future step — ETL Scripts/README.md lists "Create data validation
tests" and an optional great-expectations dependency that is never
imported; SURVEY.md §5.1).

Each check returns a one-row summary (rule, passed, violations) and
they compose into a single validation report via :func:`validate` —
one job, all checks unioned, so a 100 TB table is scanned once per
check-group rather than once per assertion.

The invariants covered are exactly the ones the reference's notebooks
assert interactively (``isna().sum()``, one-row-per-calendarDate
echoes, densified-range completeness — SURVEY.md §5.3 item 4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_SCHEMA = "rule string, passed boolean, violations bigint"


def _report(df: DataFrame, rule: str, violations: Column) -> DataFrame:
    return df.agg(violations.cast("long").alias("violations")).select(
        F.lit(rule).alias("rule"),
        (F.col("violations") == 0).alias("passed"),
        "violations",
    )


def check_not_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """No nulls in ``cols`` (the post-impute invariant)."""
    viol = sum(
        (F.count(F.lit(1)) - F.count(c) for c in cols),
        F.lit(0).cast("long"),
    )
    return _report(df, f"not_null({','.join(cols)})", viol)


def check_unique_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``keys`` identify rows uniquely (one row per calendarDate)."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return _report(
        dups, f"unique_key({','.join(keys)})", F.count(F.lit(1))
    )


def check_daily_no_gaps(
    df: DataFrame, date_col: str, partition_by: Sequence[str] = ()
) -> DataFrame:
    """The daily series spans [min, max] without missing days (the
    densified-calendar invariant). Per group when ``partition_by``."""
    group = list(partition_by)
    span = df.groupBy(*group).agg(
        F.min(date_col).alias("__d0"),
        F.max(date_col).alias("__d1"),
        F.count_distinct(F.col(date_col)).alias("__n"),
    )
    gaps = span.select(
        (
            F.datediff(F.col("__d1"), F.col("__d0")) + 1 - F.col("__n")
        ).alias("missing")
    )
    return _report(
        gaps, f"daily_no_gaps({date_col})", F.sum("missing")
    )


def check_in_range(
    df: DataFrame, col: str, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """Numeric bounds check (e.g. scores 0-100, ratios 0-1)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return _report(
        df, f"in_range({col},{lo},{hi})", F.sum(cond.cast("long"))
    )


def validate(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the per-check reports into one validation result set."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def expect_all_passed(report: DataFrame) -> None:
    """Raise with the failing rules if any check has violations (the
    programmatic gate a load job calls before committing a table)."""
    failed = [
        (r["rule"], r["violations"])
        for r in report.filter(~F.col("passed")).collect()
    ]
    if failed:
        raise AssertionError(f"validation failed: {failed}")
