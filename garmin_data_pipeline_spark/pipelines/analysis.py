"""Marathon-training analysis functions (the ANALYSIS notebook,
``2024 Marathon Training Analysis.ipynb``, as library functions over
the cleaned running table).

Each function takes the output of
:func:`~garmin_data_pipeline_spark.pipelines.garmin.transform_running`
(duration columns as HH:MM:SS strings) or the raw-seconds intermediate,
and returns a small summary DataFrame — the notebook's printed results
as queryable relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import strip_commas_to_double
from ..functions.durations import format_duration, parse_hms_to_seconds

# Metrics the notebook averages per mileage bucket (ANALYSIS cells
# 38-43): Calories (comma-formatted string -> float), heart rates,
# ground contact time, stride length.
GROUP_MEAN_METRICS = [
    "Calories",
    "Avg_HR",
    "Max_HR",
    "Avg_Ground_Contact_Time",
    "Avg_Stride_Length",
]


def group_means(
    running: DataFrame, metrics: list[str] | None = None
) -> DataFrame:
    """Per-``Distance_Group`` means of the chosen metrics (ANALYSIS
    cells 38-43 — one groupBy instead of five single-metric passes).
    Comma-formatted numeric strings are cleaned in the aggregate
    (cell 38's ``str.replace(',','')``)."""
    metrics = [m for m in (metrics or GROUP_MEAN_METRICS) if m in running.columns]
    return (
        running.groupBy("Distance_Group", "DistanceGroupId")
        .agg(
            *[
                F.avg(strip_commas_to_double(m)).alias(f"avg_{m}")
                for m in metrics
            ],
            F.count(F.lit(1)).alias("n_runs"),
        )
        .orderBy("DistanceGroupId")
    )


def total_run_time(running: DataFrame, time_col: str = "Time") -> DataFrame:
    """Total training time (ANALYSIS cell 22: ``Time.sum()`` + divmod
    render): one row with total seconds and an H:MM:SS render."""
    secs = parse_hms_to_seconds(F.col(time_col))
    return running.agg(
        F.sum(secs).alias("total_seconds")
    ).select(
        "total_seconds",
        format_duration("total_seconds").alias("total_formatted"),
    )


def count_over_threshold(
    running: DataFrame, col: str = "Calories", threshold: float = 500
) -> int:
    """Runs burning >= threshold (ANALYSIS cell 39 filter + shape)."""
    return running.filter(
        strip_commas_to_double(col) >= threshold
    ).count()


def correlations_with(
    running: DataFrame, target: str = "Avg_HR", cols: list[str] | None = None
) -> DataFrame:
    """One row per numeric column with its Pearson correlation against
    ``target`` (ANALYSIS cell 47: ``df.corr()['Avg_HR']`` — computed
    pairwise with ``corr`` aggregates in a single pass, no driver-side
    matrix)."""
    numeric = cols or [
        f.name
        for f in running.schema.fields
        if f.dataType.typeName() in ("double", "long", "integer", "float")
        and f.name != target
    ]
    t = strip_commas_to_double(target)
    row = running.agg(
        *[
            F.corr(t, strip_commas_to_double(c)).alias(c)
            for c in numeric
        ]
    ).first()
    spark = running.sparkSession
    return spark.createDataFrame(
        [(c, float(row[c]) if row[c] is not None else None) for c in numeric],
        f"column string, corr_with_{target} double",
    )
