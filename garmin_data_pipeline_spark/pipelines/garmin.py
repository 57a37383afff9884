"""The eight Garmin dataset pipelines + master table, Spark-first.

Mirrors the reference's ``TRANSFORM_FUNCTIONS`` dispatch
(``transform_all_datasets.py:351-383``) with the *notebook* semantics
where the two disagree (the golden CSVs were produced by the WRANGLE
notebook; SURVEY.md §2.11 documents the script-side defects we do not
replicate — e.g. the race-prediction dedup no-op).

Determinism: every pandas op that leaned on implicit row order
(keep='first', cumsum, ffill, positional drops) is re-keyed to explicit
columns + orderings here (SURVEY.md §4). All transforms are pure
DataFrame -> DataFrame functions: lazy, Catalyst-planned, no collect.

Scale: each pipeline is a single-user daily series in the reference,
but every operator is written partition-first — dedup/densify/window
operators take the day key; nothing materializes on the driver except
the two data-dependent projections (P3/P4), which are isolated
single-row aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from ..functions.cleaning import (
    bin_to_id,
    bin_to_label,
    replace_sentinel,
    sentinel_to_null,
)
from ..functions.durations import (
    format_timedelta,
    parse_hms_to_seconds,
    parse_mmss_to_seconds,
    round_binary,
    seconds_to_hours,
    timestamp_diff_seconds,
)
from ..operators.dedupe import dedupe_latest, latest_per_group
from ..operators.joins import master_outer_join
from ..operators.repair import patch_null_dates_from_gaps
from ..operators.projections import (
    clean_headers,
    drop_all_null_columns,
    drop_constant_columns,
    reorder_after,
)
from ..operators.windows import (
    cumulative_sum,
    densify_daily_ffill,
    forward_fill,
    lag_with_default,
)
from ..sources.garmin import read_dataset

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _impute_mean_doubles(
    df: DataFrame, exclude: Sequence[str] = ()
) -> DataFrame:
    """Mean-impute every DoubleType column (the reference fills nulls in
    all float64 columns with the column mean — WRANGLE cell 37 for
    sleep, cell 112 for UDS). One aggregate pass computes all means."""
    cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() == "double" and f.name not in exclude
    ]
    if not cols:
        return df
    means = df.agg(
        *[F.avg(c).alias(c) for c in cols]
    ).first()
    fill = {c: means[c] for c in cols if means[c] is not None}
    return df.na.fill(fill)


def _date_parts(df: DataFrame, date_col: str = "calendarDate") -> DataFrame:
    """Year/Month/MonthName/Quarter/Day companion columns inserted right
    after the date (WRANGLE cells 87-88 race predictions, 114-115 UDS)."""
    d = F.col(date_col)
    df = (
        df.withColumn("Year", F.year(d))
        .withColumn("Month", F.month(d))
        .withColumn("MonthName", F.date_format(d, "MMMM"))
        .withColumn("Quarter", F.quarter(d))
        .withColumn("Day", F.dayofmonth(d))
    )
    for i, c in enumerate(["Year", "Month", "MonthName", "Quarter", "Day"]):
        anchor = date_col if i == 0 else ["Year", "Month", "MonthName", "Quarter"][i - 1]
        df = reorder_after(df, c, anchor)
    return df


# ---------------------------------------------------------------------------
# 1. ATL — Acute Training Load  (WRANGLE cells 51-61; TAD:151-189)
# ---------------------------------------------------------------------------


def transform_atl(df: DataFrame) -> DataFrame:
    """Filter ``acwrStatus == 'NONE'`` bootstrap rows, rebuild the day
    key from ``timestamp`` (the raw calendarDate is epoch millis — "a
    really weird format", WRANGLE cell 55), drop null-ratio rows, keep
    the latest record per day, project the five metrics."""
    ts = F.timestamp_millis(F.col("timestamp"))
    out = (
        df.filter(F.col("acwrStatus") != "NONE")
        .withColumn("__ts", ts)
        .withColumn("calendarDate", F.to_date(ts))
        .filter(F.col("dailyAcuteChronicWorkloadRatio").isNotNull())
    )
    out = dedupe_latest(out, "calendarDate", "__ts")
    return out.select(
        "calendarDate",
        "acwrStatus",
        "dailyTrainingLoadAcute",
        "dailyTrainingLoadChronic",
        "acwrPercent",
        "dailyAcuteChronicWorkloadRatio",
    )


# ---------------------------------------------------------------------------
# 2. MaxMet  (WRANGLE cells 63-75; TAD:192-216)
# ---------------------------------------------------------------------------


def transform_maxmet(df: DataFrame) -> DataFrame:
    """Latest record per day by ``updateTimestamp``, densified to a
    gap-free daily grid with LOCF fill of vo2MaxValue/maxMet (the
    reference's date_range + reindex + ffill, WRANGLE cell 71)."""
    out = df.withColumn("calendarDate", F.to_date("calendarDate")).withColumn(
        "__ts", F.to_timestamp("updateTimestamp")
    )
    out = dedupe_latest(out, "calendarDate", "__ts")
    out = densify_daily_ffill(
        out, "calendarDate", ["vo2MaxValue", "maxMet"]
    )
    return out.select("calendarDate", "vo2MaxValue", "maxMet").orderBy(
        "calendarDate"
    )


# ---------------------------------------------------------------------------
# 3. Race predictions  (WRANGLE cells 76-89)
# ---------------------------------------------------------------------------


def transform_race_predictions(df: DataFrame) -> DataFrame:
    """Daily minimum of the four race-time columns + timedelta renders +
    date parts (WRANGLE cells 84-88). Implements the notebook semantics,
    NOT the script's silent no-op dedup on a nonexistent ``raceDistance``
    column (transform_all_datasets.py:239-241, SURVEY.md §2.11)."""
    races = ["raceTime5K", "raceTime10K", "raceTimeHalf", "raceTimeMarathon"]
    out = (
        df.withColumn("calendarDate", F.to_date("calendarDate"))
        .groupBy("calendarDate")
        .agg(*[F.min(c).alias(c) for c in races])
    )
    for c in races:
        out = out.withColumn(f"{c}_timedelta", format_timedelta(c))
    return _date_parts(out).orderBy("calendarDate")


# ---------------------------------------------------------------------------
# 4. Training history  (WRANGLE cells 90-99; TAD:247-271)
# ---------------------------------------------------------------------------


def transform_training_history(df: DataFrame) -> DataFrame:
    """Latest status per day (argmax timestamp), drop ``NO_STATUS``
    days, keep the two status columns."""
    out = df.withColumn("calendarDate", F.to_date("calendarDate")).withColumn(
        "__ts", F.to_timestamp("timestamp")
    )
    out = dedupe_latest(out, "calendarDate", "__ts")
    return out.filter(F.col("trainingStatus") != "NO_STATUS").select(
        "calendarDate", "trainingStatus", "fitnessLevelTrend"
    )


# ---------------------------------------------------------------------------
# 5. Sleep  (WRANGLE cells 28-50; TAD:82-148)
# ---------------------------------------------------------------------------

SLEEP_SCORE_COLS = [
    "overallScore",
    "qualityScore",
    "durationScore",
    "recoveryScore",
    "deepScore",
    "remScore",
    "lightScore",
    "awakeningsCountScore",
    "awakeTimeScore",
    "combinedAwakeScore",
    "restfulnessScore",
    "interruptionsScore",
]

_SLEEP_SECONDS = [
    "deepSleepSeconds",
    "lightSleepSeconds",
    "remSleepSeconds",
    "awakeSleepSeconds",
    "unmeasurableSeconds",
]


def transform_sleep(df: DataFrame) -> DataFrame:
    """Sleep pipeline: flatten ``sleepScores`` (struct expansion, not a
    pandas index join — SURVEY.md J2), duration from end-start, mean
    imputation of all float columns, seconds->hours renames, NONE fills.

    The reference's positional patch of two null calendarDates
    (``loc[109]``/``loc[257]``, WRANGLE cell 39) targets two entirely
    blank placeholder rows; the hand-assigned dates are exactly the days
    missing from the daily sequence, so the patch is re-keyed to data
    via :func:`patch_null_dates_from_gaps` (SURVEY.md F28).

    Rounding parity: ``sleepDurationHours`` was rounded with pandas
    ``.round(1)`` (numpy rint semantics, WRANGLE cell 32) while the
    seconds->hours conversions used CPython ``round`` (cell 46) — two
    different roundings of doubles, reproduced respectively by
    :func:`round_binary` and :func:`seconds_to_hours`.
    """
    start = F.to_timestamp("sleepStartTimestampGMT")
    end = F.to_timestamp("sleepEndTimestampGMT")
    out = df.withColumn("calendarDate", F.to_date("calendarDate"))
    out = patch_null_dates_from_gaps(out, "calendarDate")
    out = (
        out.select("*", "sleepScores.*")
        .drop("sleepScores")
        .withColumn(
            "sleepDuration_s",
            # to_timestamp returns TIMESTAMP (LTZ as an instant), so
            # the dtype hint pins the unix_micros path regardless of
            # evaluation mode (codegen vs interpreted)
            timestamp_diff_seconds(
                end, start, TimestampType(), TimestampType()
            ),
        )
        .withColumn(
            "sleepDurationHours",
            round_binary(F.col("sleepDuration_s") / 3600.0),
        )
        .drop(
            "sleepStartTimestampGMT",
            "sleepEndTimestampGMT",
            "sleepWindowConfirmationType",
            "retro",
            "napList",
        )
    )
    out = _impute_mean_doubles(out)
    # Rebuild missing durations from (imputed) hours — WRANGLE cell 41:
    # coalesce(duration, Timedelta(hours=h)) rounded to whole seconds.
    out = out.withColumn(
        "sleepDuration_s",
        F.coalesce(
            F.col("sleepDuration_s"),
            F.round(F.col("sleepDurationHours") * 3600).cast("long"),
        ),
    )
    out = (
        out.withColumn(
            "sleepDuration", format_timedelta("sleepDuration_s", days_prefix=True)
        )
        .withColumn("sleepDurationFormatted", format_timedelta("sleepDuration_s"))
        .withColumn("insight", F.coalesce("insight", F.lit("NONE")))
        .withColumn("feedback", F.coalesce("feedback", F.lit("NONE")))
    )
    for c in _SLEEP_SECONDS:
        out = out.withColumn(c, seconds_to_hours(c)).withColumnRenamed(
            c, c.replace("Seconds", "Hours")
        )
    return out.select(
        "calendarDate",
        "sleepDurationHours",
        "sleepDuration",
        "sleepDurationFormatted",
        "deepSleepHours",
        "lightSleepHours",
        "remSleepHours",
        "awakeSleepHours",
        "unmeasurableHours",
        "averageRespiration",
        "lowestRespiration",
        "highestRespiration",
        "awakeCount",
        "avgSleepStress",
        "restlessMomentCount",
        *SLEEP_SCORE_COLS,
        "feedback",
        "insight",
    )


# ---------------------------------------------------------------------------
# 6. UDS — User Daily Summary  (WRANGLE cells 100-116)
# ---------------------------------------------------------------------------

UDS_BASE_COLS = [
    "totalKilocalories",
    "activeKilocalories",
    "bmrKilocalories",
    "totalSteps",
    "totalDistanceMeters",
    "highlyActiveSeconds",
    "activeSeconds",
    "moderateIntensityMinutes",
    "vigorousIntensityMinutes",
    "minHeartRate",
    "maxHeartRate",
    "restingHeartRate",
    "currentDayRestingHeartRate",
    "isVigorousDay",
]

UDS_STRESS_COLS = [
    "averageStressLevel",
    "averageStressLevelIntensity",
    "maxStressLevel",
    "stressIntensityCount",
    "stressOffWristCount",
    "totalStressCount",
    "totalStressIntensity",
    "stressDuration",
    "stressTooActiveCount",
    "restDuration",
    "activityDuration",
    "mediumDuration",
    "highDuration",
]


def transform_uds(df: DataFrame) -> DataFrame:
    """UDS daily summary: pick the ``type='TOTAL'`` stress aggregator
    semantically instead of the notebook's fragile "drop last 2 columns,
    keep 3rd-to-last" positional hack (WRANGLE cell 104; SURVEY.md F30),
    flatten it, zero-fill ``isVigorousDay``, mean-impute, cast floats to
    int (truncating, like ``astype(int)``), add date parts."""
    total = F.get(
        F.filter(
            F.col("allDayStress.aggregatorList"),
            lambda a: a["type"] == "TOTAL",
        ),
        0,
    )
    out = (
        df.withColumn("calendarDate", F.to_date("calendarDate"))
        .withColumn("__total", total)
        .select(
            "calendarDate",
            *UDS_BASE_COLS,
            *[F.col("__total")[c].alias(c) for c in UDS_STRESS_COLS],
        )
        .withColumn(
            "isVigorousDay",
            F.coalesce(F.col("isVigorousDay").cast("double"), F.lit(0.0)),
        )
    )
    out = _impute_mean_doubles(out)
    for f in out.schema.fields:
        if f.dataType.typeName() == "double":
            out = out.withColumn(f.name, F.col(f.name).cast("long"))
    return _date_parts(out).orderBy("calendarDate")


# ---------------------------------------------------------------------------
# 7. Running CSV  (WRANGLE cells 1-27; transform_running_data.py)
# ---------------------------------------------------------------------------

_RUN_TIME_COLS = ["Time", "Moving_Time", "Elapsed_Time"]
_RUN_PACE_COLS = ["Avg_Pace", "Best_Pace"]


def transform_running(df: DataFrame, order_col: str = "_row_id") -> DataFrame:
    """Full running-data feature pipeline (WRANGLE cells 3-24).

    ``order_col`` supplies the cumulative-sum ordering the reference
    gets implicitly from CSV file order (Garmin exports newest-first);
    pandas row order has no Spark equivalent, so the caller attaches an
    explicit sequence column (SURVEY.md §4 determinism note). All time
    strings become integral seconds mid-pipeline and are re-rendered as
    ``HH:MM:SS`` at the end (§1.2 duration convention).
    """
    if order_col not in df.columns:
        df = df.withColumn(order_col, F.monotonically_increasing_id())
    out = drop_all_null_columns(df)
    out = clean_headers(out)
    out = out.withColumn("Distance", F.col("Distance").cast("double"))
    out = out.withColumn("Distance_Group", bin_to_label("Distance"))
    out = reorder_after(out, "Distance_Group", "Distance")
    out = out.withColumn("DistanceGroupId", bin_to_id("Distance"))
    out = reorder_after(out, "DistanceGroupId", "Distance_Group")
    out = out.drop("Favorite")
    out = out.withColumn("Date", F.to_date("Date").cast("timestamp"))
    out = out.drop("Best_Lap_Time", "Number_of_Laps", "Avg_GAP")
    out = (
        out.withColumn("Week_of_Year", F.weekofyear("Date"))
        .withColumn("Month_Numeric", F.month("Date"))
        .withColumn("Month", F.date_format("Date", "MMM"))
        .withColumn("Year", F.year("Date"))
    )
    for i, c in enumerate(["Month_Numeric", "Month", "Year", "Week_of_Year"]):
        anchor = "Date" if i == 0 else ["Month_Numeric", "Month", "Year"][i - 1]
        out = reorder_after(out, c, anchor)
    # Time strings -> integral seconds (F12-F14).
    for c in _RUN_PACE_COLS:
        out = out.withColumn(c, parse_mmss_to_seconds(c))
    for c in _RUN_TIME_COLS:
        out = out.withColumn(c, parse_hms_to_seconds(c))
    out = out.withColumn(
        "Idle_Time", F.col("Elapsed_Time") - F.col("Moving_Time")
    )
    # Weekly / monthly cumulative minutes + prior-to-run lag (W1/W2).
    for period, cum, prior in [
        (["Year", "Week_of_Year"], "Weekly_Cumulative_Mins", "Weekly_Mins_Prior_to_Run"),
        (["Year", "Month"], "Monthly_Cumulative_Mins", "Monthly_Mins_Prior_to_Run"),
    ]:
        out = cumulative_sum(out, "Time", period, [order_col], cum)
        out = lag_with_default(out, cum, period, [order_col], prior)
        out = out.withColumn(prior, F.round(F.col(prior) / 60.0, 2))
    for i, c in enumerate(
        [
            "Weekly_Cumulative_Mins",
            "Weekly_Mins_Prior_to_Run",
            "Monthly_Cumulative_Mins",
            "Monthly_Mins_Prior_to_Run",
        ]
    ):
        anchor = (
            "Time"
            if i == 0
            else [
                "Weekly_Cumulative_Mins",
                "Weekly_Mins_Prior_to_Run",
                "Monthly_Cumulative_Mins",
            ][i - 1]
        )
        out = reorder_after(out, c, anchor)
    out = drop_constant_columns(out.drop(order_col))
    # Render durations as HH:MM:SS strings for the PBI sink (F15).
    for c in _RUN_TIME_COLS + _RUN_PACE_COLS + [
        "Weekly_Cumulative_Mins",
        "Monthly_Cumulative_Mins",
        "Idle_Time",
    ]:
        if c in out.columns:
            out = out.withColumn(c, format_timedelta(c))
    return out.withColumn("Date", F.to_date("Date"))


def training_plan(running: DataFrame, start_date: str = "2024-08-13") -> DataFrame:
    """Training-plan subset: flag runs on/after the plan start and keep
    them (WRANGLE cell 27; SURVEY.md P12)."""
    return running.withColumn(
        "IsTrainingPlan",
        (F.col("Date") >= F.lit(start_date)).cast("int"),
    ).filter(F.col("IsTrainingPlan") == 1)


def transform_running_ml(df: DataFrame) -> DataFrame:
    """ML-branch running pipeline (MLPREP cells 116-133) — the variant
    feeding the master merge, distinct from the PBI path: ``Date`` is
    renamed to ``calendarDate``, sensor-detail columns are dropped,
    ``'--'`` elevations are repaired with the mean of the
    'Charlotte Running' subgroup (A8 + F22 composed over a mask — a
    null mean if the subgroup is absent, where pandas would crash on
    the int cast), and only the longest run survives per day (A3
    argmax by Distance; tiebreak on Calories for determinism where
    pandas silently took file order)."""
    out = drop_all_null_columns(df)
    out = clean_headers(out)
    out = out.withColumn("Distance", F.col("Distance").cast("double"))
    out = out.withColumn("Distance_Group", bin_to_label("Distance"))
    out = reorder_after(out, "Distance_Group", "Distance")
    out = out.drop("Favorite")
    out = out.withColumnRenamed("Date", "calendarDate").withColumn(
        "calendarDate", F.to_date("calendarDate")
    )
    out = out.drop("Decompression", "Training_Stress_Score")
    for c in ["Total_Ascent", "Total_Descent"]:
        out = out.withColumn(c, replace_sentinel(c, value=0.0))
    # subgroup-mean sentinel repair (MLPREP cell 131)
    charlotte = F.col("Title") == "Charlotte Running"
    for c in ["Max_Elevation", "Min_Elevation"]:
        sub_mean = F.avg(
            F.when(charlotte, sentinel_to_null(c))
        ).over(Window.partitionBy())
        out = out.withColumn(
            c,
            round_binary(
                F.coalesce(sentinel_to_null(c), sub_mean), 0
            ).cast("long"),
        )
    out = out.drop(
        "Avg_Run_Cadence", "Max_Run_Cadence", "Avg_Stride_Length",
        "Avg_Vertical_Ratio", "Avg_Vertical_Oscillation",
        "Avg_Ground_Contact_Time", "Avg_GAP", "Normalized_Power_NP",
        "Avg_Power", "Max_Power", "Best_Lap_Time", "Number_of_Laps",
        "Moving_Time", "Elapsed_Time", "Title",
    )
    return latest_per_group(
        out,
        "calendarDate",
        [F.desc("Distance"), F.desc(F.col("Calories"))],
    )


_SLEEP_ML_DROPS = [
    "averageRespiration",
    "lowestRespiration",
    "highestRespiration",
    "deepSleepHours",
    "lightSleepHours",
    "remSleepHours",
    "awakeSleepHours",
    "unmeasurableHours",
    "awakeCount",
    "restlessMomentCount",
]


def transform_sleep_ml(df: DataFrame) -> DataFrame:
    """ML-branch sleep pipeline (MLPREP cells 69-70): the PBI sleep
    output minus the hour/respiration detail columns (scores carry the
    signal), with remaining floats truncated to int like
    ``astype(int)``."""
    out = transform_sleep(df).drop(*_SLEEP_ML_DROPS)
    for f in out.schema.fields:
        if f.dataType.typeName() == "double":
            out = out.withColumn(f.name, F.col(f.name).cast("long"))
    return out


# ---------------------------------------------------------------------------
# 8. Summarized activities  (extract_json_data.py:97-166; TAD:299-347)
# ---------------------------------------------------------------------------


def transform_summarized_activities(df: DataFrame) -> DataFrame:
    """Unit-normalize the 46-field activity record: epoch-ms ->
    timestamp, cm -> km, ms -> s, cm/ms -> m/s, cm -> m; dedup by
    activityId with a deterministic tiebreak (the reference's unordered
    keep='first', transform_all_datasets.py:342-344, is file-order
    dependent — SURVEY.md §2.11)."""
    out = df
    for c in ["beginTimestamp", "startTimeGmt", "startTimeLocal"]:
        out = out.withColumn(c, F.timestamp_millis(F.col(c).cast("long")))
    out = out.withColumn("distance", F.col("distance") / 100000.0)
    for c in ["duration", "elapsedDuration", "movingDuration"]:
        out = out.withColumn(c, F.col(c) / 1000.0)
    for c in ["avgSpeed", "maxSpeed"]:
        out = out.withColumn(c, F.col(c) * 10.0)
    for c in ["elevationGain", "elevationLoss", "minElevation", "maxElevation"]:
        out = out.withColumn(c, F.col(c) / 100.0)
    return dedupe_latest(out, "activityId", "beginTimestamp")


def running_activities(df: DataFrame) -> DataFrame:
    """The 20-column running subset (extract_json_data.py:61-88):
    substring filter on the type key + formatted duration/pace."""
    from ..functions.durations import format_duration, format_pace_min_per_km

    runs = transform_summarized_activities(df).filter(
        F.lower(F.col("activityType")).contains("run")
        | F.lower(F.col("sportType")).contains("run")
    )
    return runs.select(
        "activityId",
        "name",
        "activityType",
        "sportType",
        "beginTimestamp",
        "startTimeLocal",
        "distance",
        "duration",
        F.col("movingDuration").alias("moving_duration"),
        format_duration(F.col("duration")).alias("duration_formatted"),
        "avgSpeed",
        format_pace_min_per_km(F.col("avgSpeed")).alias("avg_pace"),
        "avgHr",
        "maxHr",
        "calories",
        "steps",
        "avgRunCadence",
        "elevationGain",
        "aerobicTrainingEffect",
        "activityTrainingLoad",
    )


# ---------------------------------------------------------------------------
# Master table  (MERGE cell 18; ML_Master_Table_Merge.ipynb)
# ---------------------------------------------------------------------------


def master_table(
    datasets: Sequence[DataFrame] | dict[str, DataFrame],
    require_status: bool = True,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """7-way full outer join on ``calendarDate`` (MERGE cell 9:
    ``reduce(pd.merge(..., how='outer'))``) followed by the notebook's
    post-join repairs (cells 12-21): keep only days with a training
    status, LOCF-fill vo2MaxValue/maxMet across the joined range,
    rename the run ``Time`` to ``RunTime``, zero-fill no-run days, and
    derive the ``IsRunDay`` flag.

    Overlapping non-key columns are pre-suffixed per input — pass a
    dict for meaningful prefixes (``{"uds": ..., "racepred": ...}``);
    sequence input gets positional ``d<i>_`` prefixes (pandas would
    emit _x/_y; Spark errors on ambiguity — SURVEY.md §7d).

    ``partition_by`` extends the join key and scopes the LOCF fill
    (e.g. ``["user_id"]`` for a multi-tenant scale-up): without it the
    forward-fill window is global — correct for one athlete's daily
    series, a single-task stage at a billion rows. At reference scale
    every dim broadcasts; at 100 TB the join is a sort-merge
    co-partitioned on (user, date) and each fill window stays local.
    Every guard is column-presence-based so the builder works with any
    subset of the seven cleaned datasets.
    """
    keys = list(partition_by) + ["calendarDate"]
    named = (
        dict(datasets)
        if isinstance(datasets, dict)
        else {f"d{i}": df for i, df in enumerate(datasets)}
    )
    joined = master_outer_join(named, on=keys)
    if require_status and "trainingStatus" in joined.columns:
        joined = joined.filter(F.col("trainingStatus").isNotNull())
    if {"vo2MaxValue", "maxMet"} <= set(joined.columns):
        joined = forward_fill(
            joined,
            ["vo2MaxValue", "maxMet"],
            list(partition_by),
            ["calendarDate"],
        )
    if "Time" in joined.columns:
        joined = joined.withColumnRenamed("Time", "RunTime")
    fills = {}
    if "Distance" in joined.columns:
        fills["Distance"] = 0.0
    if "RunTime" in joined.columns:
        fills["RunTime"] = "00:00:00"
    if fills:
        joined = joined.na.fill(fills)
    if "Distance" in joined.columns:
        joined = joined.withColumn(
            "IsRunDay",
            F.when(F.col("Distance") > 0, 1).otherwise(0),
        )
    return joined.orderBy(*keys)


# ---------------------------------------------------------------------------
# ML master-table variants (MERGE3 = ML_Master_Table_3.ipynb,
# MERGEF = ML_Master_Table_More_Running_Features.ipynb). Both start
# from the MERGE master table, drop non-model columns, and convert the
# surviving MM:SS pace strings via the '00:' prefix trick (F17); they
# differ only in the multi-collinearity drop list.
# ---------------------------------------------------------------------------

# Running columns that "do not make sense with all other data"
# (MERGE3/MERGEF cell 14).
ML_RUNNING_DROPS = ("Activity_Type", "Calories", "Distance_Group")

# "Little value for the ML model" (MERGE3/MERGEF cell 22).
ML_LOW_VALUE_DROPS = (
    "floorsAscendedInMeters",
    "floorsDescendedInMeters",
    "averageMonitoringEnvironmentAltitude",
    "fitnessLevelTrend",
)

# Multi-collinearity drops, MERGE3 cell 27 (stress + sleep-score +
# aggregate + running-vitals columns).
MERGE3_COLLINEARITY_DROPS = (
    "stressIntensityCount",
    "stressOffWristCount",
    "totalStressCount",
    "stressDuration",
    "stressTooActiveCount",
    "restDuration",
    "mediumDuration",
    "highDuration",
    "totalKilocalories",
    "maxHeartRate",
    "durationScore",
    "remScore",
    "lightScore",
    "awakeningsCountScore",
    "awakeTimeScore",
    "combinedAwakeScore",
    "restfulnessScore",
    "interruptionsScore",
    "totalDistanceMeters",
    "totalSteps",
    "feedback",
    "insight",
    "acwrPercent",
    "Avg_HR",
    "Max_HR",
    "Min_Elevation",
    "Max_Elevation",
)

# MERGEF cell 26 *defines* a smaller collinearity list but never
# applies the drop — the "more running features" table deliberately
# keeps every feature. Recorded here for parity/documentation only.
MERGEF_COLLINEARITY_DROPS_UNAPPLIED = (
    "stressIntensityCount",
    "stressOffWristCount",
    "totalStressCount",
    "stressDuration",
    "stressTooActiveCount",
    "restDuration",
    "activityDuration",
    "totalKilocalories",
)


def _ml_master_variant(
    datasets: Sequence[DataFrame] | dict[str, DataFrame],
    collinearity_drops: Sequence[str],
    require_status: bool = True,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    from ..functions.durations import pace_timedelta_seconds

    base = master_table(datasets, require_status, partition_by)
    drops = [
        c
        for c in (
            *ML_RUNNING_DROPS,
            *ML_LOW_VALUE_DROPS,
            *collinearity_drops,
        )
        if c in base.columns
    ]
    out = base.drop(*drops) if drops else base
    # F17: '00:' + 'MM:SS' -> timedelta (here: integral seconds),
    # MERGE3 cell 29 / MERGEF cell 28.
    for src, dst in (
        ("Avg_Pace", "Avg_Pace_timedelta"),
        ("Best_Pace", "Best_Pace_timedelta"),
    ):
        if src in out.columns:
            out = out.withColumn(dst, pace_timedelta_seconds(src))
    return out


def master_table_ml3(
    datasets: Sequence[DataFrame] | dict[str, DataFrame],
    require_status: bool = True,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """MERGE3 ML master table (ML_Master_Table_3.ipynb cells 9-31):
    MERGE master -> running/low-value drops (cells 14, 22) -> the wide
    multi-collinearity drop (cell 27) -> pace timedeltas (cell 29)."""
    return _ml_master_variant(
        datasets, MERGE3_COLLINEARITY_DROPS, require_status, partition_by
    )


def master_table_mlf(
    datasets: Sequence[DataFrame] | dict[str, DataFrame],
    require_status: bool = True,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """MERGEF ML master table (ML_Master_Table_More_Running_Features
    .ipynb cells 9-29): like MERGE3 but the collinearity drop (cell 26)
    is defined and never applied, so every running feature — Avg_HR,
    Max_HR, elevations, stress/sleep scores — survives into the model
    table; only the cell-14/22 drops and pace conversion apply."""
    return _ml_master_variant(datasets, (), require_status, partition_by)


# ---------------------------------------------------------------------------
# Dispatch (mirrors TRANSFORM_FUNCTIONS, transform_all_datasets.py:351-360)
# ---------------------------------------------------------------------------

TRANSFORMS = {
    "atl_data": transform_atl,
    "maxmet_data": transform_maxmet,
    "race_predictions": transform_race_predictions,
    "training_history": transform_training_history,
    "sleep_data": transform_sleep,
    "uds_data": transform_uds,
    "summarized_activities": transform_summarized_activities,
    "running_data": transform_running,
}


def run_pipeline(spark: SparkSession, name: str, base_dir: str) -> DataFrame:
    """read -> transform for one dataset (the reference's
    ``process_dataset`` extract+transform stages, etl_pipeline.py:53-120,
    as a single lazy DAG)."""
    return TRANSFORMS[name](read_dataset(spark, name, base_dir))
