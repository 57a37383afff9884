"""Schema-declared readers for the Garmin export datasets.

Re-expresses the reference's scan layer Spark-first:

- glob file discovery (``aggregate_json_files.py:29-48``) becomes a
  ``recursiveFileLookup`` + ``pathGlobFilter`` scan — no driver-side
  listing, no per-file ``pd.read_json`` + ``pd.concat`` loop
  (``aggregate_json_files.py:74-94``): the multi-shard union is
  implicit in the multi-file read (SURVEY.md S1/S2/S5/U1).
- every dataset gets an explicit ``StructType`` (schema-on-read, no
  inference) so a 1000-executor scan never pays a sampling pass and
  the parquet/JSON reader can prune columns (SURVEY.md §1.3).
- the summarized-activities envelope (``extract_json_data.py:25-45``)
  is unwrapped with ``explode``, not an imperative loop (S3).

At 100 TB the JSON scan is the slow path; readers keep provenance via
``input_file_name`` available and leave all filtering lazy so Catalyst
pushes predicates into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------------
# Schemas (FIXTURES.md; raw JSON under the export root)
# --------------------------------------------------------------------------

# ATL raw dates are epoch millis (the reference calls the raw
# calendarDate "a really weird format" and rebuilds it from timestamp —
# WRANGLE cell 55); we read both as long and convert explicitly.
ATL_SCHEMA = StructType(
    [
        StructField("userProfilePK", LongType()),
        StructField("calendarDate", LongType()),
        StructField("deviceId", LongType()),
        StructField("timestamp", LongType()),
        StructField("acwrStatus", StringType()),
        StructField("acwrStatusFeedback", StringType()),
        StructField("dailyTrainingLoadAcute", DoubleType()),
        StructField("dailyTrainingLoadChronic", DoubleType()),
        StructField("acwrPercent", DoubleType()),
        StructField("dailyAcuteChronicWorkloadRatio", DoubleType()),
    ]
)

MAXMET_SCHEMA = StructType(
    [
        StructField("userProfilePK", LongType()),
        StructField("calendarDate", StringType()),
        StructField("deviceId", LongType()),
        StructField("updateTimestamp", StringType()),
        StructField("sport", StringType()),
        StructField("subSport", StringType()),
        StructField("vo2MaxValue", DoubleType()),
        StructField("maxMet", DoubleType()),
        StructField("maxMetCategory", StringType()),
        StructField("calibratedData", LongType()),
    ]
)

RACE_PREDICTIONS_SCHEMA = StructType(
    [
        StructField("userProfilePK", LongType()),
        StructField("calendarDate", StringType()),
        StructField("deviceId", LongType()),
        StructField("timestamp", StringType()),
        StructField("raceTime5K", LongType()),
        StructField("raceTime10K", LongType()),
        StructField("raceTimeHalf", LongType()),
        StructField("raceTimeMarathon", LongType()),
    ]
)

TRAINING_HISTORY_SCHEMA = StructType(
    [
        StructField("userProfilePK", LongType()),
        StructField("calendarDate", StringType()),
        StructField("deviceId", LongType()),
        StructField("timestamp", StringType()),
        StructField("sport", StringType()),
        StructField("subSport", StringType()),
        StructField("trainingStatus", StringType()),
        StructField("fitnessLevelTrend", StringType()),
        StructField("trainingStatus2FeedbackPhrase", StringType()),
    ]
)

SLEEP_SCORES_FIELDS = [
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

SLEEP_SCHEMA = StructType(
    [
        StructField("sleepStartTimestampGMT", StringType()),
        StructField("sleepEndTimestampGMT", StringType()),
        StructField("calendarDate", StringType()),
        StructField("sleepWindowConfirmationType", StringType()),
        StructField("deepSleepSeconds", DoubleType()),
        StructField("lightSleepSeconds", DoubleType()),
        StructField("remSleepSeconds", DoubleType()),
        StructField("awakeSleepSeconds", DoubleType()),
        StructField("unmeasurableSeconds", DoubleType()),
        StructField("averageRespiration", DoubleType()),
        StructField("lowestRespiration", DoubleType()),
        StructField("highestRespiration", DoubleType()),
        StructField("retro", BooleanType()),
        StructField("awakeCount", DoubleType()),
        StructField("avgSleepStress", DoubleType()),
        StructField(
            "sleepScores",
            StructType(
                [StructField(f, DoubleType()) for f in SLEEP_SCORES_FIELDS]
                + [
                    StructField("feedback", StringType()),
                    StructField("insight", StringType()),
                ]
            ),
        ),
        StructField("restlessMomentCount", DoubleType()),
        StructField("napList", ArrayType(StringType())),
    ]
)

STRESS_AGGREGATOR_FIELDS = [
    "averageStressLevel",
    "averageStressLevelIntensity",
    "maxStressLevel",
    "stressIntensityCount",
    "stressOffWristCount",
    "totalStressCount",
    "totalStressIntensity",
    "stressDuration",
    "uncategorizedDuration",
    "totalDuration",
    "lowDuration",
    "mediumDuration",
    "highDuration",
    "restDuration",
    "activityDuration",
    "stressTooActiveCount",
]

UDS_SCHEMA = StructType(
    [
        StructField("userProfilePK", LongType()),
        StructField("calendarDate", StringType()),
        StructField("uuid", StringType()),
        StructField("totalKilocalories", DoubleType()),
        StructField("activeKilocalories", DoubleType()),
        StructField("bmrKilocalories", DoubleType()),
        StructField("totalSteps", DoubleType()),
        StructField("totalDistanceMeters", DoubleType()),
        StructField("highlyActiveSeconds", DoubleType()),
        StructField("activeSeconds", DoubleType()),
        StructField("moderateIntensityMinutes", DoubleType()),
        StructField("vigorousIntensityMinutes", DoubleType()),
        StructField("minHeartRate", DoubleType()),
        StructField("maxHeartRate", DoubleType()),
        StructField("restingHeartRate", DoubleType()),
        StructField("currentDayRestingHeartRate", DoubleType()),
        # Raw JSON true/false — a DoubleType read would null it out.
        StructField("isVigorousDay", BooleanType()),
        StructField(
            "allDayStress",
            StructType(
                [
                    StructField("userProfilePK", LongType()),
                    StructField("calendarDate", StringType()),
                    StructField(
                        "aggregatorList",
                        ArrayType(
                            StructType(
                                [StructField("type", StringType())]
                                + [
                                    StructField(f, DoubleType())
                                    for f in STRESS_AGGREGATOR_FIELDS
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        StructField(
            "bodyBattery",
            StructType(
                [
                    StructField("userProfilePK", LongType()),
                    StructField("calendarDate", StringType()),
                    StructField("chargedValue", DoubleType()),
                    StructField("drainedValue", DoubleType()),
                ]
            ),
        ),
    ]
)

# Activity struct: the 46 extracted business fields
# (extract_json_data.py:113-159); epoch fields arrive as both int and
# float in raw JSON, so they are declared DoubleType and cast on
# conversion.
ACTIVITY_SCHEMA = StructType(
    [
        StructField("activityId", LongType()),
        StructField("name", StringType()),
        StructField("activityType", StringType()),
        StructField("sportType", StringType()),
        StructField("beginTimestamp", DoubleType()),
        StructField("startTimeGmt", DoubleType()),
        StructField("startTimeLocal", DoubleType()),
        StructField("duration", DoubleType()),
        StructField("elapsedDuration", DoubleType()),
        StructField("movingDuration", DoubleType()),
        StructField("distance", DoubleType()),
        StructField("avgSpeed", DoubleType()),
        StructField("maxSpeed", DoubleType()),
        StructField("avgHr", DoubleType()),
        StructField("maxHr", DoubleType()),
        StructField("avgRunCadence", DoubleType()),
        StructField("maxRunCadence", DoubleType()),
        StructField("steps", LongType()),
        StructField("calories", DoubleType()),
        StructField("bmrCalories", DoubleType()),
        StructField("aerobicTrainingEffect", DoubleType()),
        StructField("anaerobicTrainingEffect", DoubleType()),
        StructField("avgStrideLength", DoubleType()),
        StructField("elevationGain", DoubleType()),
        StructField("elevationLoss", DoubleType()),
        StructField("minElevation", DoubleType()),
        StructField("maxElevation", DoubleType()),
        StructField("avgPower", DoubleType()),
        StructField("maxPower", DoubleType()),
        StructField("normPower", DoubleType()),
        StructField("trainingEffectLabel", StringType()),
        StructField("activityTrainingLoad", DoubleType()),
        StructField("lapCount", IntegerType()),
        StructField("favorite", BooleanType()),
        StructField("startLatitude", DoubleType()),
        StructField("startLongitude", DoubleType()),
        StructField("endLatitude", DoubleType()),
        StructField("endLongitude", DoubleType()),
        StructField("locationName", StringType()),
        StructField("deviceId", LongType()),
        StructField("manufacturer", StringType()),
        StructField("vO2MaxValue", DoubleType()),
        StructField("waterEstimated", DoubleType()),
        StructField("moderateIntensityMinutes", IntegerType()),
        StructField("vigorousIntensityMinutes", IntegerType()),
    ]
)

SUMMARIZED_ACTIVITIES_SCHEMA = StructType(
    [StructField("summarizedActivitiesExport", ArrayType(ACTIVITY_SCHEMA))]
)

# Garmin Connect activity CSV export: raw headers with spaces/specials
# (FIXTURES.md §8); everything read as string — the cleaning pipeline
# owns the casts (sentinels '--', comma-formatted numbers).
RUNNING_CSV_COLUMNS = [
    "Activity Type",
    "Date",
    "Favorite",
    "Title",
    "Distance",
    "Calories",
    "Time",
    "Avg HR",
    "Max HR",
    "Aerobic TE",
    "Avg Run Cadence",
    "Max Run Cadence",
    "Avg Pace",
    "Best Pace",
    "Total Ascent",
    "Total Descent",
    "Avg Stride Length",
    "Avg Vertical Ratio",
    "Avg Vertical Oscillation",
    "Avg Ground Contact Time",
    "Normalized Power (NP)",
    "Avg Power",
    "Max Power",
    "Steps",
    "Best Lap Time",
    "Number of Laps",
    "Moving Time",
    "Elapsed Time",
    "Min Elevation",
    "Max Elevation",
    "Training Stress Score",
    "Decompression",
    "Avg GAP",
]


# --------------------------------------------------------------------------
# Dataset registry: name -> (filename glob, schema)
# (mirrors the reference's dataset_patterns config,
#  aggregate_json_files.py:134-143)
# --------------------------------------------------------------------------

DATASETS: dict[str, tuple[str, StructType]] = {
    "atl_data": ("MetricsAcuteTrainingLoad_*.json", ATL_SCHEMA),
    "maxmet_data": ("MetricsMaxMetData_*.json", MAXMET_SCHEMA),
    "race_predictions": ("RunRacePredictions_*.json", RACE_PREDICTIONS_SCHEMA),
    "training_history": ("TrainingHistory_*.json", TRAINING_HISTORY_SCHEMA),
    "sleep_data": ("*sleepData.json", SLEEP_SCHEMA),
    "uds_data": ("UDSFile_*.json", UDS_SCHEMA),
    "summarized_activities": (
        "*summarizedActivities*.json",
        SUMMARIZED_ACTIVITIES_SCHEMA,
    ),
}


def read_dataset(spark: SparkSession, name: str, base_dir: str) -> DataFrame:
    """Read a multi-shard Garmin JSON dataset as one DataFrame.

    The recursive-glob + per-file-read + concat of the reference
    (``aggregate_json_files.py:50-94``) is a single declarative scan
    here: Spark lists the tree once, splits files across executors, and
    the shard union is implicit. ``multiLine`` because each shard is a
    single top-level JSON array.
    """
    pattern, schema = DATASETS[name]
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", pattern)
        .option("multiLine", "true")
        .schema(schema)
        .json(base_dir)
    )
    if name == "summarized_activities":
        df = df.select(
            F.explode("summarizedActivitiesExport").alias("activity")
        ).select("activity.*")
    return df


def read_running_csv(spark: SparkSession, path: str) -> DataFrame:
    """Garmin Connect activity CSV export (raw headers, all-string)."""
    schema = StructType(
        [StructField(c, StringType()) for c in RUNNING_CSV_COLUMNS]
    )
    return spark.read.option("header", "true").schema(schema).csv(path)


def with_provenance(df: DataFrame, col: str = "_source_file") -> DataFrame:
    """Attach the shard filename (reference keeps per-file counts,
    aggregate_json_files.py:84-89)."""
    return df.withColumn(col, F.input_file_name())
