"""Golden-file differential tests for the eight Garmin pipelines
(SURVEY.md §5.2/§5.3 item 2).

The reference repo ships end-state golden CSVs under
``ETL Scripts/PBI Python Scripts/Final Datasets/`` produced by the
WRANGLE notebook from a *newer* Garmin export than the raw JSON it
committed (the goldens extend months past the last committed shard).
Differential strategy therefore:

- identical column names AND order,
- cell-exact equality on every calendar day present in the committed
  raw data ("the overlap window"),
- except cells whose value was mean-imputed from a blank/partial raw
  row: the imputation mean is computed over the whole dataset, and the
  golden's dataset is longer, so those few cells cannot match any
  reimplementation run on the committed shards.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from garmin_data_pipeline_spark import pipelines
from garmin_data_pipeline_spark.sources import read_dataset, read_running_csv

BASE = "/root/reference/ETL Scripts/PBI Python Scripts/Raw Data"
GOLD = "/root/reference/ETL Scripts/PBI Python Scripts/Final Datasets"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference raw data not available"
)


def diff_vs_golden(ours: pd.DataFrame, golden_csv: str, exclude_dates=()):
    """Assert column parity and cell-exact equality on the overlap."""
    g = pd.read_csv(f"{GOLD}/{golden_csv}")
    assert list(ours.columns) == list(g.columns)
    ours = ours.copy()
    ours["calendarDate"] = ours["calendarDate"].astype(str)
    g["calendarDate"] = g["calendarDate"].astype(str)
    common = sorted(
        (set(ours.calendarDate) & set(g.calendarDate)) - set(exclude_dates)
    )
    assert len(common) > 200, f"suspiciously small overlap: {len(common)}"
    o = ours.set_index("calendarDate").loc[common].sort_index()
    gg = g.set_index("calendarDate").loc[common].sort_index()
    bad_cells = {}
    for c in o.columns:
        a, b = o[c], gg[c]
        try:
            bad = ~((a.astype(float) - b.astype(float)).abs() < 1e-6)
        except (ValueError, TypeError):
            bad = a.astype(str) != b.astype(str)
        if int(bad.sum()):
            bad_cells[c] = int(bad.sum())
    assert not bad_cells, f"mismatched cells vs {golden_csv}: {bad_cells}"


@needs_reference
class TestGoldenParity:
    def test_atl(self, spark):
        diff_vs_golden(
            pipelines.run_pipeline(spark, "atl_data", BASE).toPandas(),
            "ATL_Cleaned_PBI_Final.csv",
        )

    def test_maxmet(self, spark):
        diff_vs_golden(
            pipelines.run_pipeline(spark, "maxmet_data", BASE).toPandas(),
            "MaxMet_Cleaned_PBI_Final.csv",
        )

    def test_race_predictions(self, spark):
        diff_vs_golden(
            pipelines.run_pipeline(spark, "race_predictions", BASE).toPandas(),
            "RacePredictions_Cleaned_PBI_Final.csv",
        )

    def test_training_history(self, spark):
        diff_vs_golden(
            pipelines.run_pipeline(spark, "training_history", BASE).toPandas(),
            "TrainingHistory_Cleaned_PBI_Final.csv",
        )

    def test_sleep(self, spark):
        raw = read_dataset(spark, "sleep_data", BASE)
        ours = pipelines.transform_sleep(raw).toPandas()
        # Blank placeholder rows (all-null in raw) get gap-assigned
        # dates + fully imputed values; exclude those dates (plus the
        # unassignable trailing blank row, surfacing as 'None').
        raw_dates = {
            str(r[0])
            for r in raw.filter(F.col("calendarDate").isNotNull())
            .select(F.to_date("calendarDate"))
            .collect()
        }
        imputed = {
            str(d) for d in ours.calendarDate.astype(str) if str(d) not in raw_dates
        }
        # ...and days whose raw sleepScores carry no numeric scores
        # (score columns were mean-imputed there).
        imputed |= {
            str(r[0])
            for r in raw.filter(F.col("sleepScores.overallScore").isNull())
            .select(F.to_date("calendarDate"))
            .collect()
        }
        diff_vs_golden(ours, "Sleep_Cleaned_PBI_Final.csv", imputed)

    def test_uds(self, spark):
        from garmin_data_pipeline_spark.pipelines.garmin import (
            UDS_BASE_COLS,
            UDS_STRESS_COLS,
        )

        raw = read_dataset(spark, "uds_data", BASE)
        ours = pipelines.transform_uds(raw).toPandas()
        # Any day with a null raw metric (no TOTAL stress aggregator,
        # partial wellness record) had that cell mean-imputed.
        total = F.get(
            F.filter(
                F.coalesce(F.col("allDayStress.aggregatorList"), F.array()),
                lambda a: a["type"] == "TOTAL",
            ),
            0,
        )
        checked = [
            F.col(c) for c in UDS_BASE_COLS if c != "isVigorousDay"
        ] + [total[c] for c in UDS_STRESS_COLS]
        any_null = F.lit(False)
        for c in checked:
            any_null = any_null | c.isNull()
        imputed = {
            str(r[0])
            for r in raw.filter(any_null)
            .select(F.to_date("calendarDate"))
            .collect()
        }
        # The committed export's trailing days are partial-day
        # snapshots (cut mid-day at export time) that the golden's
        # newer export revised upward — a data difference, not a
        # transform difference.
        trailing = set(sorted(ours.calendarDate.astype(str))[-2:])
        diff_vs_golden(ours, "UDS_Cleaned_PBI_Final.csv", imputed | trailing)

    def test_summarized_activities(self, spark):
        df = read_dataset(spark, "summarized_activities", BASE)
        out = pipelines.transform_summarized_activities(df)
        n = out.count()
        assert n > 300  # 354 activities in the committed export
        assert out.select("activityId").distinct().count() == n
        row = (
            out.filter(F.lower("activityType").contains("run"))
            .orderBy(F.desc("distance"))
            .first()
        )
        # distance normalized cm -> km: a long run is 1-80 km, not 1e6 cm
        assert 1.0 < row["distance"] < 80.0
        assert row["beginTimestamp"].year >= 2023

    def test_running_activities_subset(self, spark):
        df = read_dataset(spark, "summarized_activities", BASE)
        runs = pipelines.running_activities(df).toPandas()
        assert len(runs) > 50
        assert runs["avg_pace"].notna().any()
        assert (runs["duration_formatted"].str.count(":") == 2).all()


# ---------------------------------------------------------------------------
# Running CSV pipeline — synthetic fixture (no raw running CSV is
# committed in the reference; FIXTURES.md §8 defines the schema).
# ---------------------------------------------------------------------------

RUNNING_CSV = """Activity Type,Date,Favorite,Title,Distance,Calories,Time,Avg HR,Max HR,Aerobic TE,Avg Run Cadence,Max Run Cadence,Avg Pace,Best Pace,Total Ascent,Total Descent,Avg Stride Length,Avg Vertical Ratio,Avg Vertical Oscillation,Avg Ground Contact Time,Normalized Power (NP),Avg Power,Max Power,Steps,Best Lap Time,Number of Laps,Moving Time,Elapsed Time,Min Elevation,Max Elevation,Training Stress Score,Decompression,Avg GAP
Running,2024-08-20,FALSE,Evening Run,5.21,489,45:30.5,150,165,3.1,170,180,08:44.1,07:30,120,118,1.05,8.0,8.1,250,300,290,400,"7,800",01:10,5,45:00,46:30,100,150,0,No,09:00
Running,2024-08-19,FALSE,Morning Run,3.5,300,"1:02:10",140,155,2.5,168,175,09:10,08:05,80,82,1.0,8.2,8.3,255,280,270,380,"5,100",01:05,4,"1:01:30","1:03:00",95,140,0,No,09:30
Treadmill Running,2024-08-13,FALSE,Tempo,13.2,1100,"1:45:00",155,170,4.2,175,185,07:57,06:45,10,12,1.1,7.8,7.9,240,320,310,450,"15,000",00:55,13,"1:44:00","1:46:00",--,--,0,No,08:10
Running,2024-07-30,FALSE,Long Run,10.0,900,"1:30:00",148,162,3.9,172,182,09:00,07:50,200,195,1.02,8.1,8.2,248,310,300,420,"13,000",01:00,10,"1:29:00","1:31:30",110,160,0,No,09:20
Running,2023-12-30,FALSE,Year End Run,6.0,550,50:00,145,158,3.0,169,178,08:20,07:40,60,58,1.01,8.05,8.15,252,295,285,410,"9,000",01:02,6,49:30,51:00,90,130,0,No,08:50
"""


@pytest.fixture(scope="module")
def running_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("runcsv") / "Running_Data_20240901.csv"
    p.write_text(RUNNING_CSV)
    return pipelines.transform_running(read_running_csv(spark, str(p)))


class TestRunningPipeline:
    def test_headers_and_features(self, running_df):
        cols = running_df.columns
        # cleaned headers, date parts in order, engineered columns present
        assert cols[:10] == [
            "Activity_Type",
            "Date",
            "Month_Numeric",
            "Month",
            "Year",
            "Week_of_Year",
            "Title",
            "Distance",
            "Distance_Group",
            "DistanceGroupId",
        ]
        # constant columns dropped (P4): Training_Stress_Score == 0,
        # Decompression == 'No', Avg_GAP unique per row stays
        assert "Training_Stress_Score" not in cols
        assert "Decompression" not in cols
        assert "Idle_Time" in cols

    def test_values(self, running_df):
        rows = {r["Title"]: r for r in running_df.collect()}
        tempo = rows["Tempo"]
        assert tempo["Distance_Group"] == "13+ miles"
        assert tempo["DistanceGroupId"] == 6
        assert tempo["Time"] == "01:45:00"
        assert tempo["Avg_Pace"] == "00:07:57"
        assert tempo["Idle_Time"] == "00:02:00"
        ev = rows["Evening Run"]
        # 45:30.5 -> fractional stripped -> 45:30 -> 0:45:30
        assert ev["Time"] == "00:45:30"
        assert ev["Best_Pace"] == "00:07:30"

    def test_cumulative_windows(self, running_df):
        # Two runs in ISO week 34 of 2024 (Aug 19/20): file order is
        # newest-first, so the Aug-20 run accumulates first.
        rows = {r["Title"]: r for r in running_df.collect()}
        assert rows["Evening Run"]["Weekly_Cumulative_Mins"] == "00:45:30"
        assert rows["Evening Run"]["Weekly_Mins_Prior_to_Run"] == 0.0
        assert rows["Morning Run"]["Weekly_Cumulative_Mins"] == "01:47:40"
        assert rows["Morning Run"]["Weekly_Mins_Prior_to_Run"] == 45.5

    def test_training_plan_filter(self, running_df):
        plan = pipelines.training_plan(running_df).collect()
        assert {r["Title"] for r in plan} == {
            "Evening Run",
            "Morning Run",
            "Tempo",
        }
        assert all(r["IsTrainingPlan"] == 1 for r in plan)


@needs_reference
def test_master_table(spark):
    dims = {
        "atl": pipelines.run_pipeline(spark, "atl_data", BASE),
        "maxmet": pipelines.run_pipeline(spark, "maxmet_data", BASE),
        "racepred": pipelines.run_pipeline(spark, "race_predictions", BASE),
        "sleep": pipelines.run_pipeline(spark, "sleep_data", BASE).filter(
            F.col("calendarDate").isNotNull()
        ),
        "trainhist": pipelines.run_pipeline(spark, "training_history", BASE),
        "uds": pipelines.run_pipeline(spark, "uds_data", BASE),
    }
    master = pipelines.master_table(list(dims.values()))
    dates = master.select("calendarDate").collect()
    assert len(dates) == len({r[0] for r in dates})  # one row per day
    # MERGE cell 12: only days with a training status survive
    assert master.count() == dims["trainhist"].count()
    wide = pipelines.master_table(
        list(dims.values()), require_status=False
    )
    union_days = (
        dims["maxmet"]
        .select("calendarDate")
        .union(dims["uds"].select("calendarDate"))
        .distinct()
        .count()
    )
    assert wide.count() >= union_days
    # vo2MaxValue forward-filled across the full master range
    pdf = master.toPandas().sort_values("calendarDate")
    first_valid = pdf["vo2MaxValue"].first_valid_index()
    assert pdf["vo2MaxValue"].loc[first_valid:].notna().all()


@needs_reference
def test_run_full_pipeline(spark, tmp_path):
    import shutil

    for t in pipelines.DEFAULT_TABLES.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/garmin.db/{t.split('.')[-1]}",
            ignore_errors=True,
        )
    summary = pipelines.run_full_pipeline(spark, BASE)
    assert summary.failed == []
    by_name = {r.dataset: r for r in summary.results}
    assert by_name["atl_data"].rows_loaded == 245
    assert by_name["summarized_activities"].rows_loaded > 300
    assert spark.table("garmin.atl_data").count() == 245
    for t in pipelines.DEFAULT_TABLES.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@needs_reference
def test_load_final_datasets(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS garmin.atl_final")
    shutil.rmtree(
        "/tmp/spark-test-warehouse/garmin.db/atl_final", ignore_errors=True
    )
    summary = pipelines.load_final_datasets(
        spark, {f"{GOLD}/ATL_Cleaned_PBI_Final.csv": "garmin.atl_final"}
    )
    assert summary.failed == []
    assert summary.results[0].rows_loaded == 375
    spark.sql("DROP TABLE IF EXISTS garmin.atl_final")


class TestAnalysis:
    """ANALYSIS-notebook functions over the running fixture."""

    def test_group_means(self, running_df):
        out = {r["Distance_Group"]: r for r in
               pipelines.group_means(running_df).collect()}
        # right-open bins: 3.5mi -> [3,5); 5.21mi and 6.0mi -> [5,7)
        assert out["3-5 miles"]["n_runs"] == 1
        assert out["3-5 miles"]["avg_Calories"] == 300.0
        g57 = out["5-7 miles"]
        assert g57["n_runs"] == 2
        assert abs(g57["avg_Calories"] - (489 + 550) / 2) < 1e-9
        assert out["13+ miles"]["avg_Calories"] == 1100.0

    def test_total_run_time(self, running_df):
        row = pipelines.total_run_time(running_df).first()
        # 45:30 + 1:02:10 + 1:45:00 + 1:30:00 + 50:00 = 5:52:40
        assert row["total_seconds"] == 21160
        assert row["total_formatted"] == "5:52:40"

    def test_count_over_threshold(self, running_df):
        assert pipelines.count_over_threshold(running_df, "Calories", 500) == 3
        assert pipelines.count_over_threshold(running_df, "Calories", 5000) == 0

    def test_correlations_with(self, running_df):
        out = pipelines.correlations_with(
            running_df, "Avg_HR", ["Distance", "DistanceGroupId"]
        ).collect()
        got = {r["column"]: r["corr_with_Avg_HR"] for r in out}
        assert set(got) == {"Distance", "DistanceGroupId"}
        assert all(-1.0 <= v <= 1.0 for v in got.values() if v is not None)


class TestConfig:
    def test_load_config_and_run(self, spark, tmp_path):
        from garmin_data_pipeline_spark.pipelines.config import (
            load_config,
            run_from_config,
        )

        cfg_path = tmp_path / "config.yaml"
        cfg_path.write_text(
            f"""
database:
  schema: garmin
data_paths:
  raw_data: "{BASE}"
tables:
  atl_data: atl_cfg_test
etl_settings:
  load_strategy: replace
  batch_size: 500
datasets_to_process: [atl_data]
"""
        )
        cfg = load_config(str(cfg_path))
        assert cfg.save_mode == "overwrite"
        assert cfg.batch_size == 500
        assert cfg.tables == {"atl_data": "garmin.atl_cfg_test"}
        if not os.path.isdir(BASE):
            import pytest as _pytest

            _pytest.skip("reference raw data not available")
        spark.sql("DROP TABLE IF EXISTS garmin.atl_cfg_test")
        import shutil

        shutil.rmtree(
            "/tmp/spark-test-warehouse/garmin.db/atl_cfg_test",
            ignore_errors=True,
        )
        summary = run_from_config(spark, cfg)
        assert summary.failed == []
        assert summary.results[0].rows_loaded == 245
        spark.sql("DROP TABLE garmin.atl_cfg_test")

    def test_upsert_strategy_rejected(self):
        from garmin_data_pipeline_spark.pipelines.config import PipelineConfig

        import pytest as _pytest

        cfg = PipelineConfig(raw_data_dir=".", load_strategy="upsert")
        with _pytest.raises(ValueError):
            _ = cfg.save_mode


def test_run_full_pipeline_unknown_dataset_isolated(spark):
    summary = pipelines.run_full_pipeline(
        spark, "/nonexistent", datasets=["no_such_dataset"]
    )
    assert summary.failed == ["no_such_dataset"]
    assert "unknown dataset" in summary.results[0].error


ML_RUNNING_CSV = """Activity Type,Date,Favorite,Title,Distance,Calories,Time,Avg HR,Max HR,Aerobic TE,Avg Run Cadence,Max Run Cadence,Avg Pace,Best Pace,Total Ascent,Total Descent,Avg Stride Length,Avg Vertical Ratio,Avg Vertical Oscillation,Avg Ground Contact Time,Normalized Power (NP),Avg Power,Max Power,Steps,Best Lap Time,Number of Laps,Moving Time,Elapsed Time,Min Elevation,Max Elevation,Training Stress Score,Decompression,Avg GAP
Running,2024-08-20,FALSE,Charlotte Running,5.0,450,45:00,150,165,3.1,170,180,09:00,08:00,120,118,1.05,8.0,8.1,250,300,290,400,"7,000",01:10,5,44:00,45:00,100,200,0,No,09:00
Running,2024-08-20,FALSE,Charlotte Running,8.0,700,"1:10:00",152,168,3.6,171,181,08:45,07:45,150,149,1.06,8.1,8.2,251,305,295,410,"11,000",01:08,8,"1:09:00","1:10:30",120,240,0,No,08:55
Treadmill Running,2024-08-19,FALSE,Gym,3.0,250,30:00,140,150,2.0,165,170,10:00,09:30,--,--,1.0,8.3,8.4,260,270,260,350,"4,500",01:20,3,29:30,30:30,--,--,0,No,10:10
"""


class TestRunningMl:
    def test_ml_variant(self, spark, tmp_path):
        p = tmp_path / "Workout_Data_20240804.csv"
        p.write_text(ML_RUNNING_CSV)
        out = pipelines.transform_running_ml(
            read_running_csv(spark, str(p))
        )
        rows = {str(r["calendarDate"]): r for r in out.collect()}
        assert set(rows) == {"2024-08-20", "2024-08-19"}
        # argmax by Distance per day: the 8-mile run wins
        assert rows["2024-08-20"]["Distance"] == 8.0
        # dropped columns
        assert "Title" not in out.columns
        assert "Moving_Time" not in out.columns
        assert "Training_Stress_Score" not in out.columns
        # '--' ascent -> 0.0; '--' elevation -> Charlotte-subgroup mean
        gym = rows["2024-08-19"]
        assert gym["Total_Ascent"] == 0.0
        assert gym["Max_Elevation"] == 220   # mean(200, 240)
        assert gym["Min_Elevation"] == 110   # mean(100, 120)
        assert rows["2024-08-20"]["Max_Elevation"] == 240


@needs_reference
def test_sleep_ml_variant(spark):
    raw = read_dataset(spark, "sleep_data", BASE)
    out = pipelines.transform_sleep_ml(raw)
    assert "deepSleepHours" not in out.columns
    assert "averageRespiration" not in out.columns
    assert "overallScore" in out.columns
    # all floats truncated to int
    assert not [
        f.name for f in out.schema.fields if f.dataType.typeName() == "double"
    ]
    row = out.filter(F.col("calendarDate").isNotNull()).orderBy(
        "calendarDate"
    ).first()
    assert isinstance(row["sleepDurationHours"], int)


def test_ml_master_variants_merge3_vs_mergef(spark):
    """MERGE3 applies the wide multi-collinearity drop (cell 27);
    MERGEF defines its list but never applies it (cell 26), keeping
    every running feature. Both drop the cell-14/22 columns and add
    the F17 pace timedeltas."""
    running = spark.createDataFrame(
        [
            ("2024-01-01", 10.0, "0:45:00", "Running", 500.0, "10K",
             "4:30", "4:05", 150, 175),
            ("2024-01-03", 5.0, "0:25:00", "Running", 250.0, "5K",
             "5:00", "4:45", 145, 170),
        ],
        "calendarDate string, Distance double, Time string, "
        "Activity_Type string, Calories double, Distance_Group string, "
        "Avg_Pace string, Best_Pace string, Avg_HR int, Max_HR int",
    )
    trainhist = spark.createDataFrame(
        [("2024-01-01", "PRODUCTIVE"), ("2024-01-02", "MAINTAINING"),
         ("2024-01-03", "PRODUCTIVE")],
        "calendarDate string, trainingStatus string",
    )
    uds = spark.createDataFrame(
        [("2024-01-01", 9000, 120, 55.0, 15.0),
         ("2024-01-02", 7000, 100, None, None),
         ("2024-01-03", 8000, 90, 56.0, 15.5)],
        "calendarDate string, totalSteps int, stressDuration int, "
        "vo2MaxValue double, maxMet double",
    )
    sleep = spark.createDataFrame(
        [("2024-01-01", 80, 75), ("2024-01-02", 70, 65)],
        "calendarDate string, remScore int, durationScore int",
    )
    dims = {"running": running, "trainhist": trainhist, "uds": uds,
            "sleep": sleep}

    m3 = pipelines.master_table_ml3(dims)
    # cell 14 + 22 + 27 drops
    for gone in ("Activity_Type", "Calories", "Distance_Group",
                 "Avg_HR", "Max_HR", "totalSteps", "stressDuration",
                 "remScore", "durationScore"):
        assert gone not in m3.columns, gone
    # pace columns survive MERGE3 and gain timedeltas (F17)
    assert {"Avg_Pace", "Avg_Pace_timedelta",
            "Best_Pace", "Best_Pace_timedelta"} <= set(m3.columns)
    rows = {r["calendarDate"]: r for r in m3.collect()}
    assert set(rows) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    # '00:' + '4:30' -> 270 s; '4:05' -> 245 s (cell 29 semantics)
    assert rows["2024-01-01"]["Avg_Pace_timedelta"] == 270
    assert rows["2024-01-01"]["Best_Pace_timedelta"] == 245
    # non-run day: pace NULL -> timedelta NULL (reference NaN)
    assert rows["2024-01-02"]["Avg_Pace_timedelta"] is None
    # MERGE repairs still applied upstream
    assert rows["2024-01-02"]["IsRunDay"] == 0
    assert rows["2024-01-02"]["vo2MaxValue"] == 55.0  # ffill'd

    mf = pipelines.master_table_mlf(dims)
    # MERGEF: collinearity drop NOT applied — features survive
    for kept in ("Avg_HR", "Max_HR", "totalSteps", "stressDuration",
                 "remScore", "durationScore"):
        assert kept in mf.columns, kept
    # but cell 14/22 drops and F17 still apply
    for gone in ("Activity_Type", "Calories", "Distance_Group"):
        assert gone not in mf.columns, gone
    mf_rows = {r["calendarDate"]: r for r in mf.collect()}
    assert mf_rows["2024-01-03"]["Avg_Pace_timedelta"] == 300
    # the unapplied MERGEF list is recorded for parity
    assert "activityDuration" in pipelines.garmin.MERGEF_COLLINEARITY_DROPS_UNAPPLIED


def test_pace_timedelta_seconds_f17(spark):
    """F17 kit function: '00:'+pace parse, bad strings -> NULL."""
    from garmin_data_pipeline_spark.functions.durations import (
        pace_timedelta_seconds,
    )

    df = spark.createDataFrame(
        [("4:30",), ("10:05",), (None,), ("junk",)], "pace string"
    )
    got = [
        r["s"]
        for r in df.select(pace_timedelta_seconds("pace").alias("s")).collect()
    ]
    assert got == [270, 605, None, None]
