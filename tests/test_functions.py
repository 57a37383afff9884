"""Unit tests for the scalar expression kit (SURVEY.md §2.8-2.9),
mirroring the reference's behavior on the same literal cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from garmin_data_pipeline_spark import functions as gf


def _one(spark, col, **lits):
    row = (
        spark.createDataFrame([lits or {"x": 1}])
        .select(col.alias("out"))
        .first()
    )
    return row["out"]


def test_format_duration(spark):
    # reference clean_timedelta_to_string: 7:03:09 style, unpadded hours
    assert _one(spark, gf.format_duration(F.lit(25389))) == "7:03:09"
    assert _one(spark, gf.format_duration(F.lit(0))) == "0:00:00"
    assert _one(spark, gf.format_duration(F.lit(59))) == "0:00:59"
    assert _one(spark, gf.format_duration(F.lit(3600))) == "1:00:00"
    assert _one(spark, gf.format_duration(F.lit(None).cast("long"))) is None


def test_format_pace(spark):
    # extract_json_data._format_pace: 1000/speed seconds per km
    # speed 3.125 m/s -> 320 s/km -> 5:20
    assert _one(spark, gf.format_pace_min_per_km(F.lit(3.125))) == "5:20"
    assert _one(spark, gf.format_pace_min_per_km(F.lit(0.0))) is None


def test_parse_mmss(spark):
    assert _one(spark, gf.parse_mmss_to_seconds(F.lit("23:45"))) == 1425
    # fractional seconds stripped first (drop_milliseconds)
    assert _one(spark, gf.parse_mmss_to_seconds(F.lit("23:45.6"))) == 1425


def test_parse_hms(spark):
    assert _one(spark, gf.parse_hms_to_seconds(F.lit("1:02:03"))) == 3723
    # mm:ss standardized to 0:mm:ss first
    assert _one(spark, gf.parse_hms_to_seconds(F.lit("45:10"))) == 2710
    assert _one(spark, gf.parse_hms_to_seconds(F.lit("45:10.9"))) == 2710


def test_standardize_hms(spark):
    assert _one(spark, gf.standardize_hms(F.lit("45:10"))) == "0:45:10"
    assert _one(spark, gf.standardize_hms(F.lit("1:45:10"))) == "1:45:10"


def test_seconds_to_hours(spark):
    assert _one(spark, gf.seconds_to_hours(F.lit(5400))) == 1.5


def test_epoch_millis(spark):
    out = _one(spark, gf.epoch_millis_to_timestamp(F.lit(86400000)))
    assert str(out) == "1970-01-02 00:00:00"


def test_binning_parity(spark):
    # exact label parity with transform_all_datasets.py:60-69
    cases = {
        0.0: ("0-3 miles", 1),
        2.99: ("0-3 miles", 1),
        3.0: ("3-5 miles", 2),
        9.99: ("7-10 miles", 4),
        13.0: ("13+ miles", 6),
        26.2: ("13+ miles", 6),
    }
    for v, (label, bid) in cases.items():
        assert _one(spark, gf.bin_to_label(F.lit(v))) == label
        assert _one(spark, gf.bin_to_id(F.lit(v))) == bid
    assert _one(spark, gf.bin_to_label(F.lit(None).cast("double"))) is None


def test_map_via_dict(spark):
    m = {"OPTIMAL": 1, "HIGH": 2}
    assert _one(spark, gf.map_via_dict(F.lit("OPTIMAL"), m)) == 1
    assert _one(spark, gf.map_via_dict(F.lit("???"), m, default=0)) == 0


def test_sentinels(spark):
    assert _one(spark, gf.replace_sentinel(F.lit("--"))) == 0.0
    assert _one(spark, gf.replace_sentinel(F.lit("42"))) == 42.0
    assert _one(spark, gf.sentinel_to_null(F.lit("--"))) is None


def test_strip_commas(spark):
    assert _one(spark, gf.strip_commas_to_double(F.lit("1,234"))) == 1234.0


def test_flag_when(spark):
    assert _one(spark, gf.flag_when(F.lit(5) > 0)) == 1
    assert _one(spark, gf.flag_when(F.lit(-1) > 0)) == 0


def test_coalesce_rebuild(spark):
    df = spark.createDataFrame(
        [(None, 2.0), (100, 9.0)], "sec: bigint, hrs: double"
    )
    out = [
        r["r"]
        for r in df.select(
            gf.coalesce_rebuild_seconds("sec", "hrs").alias("r")
        ).collect()
    ]
    assert out == [7200, 100]


def test_unit_conversions(spark):
    assert _one(spark, gf.cm_to_km(F.lit(100000.0))) == 1.0
    assert _one(spark, gf.m_to_km(F.lit(1500.0))) == 1.5
    assert _one(spark, gf.ms_to_seconds(F.lit(2500.0))) == 2.5
    assert _one(spark, gf.cm_per_ms_to_m_per_s(F.lit(0.5))) == 5.0
    assert _one(spark, gf.cm_to_m(F.lit(250.0))) == 2.5


def test_timestamp_diff(spark):
    df = spark.createDataFrame(
        [("2024-01-01 22:00:00", "2024-01-02 06:30:00")], "a: string, b: string"
    ).select(
        F.to_timestamp("a").alias("a"), F.to_timestamp("b").alias("b")
    )
    assert (
        df.select(gf.timestamp_diff_seconds("b", "a").alias("d")).first()["d"]
        == 30600
    )


def test_parsers_tolerate_malformed_input(spark):
    """ANSI mode (Spark 4 default) makes cast throw on garbage; the
    parse kit must yield NULL for dirty rows instead of killing the
    job (the reference's Python parsers pass malformed values through;
    a typed column's equivalent is NULL)."""
    from garmin_data_pipeline_spark.functions.cleaning import (
        strip_commas_to_double,
    )
    from garmin_data_pipeline_spark.functions.durations import (
        parse_hms_to_seconds,
        parse_mmss_to_seconds,
    )

    df = spark.createDataFrame(
        [("1:02:03",), ("45:30",), ("--",), ("garbage",), (None,)],
        "t string",
    )
    rows = {
        r["t"]: (r["h"], r["m"], r["d"])
        for r in df.select(
            "t",
            parse_hms_to_seconds("t").alias("h"),
            parse_mmss_to_seconds("t").alias("m"),
            strip_commas_to_double("t").alias("d"),
        ).collect()
    }
    assert rows["1:02:03"][0] == 3723
    assert rows["45:30"][0] == 45 * 60 + 30  # padded to 0:45:30
    assert rows["45:30"][1] == 45 * 60 + 30
    assert rows["--"] == (None, None, None)
    assert rows["garbage"] == (None, None, None)
    assert rows[None] == (None, None, None)
