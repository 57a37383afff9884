"""Unit tests for the relational operator kit on tiny literal frames,
covering the invariants the reference asserts manually (SURVEY.md §5.3):
one row per key post-dedup, gap-free densified calendar, deterministic
ordering."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from garmin_data_pipeline_spark import operators as ops


def test_latest_per_group(spark):
    df = spark.createDataFrame(
        [
            ("d1", 1, "a"),
            ("d1", 3, "b"),
            ("d1", 2, "c"),
            ("d2", 5, "d"),
        ],
        "day: string, ts: long, v: string",
    )
    out = ops.latest_per_group(df, "day", F.desc("ts")).orderBy("day")
    assert [(r["day"], r["v"]) for r in out.collect()] == [
        ("d1", "b"),
        ("d2", "d"),
    ]


def test_dedupe_latest_one_row_per_key(spark):
    df = spark.createDataFrame(
        [("k", 1, 1), ("k", 2, 1), ("k", 2, 2), ("j", 9, 0)],
        "key: string, ts: long, tb: long",
    )
    out = ops.dedupe_latest(df, "key", "ts", tiebreakers=["tb"])
    assert out.count() == 2
    k = out.filter(F.col("key") == "k").first()
    assert (k["ts"], k["tb"]) == (2, 2)


def test_drop_all_null_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, None)], "a: long, b: string, c: string"
    )
    out = ops.drop_all_null_columns(df)
    assert out.columns == ["a", "c"]


def test_drop_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, "same", 10), (2, "same", 20)], "a: long, b: string, c: long"
    )
    out = ops.drop_constant_columns(df)
    assert out.columns == ["a", "c"]


def test_clean_headers(spark):
    df = spark.createDataFrame([(1, 2)], ["Avg HR", "Time (s)!"])
    assert ops.clean_headers(df).columns == ["Avg_HR", "Time_s"]


def test_reorder_after(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    assert ops.reorder_after(df, "c", "a").columns == ["a", "c", "b"]


def test_cumulative_and_lag(spark):
    df = spark.createDataFrame(
        [("w1", 1, 10), ("w1", 2, 20), ("w1", 3, 5), ("w2", 1, 7)],
        "wk: string, day: long, v: long",
    )
    out = ops.cumulative_sum(df, "v", ["wk"], [F.col("day")], "cum")
    out = ops.lag_with_default(out, "cum", ["wk"], [F.col("day")], "prior", 0)
    rows = {
        (r["wk"], r["day"]): (r["cum"], r["prior"])
        for r in out.collect()
    }
    # reference semantics: Weekly_Mins = cumsum, Prior = shift(1, fill 0)
    assert rows[("w1", 1)] == (10, 0)
    assert rows[("w1", 2)] == (30, 10)
    assert rows[("w1", 3)] == (35, 30)
    assert rows[("w2", 1)] == (7, 0)


def test_densify_daily_ffill_gap_free(spark):
    df = spark.createDataFrame(
        [
            ("u", dt.date(2024, 1, 1), 1.0),
            ("u", dt.date(2024, 1, 4), 4.0),
        ],
        "g: string, day: date, v: double",
    )
    out = ops.densify_daily_ffill(df, "day", ["v"], ["g"]).orderBy("day")
    rows = out.collect()
    # gap-free daily calendar (the reference's reindex(date_range))
    assert [r["day"].day for r in rows] == [1, 2, 3, 4]
    # LOCF fill
    assert [r["v"] for r in rows] == [1.0, 1.0, 1.0, 4.0]


def test_forward_fill_targeted(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, None), (4, 40.0)],
        "day: long, v: double",
    )
    out = ops.forward_fill(df, ["v"], [], [F.col("day")]).orderBy("day")
    assert [r["v"] for r in out.collect()] == [10.0, 10.0, 10.0, 40.0]


def test_master_outer_join_dict_rename(spark):
    a = spark.createDataFrame([("d1", 1)], "calendarDate: string, v: long")
    b = spark.createDataFrame([("d2", 2)], "calendarDate: string, v: long")
    out = ops.master_outer_join({"atl": a, "sleep": b})
    assert set(out.columns) == {"calendarDate", "atl_v", "sleep_v"}
    assert out.count() == 2  # full outer keeps both days


def test_master_table_suffixes_colliding_columns(spark):
    """Sequence input to master_table must deterministically suffix
    colliding non-key columns (the reference race_predictions and UDS
    both emit Year/Month/...; pandas would emit _x/_y, Spark would
    raise AMBIGUOUS_REFERENCE on the first downstream select)."""
    from garmin_data_pipeline_spark import pipelines

    a = spark.createDataFrame(
        [("d1", 2024, 1.0)], "calendarDate: string, Year: long, v: double"
    )
    b = spark.createDataFrame(
        [("d1", 2024, 2.0)], "calendarDate: string, Year: long, w: double"
    )
    out = pipelines.master_table([a, b], require_status=False)
    assert set(out.columns) == {"calendarDate", "d0_Year", "d1_Year", "v", "w"}
    # the collision is resolvable: selecting a suffixed column works
    assert out.select("d0_Year").first()[0] == 2024
    named = pipelines.master_table(
        {"racepred": a, "uds": b}, require_status=False
    )
    assert {"racepred_Year", "uds_Year"} <= set(named.columns)


def test_master_table_partitioned_ffill(spark):
    """partition_by scopes the LOCF fill per user: user B's leading
    null must NOT inherit user A's last value (and the window plan is
    partitioned — no single-task global sort at scale)."""
    from garmin_data_pipeline_spark import pipelines

    rows = [
        ("alice", "2024-01-01", 50.0, 10.0),
        ("alice", "2024-01-02", None, None),
        ("bob", "2024-01-01", None, None),
        ("bob", "2024-01-02", 40.0, 8.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id: string, calendarDate: string, "
        "vo2MaxValue: double, maxMet: double",
    )
    out = pipelines.master_table(
        [df], require_status=False, partition_by=["user_id"]
    )
    got = {
        (r["user_id"], r["calendarDate"]): r["vo2MaxValue"]
        for r in out.collect()
    }
    assert got[("alice", "2024-01-02")] == 50.0  # filled within alice
    assert got[("bob", "2024-01-01")] is None  # NOT filled from alice
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(user_id" in plan  # partitioned window


def test_join_asof_ignores_null_right_timestamps(spark):
    """ASOF semantics: right rows with a NULL timestamp never match
    (they would otherwise sort nulls-first and forward-fill into every
    early left row)."""
    left = spark.createDataFrame(
        [("u", 10), ("u", 20)], "k: string, ts: long"
    )
    right = spark.createDataFrame(
        [("u", None, 999.0), ("u", 15, 1.5)],
        "k: string, ts: long, px: double",
    )
    out = ops.join_asof(left, right, "ts", ["k"], ["px"])
    got = {r["ts"]: r["px_asof"] for r in out.collect()}
    assert got[10] is None  # no prior non-null right row
    assert got[20] == 1.5


def test_mod_sample_rounds_rate(spark):
    """rate=0.29 must keep residues 0..28 (29%), not truncate to 28
    under binary-float representation of 0.29*100 = 28.999...."""
    from garmin_data_pipeline_spark.operators.sampling import mod_sample

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert mod_sample(df, "k", 0.29).count() == 29
    assert mod_sample(df, "k", 0.5).count() == 50
    # exact .5 ties round HALF-UP (keep-at-least-rate semantics), not
    # banker's half-even: 0.125 * 100 = 12.5 -> 13, not 12.
    assert mod_sample(df, "k", 0.125).count() == 13


def test_union_by_name_missing_cols(spark):
    a = spark.createDataFrame([(1, "x")], "id: long, a: string")
    b = spark.createDataFrame([(2, "y")], "id: long, b: string")
    out = ops.union_by_name([a, b])
    assert set(out.columns) == {"id", "a", "b"}
    assert out.count() == 2


def test_flatten_struct(spark):
    df = spark.createDataFrame(
        [(1, {"overallScore": 80, "feedback": "ok"})],
        "id: long, sleepScores: struct<overallScore: long, feedback: string>",
    )
    out = ops.flatten_struct(df, "sleepScores")
    assert out.columns == ["id", "overallScore", "feedback"]
    assert out.first()["overallScore"] == 80


def test_pick_array_element_semantic_total(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                [
                    {"type": "AWAKE", "avg": 10},
                    {"type": "TOTAL", "avg": 25},
                    {"type": "ASLEEP", "avg": 5},
                ],
            )
        ],
        "id: long, aggregatorList: array<struct<type: string, avg: long>>",
    )
    out = ops.pick_array_element(
        df, "aggregatorList", "type", "TOTAL", "total"
    )
    assert out.first()["total"]["avg"] == 25


def test_unwrap_envelope(spark):
    df = spark.createDataFrame(
        [([{"activityId": 1}, {"activityId": 2}],)],
        "summarizedActivitiesExport: array<struct<activityId: long>>",
    )
    out = ops.unwrap_envelope(df, "summarizedActivitiesExport", "act")
    assert out.count() == 2


def test_null_and_distinct_counts(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, "a")], "x: long, y: string"
    )
    nc = ops.null_counts(df).first()
    assert (nc["x"], nc["y"]) == (0, 1)
    dc = ops.distinct_counts(df).first()
    assert (dc["x"], dc["y"]) == (3, 1)


def test_value_counts_order(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("a",), ("b",), ("c",)], "v: string"
    )
    out = ops.value_counts(df, "v").collect()
    assert [(r["v"], r["count"]) for r in out] == [
        ("a", 3),
        ("b", 2),
        ("c", 1),
    ]


def test_impute_mean(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,)], "v: double"
    )
    out = ops.impute_mean(df, ["v"])
    assert sorted(r["v"] for r in out.collect()) == [1.0, 2.0, 3.0]


def test_correlation_matrix(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "a: double, b: double"
    )
    out = ops.correlation_matrix(df, ["a", "b"])
    r = {
        (row["col_a"], row["col_b"]): row["corr"] for row in out.collect()
    }
    assert abs(r[("a", "b")] - 1.0) < 1e-12
    assert r[("a", "b")] == r[("b", "a")]


class TestValidate:
    """Data-quality checks (operators/validate.py)."""

    def test_checks_and_gate(self, spark):
        import pytest as _pytest

        from garmin_data_pipeline_spark.operators import validate as V

        df = spark.createDataFrame(
            [
                ("2024-01-01", 1, 50.0),
                ("2024-01-02", 2, None),
                ("2024-01-04", 3, 120.0),
                ("2024-01-04", 4, 80.0),
            ],
            "d string, id long, score double",
        ).selectExpr("CAST(d AS DATE) AS d", "id", "score")
        report = V.validate(
            [
                V.check_not_null(df, ["id"]),
                V.check_not_null(df, ["score"]),
                V.check_unique_key(df, ["d"]),
                V.check_daily_no_gaps(df, "d"),
                V.check_in_range(df, "score", 0, 100),
            ]
        )
        rows = {r["rule"]: (r["passed"], r["violations"]) for r in report.collect()}
        assert rows["not_null(id)"] == (True, 0)
        assert rows["not_null(score)"] == (False, 1)
        assert rows["unique_key(d)"] == (False, 1)   # 2024-01-04 twice
        assert rows["daily_no_gaps(d)"] == (False, 1)  # 01-03 missing
        assert rows["in_range(score,0,100)"] == (False, 1)  # 120.0
        with _pytest.raises(AssertionError):
            V.expect_all_passed(report)
        V.expect_all_passed(
            V.validate([V.check_not_null(df, ["id"])])
        )

    def test_clean_pipeline_output_validates(self, spark):
        import os

        import pytest as _pytest

        from garmin_data_pipeline_spark import pipelines
        from garmin_data_pipeline_spark.operators import validate as V

        base = "/root/reference/ETL Scripts/PBI Python Scripts/Raw Data"
        if not os.path.isdir(base):
            _pytest.skip("reference raw data not available")
        maxmet = pipelines.run_pipeline(spark, "maxmet_data", base)
        V.expect_all_passed(
            V.validate(
                [
                    V.check_unique_key(maxmet, ["calendarDate"]),
                    V.check_daily_no_gaps(maxmet, "calendarDate"),
                    V.check_not_null(maxmet, ["vo2MaxValue", "maxMet"]),
                ]
            )
        )


def test_join_asof_backward_semantics(spark):
    from garmin_data_pipeline_spark.operators.joins import join_asof

    left = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 12:00:00"),
            (3, "u2", "2024-01-01 09:00:00"),  # no prior right row
        ],
        "id long, user string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 09:30:00", 10.0),
            ("u1", "2024-01-01 12:00:00", 20.0),  # exact tie: matches
            ("u2", "2024-01-01 11:00:00", 30.0),  # after left: no match
        ],
        "user string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["id"]: r["v_asof"]
        for r in join_asof(left, right, "ts", ["user"], ["v"]).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: None}


def test_join_range_bins_and_filters(spark):
    from garmin_data_pipeline_spark.operators.joins import join_range

    events = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:30:00"),
            (2, "u1", "2024-01-03 08:00:00"),   # inside multi-day interval
            (3, "u1", "2024-01-05 00:00:00"),   # outside all intervals
            (4, "u2", "2024-01-01 10:30:00"),   # right user, wrong interval user
        ],
        "id long, user string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ivals = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00", "a"),
            ("u1", "2024-01-02 00:00:00", "2024-01-04 00:00:00", "b"),
        ],
        "user string, s string, e string, name string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    out = join_range(events, ivals, "ts", "s", "e", by=["user"])
    got = {(r["id"], r["name"]) for r in out.collect()}
    assert got == {(1, "a"), (2, "b")}


def test_positional_and_nested_helpers(spark):
    """P5 positional drop + S3/J2 nested helpers direct coverage."""
    from garmin_data_pipeline_spark.operators import (
        drop_last_columns,
        flatten_all_structs,
        pick_array_element,
        unwrap_envelope,
    )

    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    assert drop_last_columns(df, 1).columns == ["a", "b"]
    assert drop_last_columns(df, 2).columns == ["a"]

    nested = spark.createDataFrame(
        [(1, {"x": 10, "y": {"z": 5}})],
        "id int, s struct<x:int, y:struct<z:int>>",
    )
    flat = flatten_all_structs(nested)
    assert set(flat.columns) == {"id", "s_x", "s_y_z"}
    assert flat.first()["s_y_z"] == 5

    env = spark.createDataFrame(
        [([{"v": 1}, {"v": 2}],)], "payload array<struct<v:int>>"
    )
    rows = unwrap_envelope(env, "payload").select("record.v").collect()
    assert sorted(r["v"] for r in rows) == [1, 2]

    arr = spark.createDataFrame(
        [([{"type": "A", "n": 1}, {"type": "TOTAL", "n": 9}],)],
        "lst array<struct<type:string, n:int>>",
    )
    picked = pick_array_element(arr, "lst", "type", "TOTAL", "e").first()
    assert picked["e"]["n"] == 9


def test_pick_array_element_missing_yields_null(spark):
    from garmin_data_pipeline_spark.operators import pick_array_element

    arr = spark.createDataFrame(
        [([{"type": "A", "n": 1}],), ([],)],
        "lst array<struct<type:string, n:int>>",
    )
    out = pick_array_element(arr, "lst", "type", "TOTAL", "e").collect()
    assert all(r["e"] is None for r in out)  # no match -> NULL, no error


class TestSpatialJoin:
    def test_haversine_known_distance(self, spark):
        from garmin_data_pipeline_spark.operators.spatial import haversine_km

        df = spark.createDataFrame([(1,)], "id int")
        d = df.select(
            haversine_km(
                F.lit(40.0), F.lit(-74.0), F.lit(40.1), F.lit(-74.0)
            ).alias("d")
        ).first()["d"]
        assert abs(d - 11.12) < 0.05  # 0.1 deg latitude ~ 11.1 km

    def test_radius_join_matches_bruteforce(self, spark):
        """The grid binning must be lossless: same pairs as an exact
        cross join + haversine filter."""
        from garmin_data_pipeline_spark.operators.spatial import (
            haversine_km,
            join_points_in_radius,
        )

        pts = spark.createDataFrame(
            [(i, 40.0 + (i % 37) * 0.01, -74.0 + ((i * 11) % 41) * 0.01)
             for i in range(300)],
            "pid int, lat double, lon double",
        )
        places = spark.createDataFrame(
            [("a", 40.10, -73.90), ("b", 40.25, -73.75)],
            "station string, place_lat double, place_lon double",
        )
        got = {
            (r["pid"], r["station"])
            for r in join_points_in_radius(pts, places, 8.0).collect()
        }
        brute = {
            (r["pid"], r["station"])
            for r in pts.crossJoin(places)
            .withColumn(
                "d",
                haversine_km(
                    F.col("lat"), F.col("lon"),
                    F.col("place_lat"), F.col("place_lon"),
                ),
            )
            .filter(F.col("d") <= 8.0)
            .collect()
        }
        assert got == brute and len(got) > 0

    def test_radius_join_wraps_antimeridian(self, spark):
        """Pairs straddling lon ±180° must be found: lon cell ids wrap
        modulo the globe (and haversine itself is wrap-correct)."""
        from garmin_data_pipeline_spark.operators.spatial import (
            haversine_km,
            join_points_in_radius,
        )

        pts = spark.createDataFrame(
            [(1, 0.0, -179.95), (2, 0.0, 179.99), (3, 0.0, 170.0)],
            "pid int, lat double, lon double",
        )
        places = spark.createDataFrame(
            [("date-line", 0.0, 179.95)],
            "station string, place_lat double, place_lon double",
        )
        got = {
            (r["pid"], r["station"])
            for r in join_points_in_radius(pts, places, 15.0).collect()
        }
        brute = {
            (r["pid"], r["station"])
            for r in pts.crossJoin(places)
            .withColumn(
                "d",
                haversine_km(
                    F.col("lat"), F.col("lon"),
                    F.col("place_lat"), F.col("place_lon"),
                ),
            )
            .filter(F.col("d") <= 15.0)
            .collect()
        }
        # pid 1 is ~11 km away across the antimeridian; pid 2 is ~4 km
        # on the same side; pid 3 is ~1100 km away.
        assert got == brute == {(1, "date-line"), (2, "date-line")}

    def test_radius_join_seam_cell_not_narrow(self, spark):
        """Review regression: with ceil(360/w) ring cells the seam
        cell is narrower than w, so near-seam pairs at a radius whose
        width does NOT divide 360 evenly sat 2 cells apart and were
        dropped. radius 100 km at lat 55° reproduces it (old cells:
        1.8018°, seam cell 1.44°)."""
        from garmin_data_pipeline_spark.operators.spatial import (
            haversine_km,
            join_points_in_radius,
        )

        pts = spark.createDataFrame(
            [(1, 55.0, 178.55), (2, 55.0, 179.7), (3, 55.0, 175.0)],
            "pid int, lat double, lon double",
        )
        places = spark.createDataFrame(
            [("seam", 55.0, -179.94)],
            "station string, place_lat double, place_lon double",
        )
        radius = 100.0
        got = {
            (r["pid"], r["station"])
            for r in join_points_in_radius(pts, places, radius).collect()
        }
        brute = {
            (r["pid"], r["station"])
            for r in pts.crossJoin(places)
            .withColumn(
                "d",
                haversine_km(
                    F.col("lat"), F.col("lon"),
                    F.col("place_lat"), F.col("place_lon"),
                ),
            )
            .filter(F.col("d") <= radius)
            .collect()
        }
        assert got == brute
        assert (1, "seam") in got  # the pair the narrow seam cell lost

    def test_radius_join_broadcasts_places(self, spark):
        from garmin_data_pipeline_spark.operators.spatial import (
            join_points_in_radius,
        )

        pts = spark.createDataFrame(
            [(1, 40.0, -74.0)], "pid int, lat double, lon double"
        )
        places = spark.createDataFrame(
            [("a", 40.0, -74.0)],
            "station string, place_lat double, place_lon double",
        )
        plan = (
            join_points_in_radius(pts, places, 5.0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan  # equi-join on cells, no NLJ


class TestZipScan:
    def _make_zip(self, path, members):
        import zipfile as zf_mod

        with zf_mod.ZipFile(path, "w") as zf:
            for name, data in members.items():
                zf.writestr(name, data)

    def test_scan_zip_members(self, spark, tmp_path):
        from garmin_data_pipeline_spark.sources.archive import (
            scan_zip_members,
        )

        self._make_zip(
            tmp_path / "a.zip",
            {"x.json": b'{"k": 1}', "img/blob.png": b"\x89PNG",
             "y.txt": b"hello"},
        )
        self._make_zip(tmp_path / "b.zip", {"z.json": b'{"k": 2}'})
        out = scan_zip_members(spark, str(tmp_path)).collect()
        by_member = {r["member"]: r for r in out}
        assert set(by_member) == {"x.json", "img/blob.png", "y.txt", "z.json"}
        assert bytes(by_member["x.json"]["content"]) == b'{"k": 1}'
        assert by_member["y.txt"]["n_bytes"] == 5
        # member_glob prunes before decompression
        only_json = scan_zip_members(
            spark, str(tmp_path), member_glob="*.json"
        ).collect()
        assert {r["member"] for r in only_json} == {"x.json", "z.json"}

    def test_read_zipped_text_members_feeds_json(self, spark, tmp_path):
        from garmin_data_pipeline_spark.sources.archive import (
            read_zipped_text_members,
        )

        self._make_zip(
            tmp_path / "exp.zip",
            {"d1.json": b'{"v": 10}', "d2.json": b'{"v": 20}'},
        )
        txt = read_zipped_text_members(
            spark, str(tmp_path), member_glob="*.json"
        )
        parsed = txt.select(
            F.from_json("text", "v int").getField("v").alias("v")
        )
        assert sorted(r["v"] for r in parsed.collect()) == [10, 20]

    def test_extract_zip_driver_side(self, spark, tmp_path):
        from garmin_data_pipeline_spark.sources.archive import extract_zip

        self._make_zip(tmp_path / "raw.zip", {"f.txt": b"data"})
        names = extract_zip(str(tmp_path / "raw.zip"), str(tmp_path / "out"))
        assert names == ["f.txt"]
        assert (tmp_path / "out" / "f.txt").read_bytes() == b"data"


def test_release_new_persistent_rdds_spares_the_baseline(spark):
    """The serve-session checkpoint-hygiene helpers (r10): releasing
    everything persisted since a baseline must free materialized lazy
    localCheckpoints while leaving pre-baseline persisted data (the
    long-lived serve index) cached."""
    from garmin_data_pipeline_spark.session import (
        release_new_persistent_rdds,
        snapshot_persistent_rdds,
    )

    index = spark.range(100).withColumnRenamed("id", "k").persist()
    assert index.count() == 100  # materialize the "index"
    base = snapshot_persistent_rdds(spark)
    ck = (
        spark.range(50)
        .selectExpr("id * 2 AS v")
        .localCheckpoint(eager=False)
    )
    assert ck.count() == 50  # materialize the per-call checkpoint
    grown = snapshot_persistent_rdds(spark)
    assert grown - base, "checkpoint did not register as persistent"
    released = release_new_persistent_rdds(spark, base)
    assert released >= 1
    assert snapshot_persistent_rdds(spark) <= base
    # the pre-baseline "index" is still cached and usable
    assert index.storageLevel.useMemory
    assert index.count() == 100
    index.unpersist()
