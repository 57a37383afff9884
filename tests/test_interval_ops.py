"""Edge semantics of the r8 warehouse additions: the interval x
interval overlap join (j9 / operators.joins.join_interval_overlap),
the time-weighted average (w9), and the corpus-sized SemDeDup scale
path (v6s / semantic_dedup_scaled)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(h, m=0, day=1):
    return dt.datetime(2024, 3, day, h, m, 0)


class TestIntervalOverlapJoin:
    SCHEMA_A = "aid long, user_id long, s timestamp, e timestamp"
    SCHEMA_B = "bid long, user_id long, s timestamp, e timestamp"

    def _join(self, spark, rows_a, rows_b, bin_seconds=3600):
        from garmin_data_pipeline_spark.operators.joins import (
            join_interval_overlap,
        )

        a = spark.createDataFrame(rows_a, self.SCHEMA_A).select(
            "aid", "user_id",
            F.col("s").alias("sa"), F.col("e").alias("ea"),
        )
        b = spark.createDataFrame(rows_b, self.SCHEMA_B).select(
            "bid", "user_id",
            F.col("s").alias("sb"), F.col("e").alias("eb"),
        )
        return join_interval_overlap(
            a, b, "sa", "ea", "sb", "eb",
            by=["user_id"], bin_seconds=bin_seconds,
        )

    def test_overlap_touch_and_disjoint(self, spark):
        out = self._join(
            spark,
            [(1, 10, _ts(9), _ts(11))],
            [
                (1, 10, _ts(10), _ts(12)),   # overlaps 1h
                (2, 10, _ts(11), _ts(12)),   # touches -> overlap 0
                (3, 10, _ts(12), _ts(13)),   # disjoint
                (4, 99, _ts(9), _ts(11)),    # other user
            ],
        ).collect()
        got = {r["bid"]: r["overlap_us"] for r in out}
        assert got == {1: 3_600_000_000, 2: 0}

    def test_multi_bin_pair_appears_exactly_once(self, spark):
        # Both intervals span many 1-hour bins; the equi-join matches
        # them in every shared bin, but the overlap-start-bin rule
        # must keep exactly one copy (dedup-by-construction, no
        # distinct in the plan).
        out = self._join(
            spark,
            [(1, 10, _ts(1), _ts(20))],
            [(1, 10, _ts(2), _ts(23))],
        ).collect()
        assert len(out) == 1
        assert out[0]["overlap_us"] == 18 * 3_600_000_000  # 02:00-20:00
        plan = (
            self._join(
                spark,
                [(1, 10, _ts(1), _ts(20))],
                [(1, 10, _ts(2), _ts(23))],
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Distinct" not in plan and "distinct" not in plan

    def test_nested_interval_full_containment(self, spark):
        out = self._join(
            spark,
            [(1, 10, _ts(1), _ts(23))],
            [(1, 10, _ts(5), _ts(6))],
        ).collect()
        assert len(out) == 1
        assert out[0]["overlap_us"] == 3_600_000_000


class TestTimeWeightedAverage:
    def test_hand_computed_twa(self, spark, tmp_path):
        import duckdb

        from garmin_data_pipeline_spark import plans

        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        rows = [
            # user 1: value 10 held 1h, value 30 held 3h -> twa = 25
            (1, _ts(9), 1, "m", 10.0, "{}"),
            (2, _ts(10), 1, "m", 30.0, "{}"),
            (3, _ts(13), 1, "m", 99.0, "{}"),   # last point: no weight
            # user 2: single observation -> NULL twa
            (4, _ts(9), 2, "m", 5.0, "{}"),
            # user 3: duplicate ts (zero-length hold contributes 0)
            (5, _ts(9), 3, "m", 1.0, "{}"),
            (6, _ts(9), 3, "m", 2.0, "{}"),
            (7, _ts(10), 3, "m", 7.0, "{}"),
        ]
        df = spark.createDataFrame(rows, schema)
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {
            r["user_id"]: r
            for r in plans.QUERIES["w9_time_weighted_avg"]
            .fn(spark, str(tmp_path))
            .collect()
        }
        # twa_e6 = floor(twa * 1e6): 25.0 -> 25_000_000 exactly
        assert out[1]["twa_e6"] == 25_000_000
        assert out[1]["held_us"] == 4 * 3_600_000_000
        assert out[2]["twa_e6"] is None and out[2]["held_us"] is None
        # user 3: event 5 holds 0us (dup ts), event 6 holds 1h at 2.0
        assert out[3]["twa_e6"] == 2_000_000
        # oracle agreement on the same edge frame
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet/*.parquet'"
        )
        odf = con.execute(
            plans.QUERIES["w9_time_weighted_avg"].oracle
        ).df()
        o = {int(r.user_id): r for _, r in odf.iterrows()}
        assert o[1].twa_e6 == 25_000_000 and o[3].twa_e6 == 2_000_000


class TestSemanticDedupScaled:
    def test_codebook_scales_and_dedup_holds(self, spark, sf_dir):
        from garmin_data_pipeline_spark.operators.similarity import (
            semantic_dedup_scaled,
        )
        from garmin_data_pipeline_spark.plans.registry import table

        emb = table(spark, sf_dir, "embeddings")
        n = emb.count()
        out = semantic_dedup_scaled(
            emb, threshold=0.3, target_cell_size=64
        )
        survivors = out.collect()
        assert 0 < len(survivors) <= n
        # constant-occupancy sizing: 500 vectors / 64 -> 8-cell floor
        # (cells are 0-indexed, so every id is < n_cells)
        assert max(r["cell"] for r in survivors) < max(8, n // 64)
        # deterministic: same survivors on a rebuilt plan
        again = semantic_dedup_scaled(
            emb, threshold=0.3, target_cell_size=64
        ).collect()
        assert {r["vec_id"] for r in survivors} == {
            r["vec_id"] for r in again
        }

    def test_product_assignment_matches_numpy_argmax(self, spark):
        import numpy as np

        from garmin_data_pipeline_spark.operators.similarity import (
            assign_cells_product,
            grid_centroids,
        )

        dim = 8
        books_a = grid_centroids(5, dim, salt=1)
        books_b = grid_centroids(3, dim, salt=2)
        rng = np.random.RandomState(7)
        vecs = rng.randn(40, dim).round(4)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: r["cell"]
            for r in assign_cells_product(df, books_a, books_b).collect()
        }
        A, B = np.array(books_a), np.array(books_b)
        for i, v in enumerate(vecs):
            # np.argmax takes the FIRST max — the lowest-cell tiebreak
            want = int(np.argmax(A @ v)) * len(books_b) + int(
                np.argmax(B @ v)
            )
            assert got[i] == want

    def test_product_path_dedups_exact_duplicates(self, spark):
        # 500-vector corpus with target_cell_size=4 -> 125 cells >
        # the 64-cell flat cutoff, so this exercises the PRODUCT
        # assignment end-to-end. Exact copies score identical dots in
        # both codebooks -> same cell under any deterministic
        # assignment, so every copy with a higher id must be dropped.
        import numpy as np

        from garmin_data_pipeline_spark.operators.similarity import (
            semantic_dedup_scaled,
        )

        rng = np.random.RandomState(11)
        # 64 dims: cross-pair cosines concentrate at ~N(0, 1/64), so
        # a spurious >=0.99 collision among the 31k distinct pairs is
        # ~8-sigma improbable (16 dims would expect ~1 — measured).
        base = rng.randn(250, 64)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        rows = [
            (i, [float(x) for x in base[i % 250]]) for i in range(500)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = semantic_dedup_scaled(
            df, threshold=0.99, target_cell_size=4, dim=64
        )
        survivors = {r["vec_id"] for r in out.collect()}
        # every id >= 250 is an exact copy of id-250 -> all dropped
        assert survivors == set(range(250))
        cells = {r["cell"] for r in out.collect()}
        assert max(cells) < 12 * 12  # ceil(sqrt(125))^2 product cells


class TestIntervalOverlapRandomized:
    def test_matches_bruteforce_on_random_intervals(self, spark):
        """Differential check on a seeded random workload: every
        (a, b) pair the O(n^2) reference finds — and none it doesn't
        — with the exact same overlap length, across interval lengths
        from sub-bin to many-bin and a bin size chosen so multi-bin
        spans are common."""
        import random

        from garmin_data_pipeline_spark.operators.joins import (
            join_interval_overlap,
        )

        rng = random.Random(20260814)
        base = dt.datetime(2024, 3, 1)

        def mk(n, idc):
            rows = []
            for i in range(n):
                user = rng.randint(1, 4)
                start = base + dt.timedelta(
                    minutes=rng.randint(0, 7 * 24 * 60)
                )
                end = start + dt.timedelta(
                    minutes=rng.randint(0, 3 * 24 * 60)
                )
                rows.append((idc * 10_000 + i, user, start, end))
            return rows

        rows_a, rows_b = mk(60, 1), mk(60, 2)
        bf = {}
        for aid, ua, sa, ea in rows_a:
            for bid, ub, sb, eb in rows_b:
                if ua == ub and sa <= eb and sb <= ea:
                    ov = min(ea, eb) - max(sa, sb)
                    bf[(aid, bid)] = int(ov.total_seconds() * 1e6)

        a = spark.createDataFrame(
            rows_a, "aid long, user_id long, sa timestamp, ea timestamp"
        )
        b = spark.createDataFrame(
            rows_b, "bid long, user_id long, sb timestamp, eb timestamp"
        )
        got = {
            (r["aid"], r["bid"]): r["overlap_us"]
            for r in join_interval_overlap(
                a, b, "sa", "ea", "sb", "eb",
                by=["user_id"], bin_seconds=86400,
            ).collect()
        }
        assert got == bf


class TestEwma8:
    """Hand-computed EWMA cases for w10_ewma_8 (r9 verdict directive
    1): the registry's generic oracle gate is the exact signal w9
    proved insufficient, so the weighting arithmetic gets a
    paper-checkable pin here."""

    SCHEMA = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )

    def _run(self, spark, tmp_path, rows):
        from garmin_data_pipeline_spark import plans

        df = spark.createDataFrame(rows, self.SCHEMA)
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        return (
            plans.QUERIES["w10_ewma_8"].fn(spark, str(tmp_path)),
            plans.QUERIES["w10_ewma_8"].oracle,
        )

    def test_hand_computed_three_point_series(self, spark, tmp_path):
        import duckdb

        rows = [
            (1, _ts(9), 1, "m", 10.0, "{}"),
            (2, _ts(10), 1, "m", 20.0, "{}"),
            (3, _ts(11), 1, "m", 40.0, "{}"),
        ]
        out_df, oracle = self._run(spark, tmp_path, rows)
        out = {r["event_id"]: r["ewma_e6"] for r in out_df.collect()}
        # row 1: 10/1                          = 10.0
        # row 2: (20 + 10*0.5)/1.5             = 16.666...
        # row 3: (40 + 20*0.5 + 10*0.25)/1.75  = 30.0
        assert out == {
            1: 10_000_000,
            2: 16_666_666,  # floor, not round (16.666666...)
            3: 30_000_000,
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet/*.parquet'"
        )
        odf = con.execute(oracle).df()
        o = {int(r.event_id): int(r.ewma_e6) for _, r in odf.iterrows()}
        assert o == out

    def test_window_caps_at_eight_observations(self, spark, tmp_path):
        # 9 observations; v1=256 so its presence/absence is visible:
        #   row 8 covers k=0..7 -> includes v1 at weight 2^-7:
        #     num = 127/64 + 256/128 = 3.984375, den = 255/128
        #     -> exactly 2.0
        #   row 9 covers v2..v9 (all 1.0) -> exactly 1.0 (v1 aged out)
        rows = [
            (k, _ts(9, k), 7, "m", 256.0 if k == 1 else 1.0, "{}")
            for k in range(1, 10)
        ]
        out_df, _ = self._run(spark, tmp_path, rows)
        out = {r["event_id"]: r["ewma_e6"] for r in out_df.collect()}
        assert out[8] == 2_000_000
        assert out[9] == 1_000_000


class TestIntervalAntiJoin:
    def test_j10_and_j9_partition_the_click_intervals(
        self, spark, sf_dir
    ):
        """j10 is defined as j9's complement: every click-state
        interval is either overlapped (appears among j9's distinct
        click sides) or a coverage gap (appears in j10), never both
        and never neither."""
        from pyspark.sql.window import Window

        from garmin_data_pipeline_spark import plans
        from garmin_data_pipeline_spark.plans.registry import table

        j9 = plans.QUERIES["j9_interval_overlap"].fn(spark, sf_dir)
        j10 = plans.QUERIES["j10_interval_anti_join"].fn(spark, sf_dir)
        overlapped = {
            (r["user_id"], r["click_start"], r["click_end"])
            for r in j9.select(
                "user_id", "click_start", "click_end"
            ).distinct().collect()
        }
        gaps = {
            (r["user_id"], r["click_start"], r["click_end"])
            for r in j10.collect()
        }
        # independent reconstruction of ALL click-state intervals
        ev = table(spark, sf_dir, "events").filter(
            F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        clicks = {
            (r["user_id"], r["s"], r["e"])
            for r in ev.filter(F.col("event_type") == "click")
            .select(
                "user_id",
                F.col("ts").alias("s"),
                F.lead("ts").over(w).alias("e"),
            )
            .filter(F.col("e").isNotNull())
            .collect()
        }
        assert overlapped and gaps, "vacuous at this SF — reshape"
        assert overlapped.isdisjoint(gaps)
        assert overlapped | gaps == clicks
