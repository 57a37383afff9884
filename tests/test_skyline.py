"""Pareto frontier (operators/skyline.py): hand-computed dominance
and tie semantics, then a randomized differential against a python
brute-force mirror — including timestamps that straddle the internal
day-bucket boundary, the seam the two-level prefix max must get
right."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from garmin_data_pipeline_spark.operators.skyline import (
    pareto_frontier_2d,
)

T0 = datetime(2020, 1, 1)


def _brute(rows):
    """ids of non-dominated rows: (id, t, v), minimize t maximize v."""
    out = []
    for i, t, v in rows:
        dominated = any(
            (t2 <= t and v2 >= v) and (t2 < t or v2 > v)
            for _, t2, v2 in rows
        )
        if not dominated:
            out.append(i)
    return sorted(out)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    got = pareto_frontier_2d(df, "ts", "v").select("id").collect()
    return sorted(r["id"] for r in got)


class TestParetoFrontier:
    def test_hand_computed_with_ties(self, spark):
        h = timedelta(hours=1)
        rows = [
            (1, T0, 10.0),          # frontier (earliest)
            (2, T0, 10.0),          # tie on BOTH axes with 1 -> kept
            (3, T0, 5.0),           # same ts, lower v -> dominated by 1
            (4, T0 + h, 10.0),      # later ts, equal v -> dominated by 1
            (5, T0 + h, 12.0),      # later but higher -> frontier
            (6, T0 + 2 * h, 11.0),  # dominated by 5
            (7, T0 + 3 * h, 13.0),  # frontier
        ]
        assert _run(spark, rows) == [1, 2, 5, 7]
        assert _brute(rows) == [1, 2, 5, 7]

    def test_cross_day_bucket_seam(self, spark):
        # best value sits at 23:30; next day opens lower (dominated),
        # then beats it at 01:00 — the cross-bucket prefix max, not
        # the in-bucket window, must carry the 23:30 value over.
        rows = [
            (1, datetime(2020, 1, 1, 23, 30), 100.0),
            (2, datetime(2020, 1, 2, 0, 10), 90.0),
            (3, datetime(2020, 1, 2, 1, 0), 101.0),
        ]
        assert _run(spark, rows) == [1, 3]

    def test_randomized_vs_bruteforce(self, spark):
        rng = random.Random(1234)
        rows = [
            (
                i,
                T0 + timedelta(minutes=rng.randrange(0, 60 * 24 * 7)),
                float(rng.randrange(0, 400)),
            )
            for i in range(250)
        ]
        assert _run(spark, rows) == _brute(rows)
