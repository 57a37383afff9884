"""The bench's mechanical stall-adjudication protocol (r12 verdict
directive 2, tightened per ADVICE r13): cells whose timed-rep spread
exceeds a quarter of their median get one same-session re-run, and
the re-run replaces the first series only on a CLEAR stall signature
(median improvement past the spread fraction); plus the r13-directive
cross-round suspect flag. Pure-Python logic — no Spark session
needed."""

from __future__ import annotations

import bench


class TestStallAdjudication:
    def test_clean_cell_not_suspect(self):
        # the documented healthy shape: spreads 5-15% of the median
        # (serve tiers: <0.3s on 2-6s walls)
        assert not bench.is_stall_suspect([2.544, 2.601, 2.575])
        assert not bench.is_stall_suspect([5.9, 6.1, 6.15])

    def test_stall_signature_is_suspect(self):
        # the r12 st2 cell: median 2.855 with spread 0.832 (29% — a
        # 0.41s-code cell reading 7x slow); the exact shape the
        # protocol exists to catch
        assert bench.is_stall_suspect([2.855, 2.445, 3.277])
        # the r12 t4 cell: median 1.909, spread 0.957 (50%)
        assert bench.is_stall_suspect([1.909, 1.40, 2.357])
        # two stalled reps inflate the median itself — tripped even
        # when the code's true wall is far below the floor (a SINGLE
        # stalled rep is absorbed by the median-of-3 and correctly
        # left alone below the floor)
        assert bench.is_stall_suspect([0.45, 1.85, 1.90])

    def test_noise_floor_exempt(self):
        # sub-floor medians: spread/median is scheduler noise there,
        # a re-run decides nothing — and a REAL stall inflates the
        # median past the floor anyway (the r12 stalls read 1.9-2.9s
        # on 0.3-0.4s code), so nothing that matters is exempted
        assert not bench.is_stall_suspect([0.05, 0.02, 0.11])
        assert not bench.is_stall_suspect([0.35, 0.25, 0.49])

    def test_boundary_uses_median_fraction(self):
        med = 1.0
        just_under = [med, med - 0.12, med + 0.12]  # spread 0.24
        just_over = [med, med - 0.15, med + 0.15]  # spread 0.30
        assert not bench.is_stall_suspect(just_under)
        assert bench.is_stall_suspect(just_over)

    def test_pick_series_keeps_clear_stall_rerun(self):
        # a real stall: the settled re-run improves the median 6x —
        # far past the spread fraction — so it replaces the series
        stalled = [2.855, 2.023, 3.011]
        settled = [0.452, 0.488, 0.471]
        assert bench.pick_series(stalled, settled) == "rerun"
        assert bench.pick_series(settled, stalled) == "first"

    def test_pick_series_keeps_first_on_ordinary_variance(self):
        """ADVICE r13: a cell that trips on genuine variance (the
        re-run lands within the spread threshold of the first
        median) keeps the FIRST series — taking the lower of two
        medians would bias tripped cells downward, compounded by
        the warmer-JIT re-run."""
        first = [2.0, 1.7, 2.4]  # spread 0.7 > 0.25 x 2.0 -> trips
        rerun = [1.9, 1.8, 2.0]  # 5% better: noise, not a stall
        assert bench.pick_series(first, rerun) == "first"
        # exactly-at-threshold improvement is still variance
        assert bench.pick_series(
            [2.0, 2.0, 2.0], [1.5, 1.5, 1.5]
        ) == "first"
        # just past the threshold: a stall signature
        assert bench.pick_series(
            [2.0, 2.0, 2.0], [1.4, 1.4, 1.4]
        ) == "rerun"


class TestCrossRoundSuspects:
    """r13 verdict directive 5: the cross-round sanity flag for
    uniformly-slow-window stalls (g1's double-stall escaped the
    within-session trigger)."""

    def test_flags_doubled_wall(self):
        got = bench.cross_round_suspects(
            {"g1": 5.839, "v1": 1.0}, {"g1": 1.59, "v1": 0.95}
        )
        assert got == {"g1": {"now": 5.839, "prior": 1.59}}

    def test_respects_floor_and_missing_prior(self):
        got = bench.cross_round_suspects(
            {"tiny": 0.9, "new_query": 10.0},
            {"tiny": 0.3},  # prior below the 0.5s floor; new: absent
        )
        assert got == {}

    def test_within_band_not_flagged(self):
        assert bench.cross_round_suspects(
            {"q": 2.9}, {"q": 1.5}
        ) == {}

    def test_load_prior_bench_picks_latest_normalized(self, tmp_path):
        import json

        (tmp_path / "bench_full_r08.json").write_text(
            json.dumps({"queries": {"q": 1.0}})
        )
        # normalized preferred over raw when present (r14 review:
        # cross-VM comparison must be host-factor-corrected)
        (tmp_path / "bench_full_r11.json").write_text(
            json.dumps(
                {
                    "queries": {"q": 2.0},
                    "queries_normalized": {"q": 2.5},
                }
            )
        )
        prior, name = bench.load_prior_bench(tmp_path)
        assert prior == {"q": 2.5}
        assert name == "bench_full_r11.json"

    def test_load_prior_bench_raw_fallback(self, tmp_path):
        import json

        (tmp_path / "bench_full_r03.json").write_text(
            json.dumps({"queries": {"q": 1.5}})
        )
        assert bench.load_prior_bench(tmp_path)[0] == {"q": 1.5}

    def test_load_prior_bench_empty_dir(self, tmp_path):
        assert bench.load_prior_bench(tmp_path) == ({}, "")


class TestContractLine:
    """r14 verdict "What's wrong" #2: the stdout contract line must
    stay small enough that the driver's output capture can never
    truncate it mid-object again — required keys plus scalars only,
    with the bulky payload diverted to the bench_full file."""

    PAYLOAD = {
        "metric": "anchor18_queries_total_wall",
        "value": 11.3,
        "unit": "sec",
        "queries": {f"q{i}": 0.5 for i in range(120)},
        "sf": 0.1,
        "value_full": 178.3,
        "calibration_s": 2.97,
        "host_factor": 0.878,
        # bulky keys that must NOT leak onto the line
        "spread": {f"q{i}": 0.1 for i in range(120)},
        "stall_reruns": {"q1": {"first": [1, 2, 3]}},
        "queries_normalized": {f"q{i}": 0.6 for i in range(120)},
        "sf1_probe": {"queries_sf1": {f"q{i}": 1.0 for i in range(60)}},
        "host_note": "x" * 2000,
    }

    def test_required_driver_keys_present(self):
        line = bench.contract_line(self.PAYLOAD, "bench_full_r15.json")
        for key in ("metric", "value", "unit", "queries", "sf"):
            assert key in line
        assert line["queries"] == self.PAYLOAD["queries"]
        assert line["value"] == 11.3

    def test_bulky_keys_excluded_and_line_compact(self):
        import json

        line = bench.contract_line(self.PAYLOAD, "bench_full_r15.json")
        for key in (
            "spread",
            "stall_reruns",
            "queries_normalized",
            "sf1_probe",
            "host_note",
        ):
            assert key not in line
        # ~120 medians serialize to ~2-4 KB; anything over 16 KB
        # risks the r13 truncation again
        assert len(json.dumps(line)) < 16384

    def test_round_trips_through_json(self):
        import json

        line = bench.contract_line(self.PAYLOAD, None)
        assert json.loads(json.dumps(line)) == line
