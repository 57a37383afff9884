"""The bench's mechanical stall-adjudication protocol (r12 verdict
directive 2): cells whose timed-rep spread exceeds half their median
get one same-session re-run and the lower-median series is reported.
Pure-Python logic — no Spark session needed."""

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

    def test_pick_series_keeps_lower_median(self):
        stalled = [2.855, 2.023, 3.011]
        settled = [0.452, 0.488, 0.471]
        assert bench.pick_series(stalled, settled) == "rerun"
        assert bench.pick_series(settled, stalled) == "first"

    def test_pick_series_tie_prefers_rerun(self):
        # equal medians: the later, settled measurement wins
        assert bench.pick_series([1.0, 1.0, 1.0], [1.0, 0.9, 1.1]) == (
            "rerun"
        )
