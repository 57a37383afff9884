"""Z-order layout (operators/layout.py): the Morton key arithmetic
against a python brute-force mirror, and the measurable effect the
layout exists for — per-file parquet min/max spans tighten on BOTH
filter columns, which is what lets scans prune row groups on either
predicate."""

from __future__ import annotations

from pyspark.sql import functions as F


def _py_zkey(a, b, amin, amax, bmin, bmax, bits=16):
    top = (1 << bits) - 1

    def scale(v, lo, hi):
        return ((v - lo) * top) // (hi - lo) if hi > lo else 0

    sa, sb = scale(a, amin, amax), scale(b, bmin, bmax)
    z = 0
    for i in range(bits):
        z += ((sa >> i) & 1) << (2 * i)
        z += ((sb >> i) & 1) << (2 * i + 1)
    return z


class TestZorderKey:
    def test_key_matches_python_mirror(self, spark):
        rows = [
            (1, 0, 0),
            (2, 7, 1_000_000),
            (3, 99, 123_456_789),
            (4, 55, 999_999_999),
            (5, 99, 0),
        ]
        df = spark.createDataFrame(rows, "event_id long, u long, t long")
        from garmin_data_pipeline_spark.operators.layout import (
            with_zorder_key,
        )

        got = {
            r["event_id"]: r["z"]
            for r in with_zorder_key(df, "u", "t", out="z").collect()
        }
        us = [r[1] for r in rows]
        ts = [r[2] for r in rows]
        want = {
            e: _py_zkey(u, t, min(us), max(us), min(ts), max(ts))
            for e, u, t in rows
        }
        assert got == want

    def test_degenerate_single_value_column(self, spark):
        from garmin_data_pipeline_spark.operators.layout import (
            with_zorder_key,
        )

        df = spark.createDataFrame(
            [(1, 5, 10), (2, 5, 20)], "event_id long, u long, t long"
        )
        out = {
            r["event_id"]: r["z"]
            for r in with_zorder_key(df, "u", "t", out="z").collect()
        }
        # u is constant -> scales to 0; z is the spread of t alone
        assert out[1] == 0
        assert out[2] == _py_zkey(5, 20, 5, 5, 10, 20)

    def test_key_stays_jvm_side(self, spark):
        from garmin_data_pipeline_spark.operators.layout import (
            with_zorder_key,
        )

        df = spark.createDataFrame(
            [(1, 5, 10)], "event_id long, u long, t long"
        )
        plan = (
            with_zorder_key(df, "u", "t")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan


class TestZorderLayout:
    def _spans(self, path, cols):
        """Per-file (span_fraction_per_col) from parquet footers."""
        from pathlib import Path

        import pyarrow.parquet as pq

        files = sorted(Path(path).glob("*.parquet"))
        assert files
        mins: dict[str, list] = {c: [] for c in cols}
        maxs: dict[str, list] = {c: [] for c in cols}
        for f in files:
            md = pq.read_metadata(f)
            per_file = {c: [None, None] for c in cols}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in cols and col.statistics is not None:
                        st = col.statistics
                        lo, hi = per_file[name]
                        per_file[name] = [
                            st.min if lo is None else min(lo, st.min),
                            st.max if hi is None else max(hi, st.max),
                        ]
            for c in cols:
                mins[c].append(per_file[c][0])
                maxs[c].append(per_file[c][1])
        fracs = {}
        for c in cols:
            glo, ghi = min(mins[c]), max(maxs[c])
            span = ghi - glo or 1
            fracs[c] = sum(
                (hi - lo) / span for lo, hi in zip(mins[c], maxs[c])
            ) / len(files)
        return fracs

    def test_zorder_tightens_stats_on_both_axes(
        self, spark, sf_dir, tmp_path
    ):
        from garmin_data_pipeline_spark.functions.durations import (
            epoch_micros,
        )
        from garmin_data_pipeline_spark.operators.layout import (
            write_zordered,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev = ev.filter(
            F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        ).select(
            "event_id",
            "user_id",
            epoch_micros("ts", dtype=ev.schema["ts"].dataType).alias(
                "t"
            ),
        )
        zpath = str(tmp_path / "z")
        ppath = str(tmp_path / "plain")
        write_zordered(ev, zpath, "user_id", "t", n_files=8)
        ev.repartition(8).write.mode("overwrite").parquet(ppath)

        zf = self._spans(zpath, ["user_id", "t"])
        pf = self._spans(ppath, ["user_id", "t"])
        # round-robin files each cover ~the whole range on both axes
        assert pf["user_id"] > 0.9 and pf["t"] > 0.9, pf
        # the z-curve gives every file a small rectangle: materially
        # tighter per-file spans on BOTH columns at once (a plain
        # single-column sort would tighten one axis and leave the
        # other at ~1.0)
        assert zf["user_id"] < 0.6, zf
        assert zf["t"] < 0.6, zf
