"""Tests for Z-order (Morton) clustering layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators.layout import (
    bucketize,
    interleave_bits,
    zorder_code,
)


def _py_interleave(vals, bits):
    out = 0
    k = len(vals)
    for j, x in enumerate(vals):
        for i in range(bits):
            out |= ((x >> i) & 1) << (i * k + j)
    return out


class TestInterleave:
    def test_matches_python_reference(self, spark):
        rows = [(x, y) for x in range(0, 256, 37) for y in range(0, 256, 53)]
        df = spark.createDataFrame(rows, ["x", "y"])
        got = df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], 8).alias("z")
        ).collect()
        for r in got:
            assert r["z"] == _py_interleave([r["x"], r["y"]], 8)

    def test_three_dims(self, spark):
        df = spark.createDataFrame([(5, 3, 6)], ["a", "b", "c"])
        z = df.select(
            interleave_bits(
                [F.col("a"), F.col("b"), F.col("c")], 4
            ).alias("z")
        ).collect()[0]["z"]
        assert z == _py_interleave([5, 3, 6], 4)


class TestBucketize:
    def test_boundary_semantics(self, spark):
        df = spark.createDataFrame(
            [(0.5,), (1.0,), (1.5,), (2.5,), (None,)], "v double"
        )
        got = [
            r["b"]
            for r in df.select(
                bucketize(F.col("v"), [1.0, 2.0]).alias("b")
            ).collect()
        ]
        # <1.0 -> 0; [1.0,2.0) -> 1 (boundary <= value); >=2.0 -> 2;
        # NULL -> 0
        assert got == [0, 1, 1, 2, 0]


class TestZorderClustering:
    def test_locality_beats_single_column_sort(self, spark):
        """The point of z-ordering: after sorting by the code and
        slicing into row-group-sized chunks, a predicate box on the
        SECOND dimension overlaps far fewer chunks' min/max ranges
        than under a first-dimension-only sort."""
        import random

        rng = random.Random(7)
        rows = [
            (rng.randrange(10_000), rng.randrange(10_000))
            for _ in range(4096)
        ]
        df = spark.createDataFrame(rows, ["x", "y"])
        coded = zorder_code(df, ["x", "y"], bits=6)

        def chunks_touched(ordered_rows, chunk, lo, hi):
            touched = 0
            for s in range(0, len(ordered_rows), chunk):
                ys = [r["y"] for r in ordered_rows[s : s + chunk]]
                if min(ys) <= hi and max(ys) >= lo:
                    touched += 1
            return touched

        z_sorted = coded.orderBy("__zorder").collect()
        x_sorted = coded.orderBy("x").collect()
        z_touch = chunks_touched(z_sorted, 256, 4000, 4500)
        x_touch = chunks_touched(x_sorted, 256, 4000, 4500)
        assert z_touch < x_touch, (z_touch, x_touch)
        # and x stays prunable too (not strictly better than an
        # x-sort for x, but bounded: every chunk must NOT span the
        # whole x range)
        full_span = 0
        for s in range(0, len(z_sorted), 256):
            xs = [r["x"] for r in z_sorted[s : s + 256]]
            if max(xs) - min(xs) > 9000:
                full_span += 1
        assert full_span <= len(z_sorted) // 256 // 2

    def test_write_sorted_within_files(self, spark, tmp_path):
        """load_table(sort_within_partitions=[__zorder]) must leave
        each parquet file's rows in code order (clustered row
        groups)."""
        li = spark.range(0, 2000).select(
            (F.col("id") * 37 % 1000).alias("x"),
            (F.col("id") * 91 % 1000).alias("y"),
        )
        coded = zorder_code(li, ["x", "y"], bits=6)
        path = str(tmp_path / "zt")
        coded.repartition(4).sortWithinPartitions("__zorder").write.parquet(
            path
        )
        import glob

        for f in glob.glob(f"{path}/*.parquet"):
            vals = [
                r["__zorder"]
                for r in spark.read.parquet(f).select("__zorder").collect()
            ]
            assert vals == sorted(vals)


def test_interleave_bits_sign_bit_bound(spark):
    """ADVICE r6: bits*len(cols) > 63 would put the top bit in the
    LONG sign bit (negative Morton codes sort first, silently
    destroying the clustering) — both entry points must refuse."""
    import pytest

    from pyspark.sql import functions as F

    from garmin_data_pipeline_spark.operators.layout import (
        interleave_bits,
        zorder_code,
    )

    cols = [F.col(f"c{i}") for i in range(8)]
    with pytest.raises(ValueError, match="63"):
        interleave_bits(cols, bits=8)  # 64 bits
    with pytest.raises(ValueError, match="63"):
        interleave_bits(cols[:4], bits=16)  # 64 bits
    # 63 exactly is fine (7 cols x 9 bits)
    interleave_bits(cols[:7], bits=9)
    df = spark.range(4).selectExpr(*[f"id as c{i}" for i in range(8)])
    with pytest.raises(ValueError, match="63"):
        zorder_code(df, [f"c{i}" for i in range(8)], bits=8)
