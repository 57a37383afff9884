"""r14 optimization: the SQL-text expression fast paths must be
VALUE-IDENTICAL to the py4j-built Column forms they replaced.

The serve tiers' bench walls were dominated by Python-side plan
construction (one py4j round trip per literal / per lambda — measured
~100 ms per 128-double codebook, ~6 s of a 7.5 s v9r cell); the fast
paths build the same trees as one parsed ``F.expr`` string. These
tests pin bit-for-bit parity of every migrated expression on real
embedding data, so the certified v9p/v9pss/v9rp/v8 oracle rows cannot
drift.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators.similarity import (
    _fmt_d,
    _pq_code_expr,
    _pq_subdists,
    as_double_array,
    hyperplanes,
    lit_double_array,
    lit_double_matrix,
    lsh_bucket,
    pq_codebooks,
    sql_double_array,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)


class TestFmtD:
    def test_round_trips_exactly(self, spark):
        vals = [0.0, -0.0, 1.0, -1.0, 0.123456, -0.654321,
                1e-07, 12345.678901, 2.5e10, 7e-05]
        row = spark.range(1).select(
            *[F.expr(_fmt_d(v)).alias(f"c{i}") for i, v in enumerate(vals)]
        ).first()
        assert [row[f"c{i}"] for i in range(len(vals))] == vals

    def test_rejects_non_finite(self):
        for bad in (float("nan"), float("inf"), float("-inf")):
            with pytest.raises(ValueError):
                _fmt_d(bad)


class TestLitArrays:
    def test_matrix_equals_py4j_form(self, spark):
        book = pq_codebooks(8, 16, 8)[3]
        old = F.array(*[F.array(*[F.lit(w) for w in cw]) for cw in book])
        row = spark.range(1).select(
            old.alias("a"), lit_double_matrix(book).alias("b")
        ).first()
        assert row["a"] == row["b"]

    def test_array_equals_py4j_form(self, spark):
        plane = hyperplanes(8, 64)[5]
        old = F.array(*[F.lit(x) for x in plane])
        row = spark.range(1).select(
            old.alias("a"), lit_double_array(plane).alias("b")
        ).first()
        assert row["a"] == row["b"]


class TestSqlFastPathParity:
    def test_lsh_bucket_string_vs_column(self, emb):
        planes = hyperplanes(8, 64)
        got = emb.select(
            "vec_id",
            lsh_bucket(as_double_array("embedding"), planes).alias("a"),
            lsh_bucket(sql_double_array("embedding"), planes).alias("b"),
        ).collect()
        assert all(r["a"] == r["b"] for r in got)

    def test_pq_subdists_string_vs_column(self, emb):
        books = pq_codebooks(8, 16, 8)
        got = emb.select(
            _pq_subdists(F.col("embedding"), 2, books[2], 8).alias("a"),
            _pq_subdists("embedding", 2, books[2], 8).alias("b"),
        ).collect()
        # exact double equality, element-wise
        assert all(r["a"] == r["b"] for r in got)

    def test_pq_code_expr_string_vs_column(self, emb):
        books = pq_codebooks(8, 16, 8)
        got = emb.select(
            _pq_code_expr(F.col("embedding"), 8, 16, 8, books).alias("a"),
            _pq_code_expr("embedding", 8, 16, 8, books).alias("b"),
        ).collect()
        assert all(r["a"] == r["b"] for r in got)
