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


class TestGateAndLangidParity:
    """The r14 unconditional-gate rewrite (plans/llm_queries.py
    _gate_and_hash) and the integer-hits language argmax
    (operators/text.py language_guess) must make the SAME decisions
    as the guarded ratio forms they replaced, on the corpus AND on
    the degenerate rows the guards used to rescue."""

    def _docs(self, spark):
        from pyspark.sql import functions as F

        base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        edge = spark.createDataFrame(
            [
                (100001, ""),
                (100002, "   "),
                (100003, "word"),
                (100004, "the the"),
                (100005, None),
                (100006, "der die das und ist nicht ein zu mit"),
                (100007, "el la los las y es de que un en"),
                (100008, "le la les et est un une des du que"),
            ],
            "doc_id long, text string",
        )
        return base.select("doc_id", "text").unionByName(edge)

    def test_language_guess_matches_ratio_argmax(self, spark):
        from pyspark.sql import functions as F

        from garmin_data_pipeline_spark.operators.text import (
            LANG_PRIORITY,
            language_guess,
            language_scores,
        )

        docs = self._docs(spark)
        scores = language_scores(F.col("text"))
        ratio = F.lit(LANG_PRIORITY[-1])
        for i in range(len(LANG_PRIORITY) - 2, -1, -1):
            lang = LANG_PRIORITY[i]
            cond = None
            for other in LANG_PRIORITY[i + 1 :]:
                c = scores[lang] >= scores[other]
                cond = c if cond is None else (cond & c)
            ratio = F.when(cond, F.lit(lang)).otherwise(ratio)
        rows = docs.select(
            language_guess(F.col("text")).alias("fast"),
            ratio.alias("ref"),
        ).collect()
        assert all(r["fast"] == r["ref"] for r in rows)

    def test_gate_keep_set_matches_guarded_form(self, spark):
        from pyspark.sql import functions as F

        from garmin_data_pipeline_spark.plans.llm_queries import (
            _gate_and_hash,
        )
        from garmin_data_pipeline_spark.operators.text import (
            shingles,
            stopword_hits,
            tokens,
        )

        docs = self._docs(spark).select(
            "doc_id",
            F.lit(1).cast("bigint").alias("n_fetches"),
            "text",
        )
        got = {
            r["doc_id"]
            for r in _gate_and_hash(docs).select("doc_id").collect()
        }
        # the pre-r14 guarded formulation, verbatim
        text = F.col("text")
        toks = tokens(text)
        n_tokens = F.size(toks)
        mwl = F.when(
            n_tokens > 0,
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.length(x),
            )
            / n_tokens,
        ).otherwise(F.lit(0.0))
        swr = F.when(
            n_tokens > 0, stopword_hits(toks, "en") / n_tokens
        ).otherwise(F.lit(0.0))
        dup2 = F.when(
            n_tokens >= 2,
            F.round(
                1.0 - F.size(shingles(text, 2)) / (n_tokens - 1), 6
            ),
        ).otherwise(F.lit(0.0))
        keep = (
            n_tokens.between(30, 5000)
            & (mwl >= 3.0)
            & (mwl <= 10.0)
            & (swr >= 0.05)
            & (dup2 <= 0.4)
        )
        ref = {
            r["doc_id"]
            for r in docs.filter(keep).select("doc_id").collect()
        }
        assert got == ref
