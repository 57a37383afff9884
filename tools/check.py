"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, then compares row count, column-name
set, and order-insensitive values (rows sorted by all columns after
normalization). Stricter-or-equal to the driver's value-hash check,
WITH one extra gate the r7 round proved necessary: the driver's
canonicalizer (pandas sort_values over all columns) cannot hash list
cells, so any Array/Map/Struct column in a registered output errs in
the driver even when the values are correct (the r7 ``v8_pq_codes``
err). ``normalize`` below converts lists to tuples to make them
locally comparable — which is LOOSER than the driver — so the runner
fails any registered query whose Spark schema contains a complex
type before comparison. The same invariant is pytest-enforced in
tests/test_scale_ops.py.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # datetime.date / Decimal / arrays -> canonical forms
            def conv(v):
                import datetime
                import decimal

                if isinstance(v, decimal.Decimal):
                    return float(v)
                if isinstance(v, datetime.datetime):
                    return pd.Timestamp(v)
                if isinstance(v, datetime.date):
                    return pd.Timestamp(v)
                if isinstance(v, (list, np.ndarray)):
                    return tuple(np.asarray(v, dtype=np.float64).round(6))
                return v

            df[c] = s.map(conv)
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype in (np.int32, np.int64, np.int16, np.int8):
            df[c] = s.astype("int64")
        elif s.dtype == np.float32:
            df[c] = s.astype("float64")
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.iloc[
            df.astype(str).apply(tuple, axis=1).argsort(kind="mergesort")
        ].reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") and str(bv.dtype).startswith("float"):
                both_nan = av.isna() & bv.isna()
                eq = (av == bv) | both_nan
            else:
                eq = (av.astype(object) == bv.astype(object)) | (
                    av.isna() & bv.isna()
                )
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"values differ in '{c}' ({(~eq).sum()} rows), e.g. row {idx}: "
                    f"spark={a[c][idx]!r} oracle={b[c][idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from garmin_data_pipeline_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # Fixture precondition (ADVICE r9): the integer floor-division
    # queries (w9 twa_e6, w10 ewma_e6, t23 novelty_e6) rely on
    # Spark's TRUNCATING `div` equaling DuckDB's FLOORING `//`, which
    # holds only for non-negative operands. t23's operands are counts
    # (non-negative by construction); w9/w10's come from events.value
    # — fail loudly if a regenerated fixture ever breaks the
    # contract instead of letting the engines disagree silently.
    min_value = con.execute(
        "SELECT min(value) FROM events"
    ).fetchone()[0]
    if min_value is not None and min_value < 0:
        print(
            f"FAIL <precondition>: events.value has negative values "
            f"(min={min_value}) — Spark div (truncate) != DuckDB // "
            "(floor) on negative operands; w9/w10 floor-scaled "
            "outputs would hash-miss cross-engine (see plans/"
            "queries.py w9/w10 docstrings)"
        )
        return 1

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf_spark = fn(spark, sf_dir)
            from pyspark.sql.types import ArrayType, MapType, StructType

            from garmin_data_pipeline_spark.plans.lint import (
                DECIMAL_CAST_ALLOWLIST,
                unsafe_decimal_casts,
            )

            complex_cols = [
                f.name
                for f in sdf_spark.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                failed.append(name)
                print(
                    f"FAIL {name}: driver-unhashable complex-typed "
                    f"columns {complex_cols} (pack/explode to scalars)"
                )
                continue
            # Float-discipline lint: a computed-double->DECIMAL cast
            # rounds HALF_UP on Spark / HALF_EVEN on DuckDB, and at
            # magnitudes >= 2**(51-s) a tie is REACHABLE — a query
            # can pass this local gate bit-for-bit and still hash-miss
            # on the driver host (the r8 w9 err), so the static lint
            # fails it here regardless of the value comparison.
            if name not in DECIMAL_CAST_ALLOWLIST:
                unsafe = unsafe_decimal_casts(sdf_spark)
                if unsafe:
                    failed.append(name)
                    print(
                        f"FAIL {name}: computed-double->DECIMAL "
                        f"cast(s) {unsafe} (engine-dependent rounding "
                        "mode; see plans/lint.py)"
                    )
                    continue
            sdf = sdf_spark.toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name} ({len(sdf)} rows)")

    print(f"\n{len(failed)} failures" if failed else "\nall green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
