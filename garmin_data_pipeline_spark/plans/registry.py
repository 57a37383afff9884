"""Query registry: name -> (spark_fn, oracle_sql | None).

Each query is one operator family from SURVEY.md §2 (or an LLM-pipeline
operator) expressed over the driver's testdata tables. The oracle is
ANSI SQL that DuckDB runs on the same parquet; ``None`` marks genuinely
non-SQL-expressible ops (driver then records a rows-only check).

Float discipline for hash-stable oracles: SUM/AVG of doubles accumulate
in nondeterministic order on Spark (partition-parallel) and via segment
trees in DuckDB windows, so any float *accumulation* goes through an
exact DECIMAL(18,6) cast first and is cast back to DOUBLE at the end —
bit-identical on both engines. Plain min/max/count/lag picks are exact
already.

Output-schema contract: every registered query's output must be SCALAR
columns only — no Array/Map/Struct. The driver canonicalizes results
with pandas ``sort_values`` over all columns before value-hashing,
which raises ``unhashable type: 'list'`` on complex-typed cells (the
r7 ``v8_pq_codes`` err — correct values, red row). Pack arrays into a
BIGINT (``operators.similarity.pack_pq_code``) or explode to rows
(v5's posexplode). Enforced by tools/check.py's runner and
tests/test_scale_ops.py::test_registered_outputs_are_driver_hashable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Runtime-settable SQL conf; the driver's session may not have it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Driver-generated events.ts has shipped as parquet
        # TIMESTAMP(NANOS) in some rounds (surfaces as LongType nanos
        # under nanosAsLong — truncate to micros exactly like DuckDB)
        # and as TIMESTAMP(MICROS) isAdjustedToUTC=false in others
        # (surfaces as TIMESTAMP_NTZ — no rewrite needed here; NTZ-
        # sensitive call sites go through durations.epoch_micros).
        # The isinstance guard keeps both shapes working.
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df


# SQL fragment: exact decimal sum of a double expression, emitted as DOUBLE.
def dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
