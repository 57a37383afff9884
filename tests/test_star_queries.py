"""Hand-computed case for q5_local_supplier_volume: a six-relation
fixture where every predicate (region filter, date window, the
local-supplier correlation s_nationkey = c_nationkey) excludes at
least one row, so the revenue arithmetic is paper-checkable and the
DuckDB oracle replays on the same tables. Mirrors the late-
registration discipline (r9 verdict directive 1): a registered query
should not rely on the generic oracle gate as its only committed
signal.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


@pytest.fixture()
def q5_fixture(spark, tmp_path):
    _write(
        spark, tmp_path, "region",
        [(0, "ASIA"), (1, "EUROPE")],
        "r_regionkey int, r_name string",
    )
    _write(
        spark, tmp_path, "nation",
        [(0, "JAPAN", 0), (1, "CHINA", 0), (2, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    _write(
        spark, tmp_path, "customer",
        [(1, "c1", 0, 0.0, "BUILDING"),
         (2, "c2", 1, 0.0, "BUILDING"),
         (3, "c3", 2, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    _write(
        spark, tmp_path, "supplier",
        [(10, "s1", 0, 0.0), (20, "s2", 1, 0.0), (30, "s3", 2, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, "
        "s_acctbal double",
    )
    _write(
        spark, tmp_path, "orders",
        [(100, 1, "F", 0.0, datetime(1996, 6, 1), "1-URGENT"),
         (200, 1, "F", 0.0, datetime(1995, 6, 1), "1-URGENT"),   # pre-window
         (300, 2, "F", 0.0, datetime(1997, 1, 1), "1-URGENT"),
         (400, 3, "F", 0.0, datetime(1996, 6, 1), "1-URGENT")],  # EUROPE cust
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    )
    ship = datetime(1996, 7, 1)
    _write(
        spark, tmp_path, "lineitem",
        [
            # kept, JAPAN: 100.00 * (1 - 0.10) = 90.00
            (100, 1, 10, 1, 1.0, 100.0, 0.10, 0.0, "N", "O", ship),
            # kept, JAPAN: 10.00 * (1 - 0.50) = 5.00
            (100, 1, 10, 2, 1.0, 10.0, 0.50, 0.0, "N", "O", ship),
            # dropped: supplier s2 is CHINA, customer c1 is JAPAN
            (100, 1, 20, 3, 1.0, 50.0, 0.0, 0.0, "N", "O", ship),
            # dropped: order 200 predates the window
            (200, 1, 10, 1, 1.0, 77.0, 0.0, 0.0, "N", "O", ship),
            # kept, CHINA: 200.00 * (1 - 0.25) = 150.00
            (300, 1, 20, 1, 1.0, 200.0, 0.25, 0.0, "N", "O", ship),
            # dropped: customer c3 sits in EUROPE
            (400, 1, 30, 1, 1.0, 500.0, 0.0, 0.0, "N", "O", ship),
        ],
        li_schema,
    )
    return tmp_path


EXPECTED = {"JAPAN": (95.0, 2), "CHINA": (150.0, 1)}


class TestQ5HandComputed:
    def test_spark_plan_matches_paper_arithmetic(self, spark, q5_fixture):
        from garmin_data_pipeline_spark import plans

        out = plans.QUERIES["q5_local_supplier_volume"].fn(
            spark, str(q5_fixture)
        )
        got = {
            r["n_name"]: (r["revenue"], r["n_lineitems"])
            for r in out.collect()
        }
        assert got == EXPECTED

    def test_oracle_replays_on_the_same_fixture(self, spark, q5_fixture):
        from garmin_data_pipeline_spark import plans

        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier",
                  "orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{q5_fixture}/{t}.parquet/*.parquet'"
            )
        odf = con.execute(
            plans.QUERIES["q5_local_supplier_volume"].oracle
        ).df()
        got = {
            r.n_name: (float(r.revenue), int(r.n_lineitems))
            for _, r in odf.iterrows()
        }
        assert got == EXPECTED
