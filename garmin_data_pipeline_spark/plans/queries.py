"""Driver-contract queries: SURVEY.md §2 operator inventory expressed
over the synthetic testdata tables, each with a DuckDB oracle.

Naming: ``<survey-op>_<short-desc>``. Every computed column is aliased
identically in the Spark plan and the oracle SQL (the driver sorts
columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators import (
    cumulative_sum,
    lag_with_default,
    latest_per_group,
    master_outer_join,
    union_by_name,
    value_counts,
)
from garmin_data_pipeline_spark.plans.registry import (
    QUERIES,
    davg,
    dsum,
    register,
    table,
)


def _dsum(col: Column) -> Column:
    """Exact (order-independent) sum of a double expr: accumulate in
    DECIMAL(18,6), emit DOUBLE — hash-stable vs the DuckDB oracle."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def _davg(col: Column) -> Column:
    return _dsum(col) / F.count(col)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (SURVEY A1/A5/A9, F20, O1 —
# the reference's groupBy-mean family, ANALYSIS cells 48-58, at scale).
# ---------------------------------------------------------------------------
@register(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           {sum_qty}, {sum_base_price}, {sum_disc_price},
           {avg_qty}, {avg_price}, {avg_disc},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=dsum("l_quantity", "sum_qty"),
        sum_base_price=dsum("l_extendedprice", "sum_base_price"),
        sum_disc_price=dsum(
            "l_extendedprice * (1 - l_discount)", "sum_disc_price"
        ),
        avg_qty=davg("l_quantity", "avg_qty"),
        avg_price=davg("l_extendedprice", "avg_price"),
        avg_disc=davg("l_discount", "avg_disc"),
    ),
    doc="Aggregation suite over grouped scan (reference groupBy means).",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_extendedprice")).alias("avg_price"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A2 — groupBy(date).agg(min x 4) (race-predictions daily best,
# WRANGLE cell 118 / MLPREP cell 62).
# ---------------------------------------------------------------------------
@register(
    "a2_daily_min",
    """
    SELECT CAST(l_shipdate AS DATE) AS ship_day,
           MIN(l_quantity) AS min_qty,
           MIN(l_extendedprice) AS min_price,
           MIN(l_discount) AS min_disc,
           MIN(l_tax) AS min_tax
    FROM lineitem GROUP BY 1
    """,
    doc="Daily MIN over four measures (race-prediction daily best, A2).",
)
def a2_daily_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.to_date("l_shipdate").alias("ship_day")
    ).agg(
        F.min("l_quantity").alias("min_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.min("l_discount").alias("min_disc"),
        F.min("l_tax").alias("min_tax"),
    )


# ---------------------------------------------------------------------------
# A3/W3 — greatest-per-group via row_number (the reference's
# groupby(date)[ts].idxmax() -> .loc, WRANGLE cell 80).
# ---------------------------------------------------------------------------
@register(
    "a3_latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
    """,
    doc="Argmax row per group via row_number window (A3).",
)
def a3_latest_order_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return latest_per_group(
        orders,
        "o_custkey",
        [F.desc("o_orderdate"), F.desc("o_orderkey")],
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


# ---------------------------------------------------------------------------
# A4 — dedupe keep-latest with deterministic tiebreak
# (transform_all_datasets.py:184-186, made order-independent per §2.11).
# ---------------------------------------------------------------------------
@register(
    "a4_dedupe_latest_lineitem",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_shipdate DESC, l_linenumber DESC, l_quantity DESC
    ) = 1
    """,
    doc="Dedup to one row per key, latest timestamp, tiebroken (A4).",
)
def a4_dedupe_latest_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import dedupe_latest

    li = table(spark, sf_dir, "lineitem")
    return dedupe_latest(
        li,
        "l_orderkey",
        "l_shipdate",
        tiebreakers=["l_linenumber", "l_quantity"],
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


# ---------------------------------------------------------------------------
# W1 — grouped running cumulative sum (weekly cumulative run minutes,
# transform_running_data.py:194).
# ---------------------------------------------------------------------------
@register(
    "w1_cumulative_spend",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_spend
    FROM orders
    """,
    doc="Grouped running cumulative sum with explicit tiebreaker (W1).",
)
def w1_cumulative_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").withColumn(
        "__p", F.col("o_totalprice").cast("decimal(18,6)")
    )
    out = cumulative_sum(
        orders,
        "__p",
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        "cum_spend",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("cum_spend").cast("double").alias("cum_spend"),
    )


# ---------------------------------------------------------------------------
# W2 — lag/shift(1) with default fill (Weekly_Mins_Prior_to_Run,
# transform_running_data.py:195).
# ---------------------------------------------------------------------------
@register(
    "w2_prior_order_price",
    """
    SELECT o_custkey, o_orderkey,
           COALESCE(LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ), 0.0) AS prior_price
    FROM orders
    """,
    doc="lag(1) with default 0 (W2).",
)
def w2_prior_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    out = lag_with_default(
        orders,
        "o_totalprice",
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        "prior_price",
        default=0.0,
    )
    return out.select("o_custkey", "o_orderkey", "prior_price")


# ---------------------------------------------------------------------------
# U1 — union-by-name with missing-column tolerance
# (pd.concat(ignore_index=True), aggregate_json_files.py:91).
# ---------------------------------------------------------------------------
@register(
    "u1_union_mixed_schemas",
    """
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
    FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="unionByName(allowMissingColumns=True) of heterogeneous shards (U1).",
)
def u1_union_mixed_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice"
    )
    done_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    return union_by_name([open_orders, done_orders]).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# A10 — value_counts frequency table (WRANGLE cell 154).
# ---------------------------------------------------------------------------
@register(
    "a10_event_type_counts",
    """
    SELECT event_type, COUNT(*) AS count
    FROM events GROUP BY event_type
    """,
    doc="value_counts(): frequency table (A10).",
)
def a10_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_counts(table(spark, sf_dir, "events"), "event_type")


# ---------------------------------------------------------------------------
# P11 — substring filter on a type key (lower+contains,
# extract_json_data.py:63-65).
# ---------------------------------------------------------------------------
@register(
    "p11_filter_contains",
    """
    SELECT p_partkey, p_type, p_brand
    FROM part
    WHERE CONTAINS(LOWER(p_type), 'and') OR CONTAINS(LOWER(p_type), 'prom')
    """,
    doc="lower(col).contains(...) type-key filter (P11).",
)
def p11_filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    low = F.lower(F.col("p_type"))
    return part.filter(
        low.contains("and") | low.contains("prom")
    ).select("p_partkey", "p_type", "p_brand")


# ---------------------------------------------------------------------------
# J1 — N-way full outer join on a shared day key (the 7-way master
# table merge, MERGE cell 18).
# ---------------------------------------------------------------------------
@register(
    "j1_master_daily_join",
    """
    WITH clicks AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS click_n
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), views AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS view_n
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), purchases AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS purchase_n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), cv AS (
        SELECT COALESCE(clicks.day, views.day) AS day, click_n, view_n
        FROM clicks FULL JOIN views ON clicks.day = views.day
    )
    SELECT COALESCE(cv.day, purchases.day) AS day,
           click_n, view_n, purchase_n
    FROM cv FULL JOIN purchases ON cv.day = purchases.day
    """,
    doc="Reduce of full-outer joins on the date key (J1 master table).",
)
def j1_master_daily_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def daily(event_type: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    return master_outer_join(
        [
            daily("click", "click_n"),
            daily("view", "view_n"),
            daily("purchase", "purchase_n"),
        ],
        on="day",
    ).select("day", "click_n", "view_n", "purchase_n")


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {
        name: q.oracle for name, q in QUERIES.items() if q.oracle is not None
    }
