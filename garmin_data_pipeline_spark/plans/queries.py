"""Driver-contract queries: SURVEY.md §2 operator inventory expressed
over the synthetic testdata tables, each with a DuckDB oracle.

Naming: ``<survey-op>_<short-desc>``. Every computed column is aliased
identically in the Spark plan and the oracle SQL (the driver sorts
columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
    return _a1_pricing_summary(spark, sf_dir, parity=True)


def a1_pricing_summary_production(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """a1 with plain double accumulation — the production/bench form.

    The registered a1 accumulates in DECIMAL(18,6) purely so its hash
    matches the DuckDB oracle bit-for-bit regardless of partition
    summation order; real pipelines (and the benchmark) take the
    cheaper codegen'd double sums, which differ only in last-ulp
    float ordering."""
    return _a1_pricing_summary(spark, sf_dir, parity=False)


def _a1_pricing_summary(
    spark: SparkSession, sf_dir: str, parity: bool
) -> DataFrame:
    dsum_ = _dsum if parity else F.sum
    davg_ = _davg if parity else F.avg
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_(F.col("l_quantity")).alias("sum_qty"),
            dsum_(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum_(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            davg_(F.col("l_quantity")).alias("avg_qty"),
            davg_(F.col("l_extendedprice")).alias("avg_price"),
            davg_(F.col("l_discount")).alias("avg_disc"),
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
               ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_spend
    FROM orders
    """,
    doc="Grouped running cumulative sum with explicit tiebreaker (W1). "
    "NULLS FIRST pins the engines to Spark's ASC default (DuckDB "
    "defaults NULLS LAST) — NULL order dates accumulate first.",
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
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey
           ), 0.0) AS prior_price
    FROM orders
    """,
    doc="lag(1) with default 0 (W2); NULLS FIRST matches Spark's ASC.",
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
        # Materialize `day` BEFORE the groupBy: grouping on an aliased
        # expression leaves the aggregate partitioned on an internal
        # _groupingexpression attribute, and the downstream full-outer
        # SMJ re-shuffles on `day`. Grouping on the concrete column
        # lets the join reuse the aggregate's partitioning — one
        # exchange per branch instead of two.
        return (
            ev.filter(F.col("event_type") == event_type)
            .withColumn("day", F.to_date("ts"))
            .groupBy("day")
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


# ---------------------------------------------------------------------------
# P1/F19 — projection with computed columns & unit conversions
# (extract_json_data.py:67-88 field extraction; transform_all_datasets.py:319-340).
# ---------------------------------------------------------------------------
@register(
    "p1_projection_revenue",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity / 1000.0 AS qty_km,
           l_extendedprice / 100.0 AS price_m
    FROM lineitem
    """,
    doc="Projection with arithmetic unit conversions (P1, F19).",
)
def p1_projection_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions import cm_to_m, m_to_km

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        m_to_km("l_quantity").alias("qty_km"),
        cm_to_m("l_extendedprice").alias("price_m"),
    )


# ---------------------------------------------------------------------------
# P9/P10 — inequality + not-null filters (transform_all_datasets.py:165-181).
# ---------------------------------------------------------------------------
@register(
    "p9_filter_status_neq",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus <> 'F'
    """,
    doc="Inequality filter on a string code (P9: acwrStatus != 'NONE').",
)
def p9_filter_status_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "p10_filter_notnull",
    """
    SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_or_null
    FROM lineitem WHERE NULLIF(l_discount, 0.0) IS NOT NULL
    """,
    doc="Not-null filter (P10) over a synthesized nullable column.",
)
def p10_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").withColumn(
        "disc_or_null", F.nullif(F.col("l_discount"), F.lit(0.0))
    )
    return li.filter(F.col("disc_or_null").isNotNull()).select(
        "l_orderkey", "l_linenumber", "disc_or_null"
    )


# ---------------------------------------------------------------------------
# P12/F25 — date-threshold flag then keep flag==1 (IsTrainingPlan,
# WRANGLE cell 36).
# ---------------------------------------------------------------------------
@register(
    "p12_flag_date_threshold",
    """
    SELECT o_orderkey, o_orderdate,
           CAST(o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AS INT)
               AS is_recent
    FROM orders
    WHERE CAST(o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AS INT) = 1
    """,
    doc="Threshold flag column + filter on the flag (P12/F25).",
)
def p12_flag_date_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions import flag_when

    orders = table(spark, sf_dir, "orders").withColumn(
        "is_recent",
        flag_when(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
        ),
    )
    return orders.filter(F.col("is_recent") == 1).select(
        "o_orderkey", "o_orderdate", "is_recent"
    )


# ---------------------------------------------------------------------------
# P13/A9 — filtered row count (ANALYSIS cell 50: Calories >= 500 count).
# ---------------------------------------------------------------------------
@register(
    "p13_threshold_count",
    "SELECT COUNT(*) AS n_big FROM orders WHERE o_totalprice >= 400000",
    doc="Numeric-threshold filter + count (P13/A9).",
)
def p13_threshold_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 400000)
        .agg(F.count(F.lit(1)).alias("n_big"))
    )


# ---------------------------------------------------------------------------
# P14/A8 — boolean-mask subset mean (MLPREP cell 176).
# ---------------------------------------------------------------------------
@register(
    "p14_masked_mean",
    """
    SELECT {m}
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """.format(m=davg("c_acctbal", "avg_bal")),
    doc="Mean of a masked subset (P14).",
)
def p14_masked_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .agg(_davg(F.col("c_acctbal")).alias("avg_bal"))
    )


# ---------------------------------------------------------------------------
# P3 — data-dependent projection: drop all-null columns
# (dropna(axis=1, how='all'), transform_all_datasets.py:47).
# ---------------------------------------------------------------------------
@register(
    "p3_drop_all_null_columns",
    """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
    doc="Drop all-null columns; a dead column vanishes, live ones stay (P3).",
)
def p3_drop_all_null_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import drop_all_null_columns

    cust = table(spark, sf_dir, "customer").withColumn(
        "dead_col", F.lit(None).cast("double")
    )
    return drop_all_null_columns(cust)


# ---------------------------------------------------------------------------
# P4 — drop single-unique-value columns (nunique()==1, WRANGLE cell 29).
# ---------------------------------------------------------------------------
@register(
    "p4_drop_constant_columns",
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    doc="Drop constant columns; injected constant vanishes (P4).",
)
def p4_drop_constant_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import drop_constant_columns

    sup = table(spark, sf_dir, "supplier").withColumn(
        "const_col", F.lit("SAME")
    )
    return drop_constant_columns(sup)


# ---------------------------------------------------------------------------
# P6 — header cleanup rename (spaces/specials regex,
# transform_all_datasets.py:51-52).
# ---------------------------------------------------------------------------
@register(
    "p6_clean_headers",
    """
    SELECT n_nationkey AS Nation_Key, n_name AS Nation_Name
    FROM nation
    """,
    doc="Regex header normalization: 'Nation Key!' -> Nation_Key (P6).",
)
def p6_clean_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import clean_headers

    nat = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("Nation Key!"),
        F.col("n_name").alias("Nation Name"),
    )
    return clean_headers(nat)


# ---------------------------------------------------------------------------
# A6 — per-column null counts in one pass (isna().sum()).
# ---------------------------------------------------------------------------
@register(
    "a6_null_counts",
    """
    SELECT CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS disc_nulls,
           CAST(SUM(CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS tax_nulls,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS qty_nulls
    FROM lineitem
    """,
    doc="Single-job per-column null counts (A6).",
)
def a6_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import null_counts

    li = table(spark, sf_dir, "lineitem").select(
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_nulls"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_nulls"),
        F.col("l_quantity").alias("qty_nulls"),
    )
    return null_counts(li)


# ---------------------------------------------------------------------------
# A7 — per-column distinct counts (nunique()).
# ---------------------------------------------------------------------------
@register(
    "a7_distinct_counts",
    """
    SELECT COUNT(DISTINCT o_orderstatus) AS o_orderstatus,
           COUNT(DISTINCT o_orderpriority) AS o_orderpriority,
           COUNT(DISTINCT o_custkey) AS o_custkey
    FROM orders
    """,
    doc="Per-column exact distinct counts (A7).",
)
def a7_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import distinct_counts

    orders = table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_custkey"
    )
    return distinct_counts(orders)


# ---------------------------------------------------------------------------
# A8/F26 — mean imputation of synthesized nulls (exact decimal mean so
# the fill value hash-matches; transform_all_datasets.py:115-119).
# ---------------------------------------------------------------------------
@register(
    "a8_impute_mean",
    """
    WITH t AS (
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_discount, 0.0) AS disc_n
        FROM lineitem
    ), m AS (
        SELECT CAST(SUM(CAST(disc_n AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(disc_n) AS mean_disc
        FROM t
    )
    SELECT l_orderkey, l_linenumber,
           COALESCE(disc_n, (SELECT mean_disc FROM m)) AS disc_filled
    FROM t
    """,
    doc="Mean imputation with deterministic mean (A8/F26).",
)
def a8_impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_n"),
    )
    mean_row = li.agg(
        (_dsum(F.col("disc_n")) / F.count("disc_n")).alias("m")
    ).first()
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("disc_n"), F.lit(mean_row["m"])).alias(
            "disc_filled"
        ),
    )


# ---------------------------------------------------------------------------
# A11 — correlation (df.corr(), ANALYSIS cell 66).
# ---------------------------------------------------------------------------
@register(
    "a11_correlation",
    """
    SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(CORR(l_quantity, l_discount), 6) AS corr_qty_disc
    FROM lineitem
    """,
    doc="Pearson correlation pairs, rounded for FP stability (A11).",
)
def a11_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias(
            "corr_qty_disc"
        ),
    )


# ---------------------------------------------------------------------------
# O3 — top-k with deterministic tiebreak.
# ---------------------------------------------------------------------------
@register(
    "o3_topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k by measure with key tiebreak (O3).",
)
def o3_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# F3-F6 — date-part extraction suite (transform_running_data.py:97-103,
# WRANGLE cells 122,158).
# ---------------------------------------------------------------------------
@register(
    "f4_date_parts",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(month(o_orderdate) AS INT) AS mon,
           monthname(o_orderdate) AS month_name,
           strftime(o_orderdate, '%b') AS month_abbrev,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(day(o_orderdate) AS INT) AS day_of_month
    FROM orders
    """,
    doc="to_date / year / quarter / month / month names / ISO week (F3-F6).",
)
def f4_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.to_date(d).alias("order_day"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "MMM").alias("month_abbrev"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofmonth(d).alias("day_of_month"),
    )


# ---------------------------------------------------------------------------
# F12-F16 — time-string parsing and duration/pace formatting
# (transform_running_data.py:140-180, extract_json_data.py:168-205).
# ---------------------------------------------------------------------------
@register(
    "f12_time_string_kit",
    """
    WITH t AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS mm,
               (l_linenumber * 7) % 60 AS ss,
               CAST(l_quantity AS BIGINT) * 60 + (l_linenumber * 7) % 60
                   AS total_s
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(mm AS VARCHAR) || ':'
               || lpad(CAST(ss AS VARCHAR), 2, '0') || '.5' AS raw_mmss,
           total_s AS parsed_seconds,
           CAST(total_s // 3600 AS VARCHAR) || ':'
               || lpad(CAST((total_s % 3600) // 60 AS VARCHAR), 2, '0')
               || ':'
               || lpad(CAST(total_s % 60 AS VARCHAR), 2, '0')
               AS duration_str
    FROM t
    """,
    doc="mm:ss parse (fractional stripped) + H:MM:SS format (F12-F15).",
)
def f12_time_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions import (
        format_duration,
        parse_mmss_to_seconds,
    )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("mm"),
        ((F.col("l_linenumber") * 7) % 60).cast("long").alias("ss"),
    )
    raw = li.withColumn(
        "raw_mmss",
        F.concat(
            F.col("mm").cast("string"),
            F.lit(":"),
            F.lpad(F.col("ss").cast("string"), 2, "0"),
            F.lit(".5"),
        ),
    )
    return raw.select(
        "l_orderkey",
        "l_linenumber",
        "raw_mmss",
        parse_mmss_to_seconds("raw_mmss").alias("parsed_seconds"),
        format_duration(F.col("mm") * 60 + F.col("ss")).alias(
            "duration_str"
        ),
    )


# ---------------------------------------------------------------------------
# F2 — epoch-millis to timestamp (transform_all_datasets.py:313-316).
# ---------------------------------------------------------------------------
@register(
    "f2_epoch_millis",
    """
    SELECT o_orderkey,
           epoch_ms((o_orderkey % 20000) * 86400000) AS ts_from_ms
    FROM orders
    """,
    doc="Epoch-milliseconds parse (F2).",
)
def f2_epoch_millis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions import (
        epoch_millis_to_timestamp,
    )

    # key % 20000 days keeps the synthetic timestamp < 2025 at ANY
    # scale factor (raw keys at sf>=0.1 would pass pandas' year-2262
    # nanosecond ceiling and break Arrow collection).
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        epoch_millis_to_timestamp(
            (F.col("o_orderkey") % 20000) * F.lit(86400000)
        ).alias("ts_from_ms"),
    )


# ---------------------------------------------------------------------------
# F22 — sentinel '--' replace (MLPREP cell 175).
# ---------------------------------------------------------------------------
@register(
    "f22_sentinel_replace",
    """
    WITH t AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber = 1 THEN '--'
                    ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
               END AS raw_qty
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, raw_qty,
           CASE WHEN raw_qty = '--' THEN 0.0
                ELSE CAST(raw_qty AS DOUBLE) END AS qty_clean
    FROM t
    """,
    doc="Sentinel '--' -> 0 replace with numeric cast (F22).",
)
def f22_sentinel_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions import replace_sentinel

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_linenumber") == 1, F.lit("--"))
        .otherwise(F.col("l_quantity").cast("long").cast("string"))
        .alias("raw_qty"),
    )
    return li.withColumn(
        "qty_clean", replace_sentinel("raw_qty", "--", 0.0)
    )


# ---------------------------------------------------------------------------
# F23/F24/A1 — binning + bin-id map + per-bin aggregates
# (pd.cut mileage buckets, transform_all_datasets.py:60-69; groupBy mean,
# ANALYSIS cells 48-58).
# ---------------------------------------------------------------------------
_QTY_BINS = [
    (0.0, 10.0, "0-10 qty", 1),
    (10.0, 20.0, "10-20 qty", 2),
    (20.0, 30.0, "20-30 qty", 3),
    (30.0, 40.0, "30-40 qty", 4),
    (40.0, float("inf"), "40+ qty", 5),
]

@register(
    "f23_binned_group_mean",
    """
    WITH t AS (
        SELECT CASE WHEN l_quantity IS NULL THEN NULL
                    WHEN l_quantity >= 40 THEN '40+ qty'
                    WHEN l_quantity >= 30 THEN '30-40 qty'
                    WHEN l_quantity >= 20 THEN '20-30 qty'
                    WHEN l_quantity >= 10 THEN '10-20 qty'
                    ELSE '0-10 qty' END AS qty_group,
               CASE WHEN l_quantity IS NULL THEN NULL
                    WHEN l_quantity >= 40 THEN 5
                    WHEN l_quantity >= 30 THEN 4
                    WHEN l_quantity >= 20 THEN 3
                    WHEN l_quantity >= 10 THEN 2
                    ELSE 1 END AS qty_group_id,
               l_extendedprice
        FROM lineitem
    )
    SELECT qty_group, qty_group_id,
           COUNT(*) AS n,
           {avg_price}
    FROM t GROUP BY qty_group, qty_group_id
    """.format(avg_price=davg("l_extendedprice", "avg_price")),
    doc="Right-open binning to label+id, then per-bin mean (F23/F24/A1).",
)
def f23_binned_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions import bin_to_id, bin_to_label

    li = table(spark, sf_dir, "lineitem").select(
        bin_to_label("l_quantity", _QTY_BINS).alias("qty_group"),
        bin_to_id("l_quantity", _QTY_BINS).alias("qty_group_id"),
        "l_extendedprice",
    )
    return li.groupBy("qty_group", "qty_group_id").agg(
        F.count(F.lit(1)).alias("n"),
        _davg(F.col("l_extendedprice")).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# F26/F27 — constant null-fill + cross-column coalesce rebuild
# (WRANGLE cells 53,58).
# ---------------------------------------------------------------------------
@register(
    "f26_fill_and_coalesce",
    """
    WITH t AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    ELSE o_orderstatus END AS status_n,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE CAST(o_orderkey % 7 AS BIGINT) * 3600 END
                   AS dur_seconds,
               CAST(o_orderkey % 7 AS DOUBLE) AS dur_hours
        FROM orders
    )
    SELECT o_orderkey,
           COALESCE(status_n, 'NONE') AS status_filled,
           COALESCE(dur_seconds, CAST(dur_hours * 3600 AS BIGINT))
               AS dur_rebuilt
    FROM t
    """,
    doc="na.fill constant + coalesce(seconds, hours*3600) rebuild (F26/F27).",
)
def f26_fill_and_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions import (
        coalesce_rebuild_seconds,
    )

    t = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_n"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise((F.col("o_orderkey") % 7).cast("long") * 3600)
        .alias("dur_seconds"),
        (F.col("o_orderkey") % 7).cast("double").alias("dur_hours"),
    )
    return (
        t.na.fill({"status_n": "NONE"})
        .withColumn(
            "dur_rebuilt",
            coalesce_rebuild_seconds("dur_seconds", "dur_hours"),
        )
        .select(
            "o_orderkey",
            F.col("status_n").alias("status_filled"),
            "dur_rebuilt",
        )
    )


# ---------------------------------------------------------------------------
# W4/W5/J3 — daily densification + forward-fill (reindex(date_range) +
# ffill, WRANGLE cell 99; scaffold left join J3; LOCF W4).
# ---------------------------------------------------------------------------
@register(
    "w5_densify_ffill",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               {v}
        FROM events
        WHERE day(ts) % 7 <> 3
        GROUP BY event_type, CAST(ts AS DATE)
    ), span AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY event_type
    ), scaffold AS (
        SELECT event_type,
               CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM span
    )
    SELECT s.event_type, s.day,
           last_value(d.daily_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS daily_value
    FROM scaffold s LEFT JOIN daily d
        ON s.event_type = d.event_type AND s.day = d.day
    """.format(v=dsum("value", "daily_value")),
    doc="Daily scaffold via sequence+explode, left join, LOCF (W4/W5/J3).",
)
def w5_densify_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import densify_daily_ffill

    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.dayofmonth("ts") % 7 != 3)
        .groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(_dsum(F.col("value")).alias("daily_value"))
    )
    return densify_daily_ffill(
        daily, "day", ["daily_value"], partition_by=["event_type"]
    ).select("event_type", "day", "daily_value")


# ---------------------------------------------------------------------------
# S3/F29 — JSON document scan: parse the props JSON envelope and
# extract fields (spark.read.json + struct flatten on testdata's
# stringly-typed props; reference envelope unwrap MLPREP cell 106).
# ---------------------------------------------------------------------------
@register(
    "s3_json_props_extract",
    """
    SELECT CASE WHEN json_valid(props)
                THEN CAST(json_extract(props, '$.k') AS INT) END AS k,
           COUNT(*) AS n,
           {v}
    FROM events
    GROUP BY 1
    """.format(v=dsum("value", "sum_value")),
    doc="JSON string column -> typed field -> aggregate (S3/F29 analog). "
    "Malformed JSON parses to NULL on both engines (Spark from_json is "
    "lenient; the oracle guards with json_valid).",
)
def s3_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k",
        F.from_json(F.col("props"), "struct<k:int>").getField("k"),
    )
    return parsed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value")).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Streaming batch-equivalent — tumbling daily window aggregate
# (Structured Streaming semantics, SURVEY §2.10; the streaming module
# runs the same plan with readStream + watermark, tests/test_streaming.py).
# ---------------------------------------------------------------------------
@register(
    "st1_tumbling_daily",
    """
    SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {v}
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """.format(v=dsum("value", "sum_value")),
    doc="Tumbling 1-day window aggregate (streaming-equivalent batch "
    "plan). No event time -> no window: Spark's window() drops NULL "
    "timestamps; the filter makes that contract explicit on both sides.",
)
def st1_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# A5 — total sum of a duration column + H:MM:SS render
# (reference ANALYSIS cell 26: Time.sum() + divmod; SURVEY §2.4 A5 /
# §2.8 F15. l_quantity stands in as integral seconds.)
# ---------------------------------------------------------------------------
@register(
    "a5_total_duration",
    """
    SELECT total_seconds,
           CAST(total_seconds // 3600 AS VARCHAR) || ':' ||
           lpad(CAST((total_seconds % 3600) // 60 AS VARCHAR), 2, '0')
           || ':' ||
           lpad(CAST(total_seconds % 60 AS VARCHAR), 2, '0')
               AS total_formatted
    FROM (
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT)
                   AS total_seconds
        FROM lineitem
    )
    """,
    doc="Total duration sum rendered H:MM:SS (ANALYSIS cell 26).",
)
def a5_total_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions.durations import (
        format_duration,
    )

    li = table(spark, sf_dir, "lineitem")
    total = li.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("bigint")
        .alias("total_seconds")
    )
    return total.select(
        "total_seconds",
        format_duration("total_seconds").alias("total_formatted"),
    )


# ---------------------------------------------------------------------------
# Stateful-streaming batch-equivalent — per-user sessionization
# (custom stateful operator, streaming/events.py sessionize(); the
# batch form is the window-function plan the oracle can check).
# ---------------------------------------------------------------------------
@register(
    "st2_sessionize",
    """
    WITH g AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, value,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS events,
           {v}
    FROM s
    GROUP BY user_id, sid
    """.format(v=dsum("value", "total_value")),
    doc="Per-user 30-min-gap sessionization (stateful-streaming batch "
    "twin). NULL event times are dropped — the engine-portable "
    "contract (NULLS FIRST/LAST would otherwise shift boundaries).",
)
def st2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.streaming import sessionize

    ev = table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    out = sessionize(ev, gap_minutes=30)
    return out.withColumn(
        "total_value", F.col("total_value").cast("double")
    )


@register(
    "st2b_session_window",
    """
    WITH g AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, value,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS events,
           {v}
    FROM s
    GROUP BY user_id, sid
    """.format(v=dsum("value", "total_value")),
    doc="Sessionization via the BUILT-IN session_window aggregate "
    "(st2's applyInPandasWithState twin, fully JVM-side: one shuffle "
    "on user_id, merging session state inside the aggregate — the "
    "form to prefer when per-session logic IS expressible as an "
    "aggregate). Boundary semantics probed, not assumed: events "
    "exactly gap-apart MERGE (a new session starts strictly past the "
    "gap), and window end = last event + gap, hence the oracle's "
    "MAX(ts) + INTERVAL.",
)
def st2b_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "events",
            "total_value",
        )
    )


@register(
    "st3_replay_dedup",
    """
    SELECT DISTINCT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT * FROM events
        UNION ALL
        SELECT * FROM events
    )
    """,
    doc="Streaming exact dedup, batch twin: an at-least-once source "
    "replays a whole shard (modeled as union-self); "
    "dedupe_stream collapses the replays — "
    "dropDuplicatesWithinWatermark on streaming frames (state "
    "bounded by the watermark horizon), dropDuplicates here. One "
    "hash-partition shuffle on the dedup key. Keyed on the FULL "
    "column list to mirror the oracle's SELECT DISTINCT exactly: "
    "keying on event_id alone would pick a nondeterministic "
    "survivor if the generator ever shipped conflicting duplicate "
    "ids (ADVICE r4).",
)
def st3_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.streaming import dedupe_stream

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ev = table(spark, sf_dir, "events").select(*cols)
    return dedupe_stream(ev.union(ev), cols)


@register(
    "st4_attribution",
    """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id,
               ts AS purchase_ts, value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT purchase_id, p.user_id, purchase_ts,
           ROUND(purchase_value, 6) AS purchase_value,
           click_id, click_ts
    FROM p JOIN c ON p.user_id = c.user_id
        AND c.click_ts >= p.purchase_ts - INTERVAL 60 MINUTE
        AND c.click_ts <= p.purchase_ts
    """,
    doc="Click->purchase attribution (stream-stream interval-join "
    "batch twin): every purchase matched to the same user's clicks "
    "in the preceding 60 minutes. Streaming mode is the watermarked "
    "stream-stream inner join with bounded state; the batch twin is "
    "the bin-bucketed range-join composition (hash join on "
    "(user, hour-bin) + exact BETWEEN refilter), never a theta join.",
)
def st4_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.streaming import attribute_purchases

    ev = table(spark, sf_dir, "events")
    out = attribute_purchases(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        window_minutes=60,
    )
    return out.withColumn(
        "purchase_value", F.round("purchase_value", 6)
    )


# ---------------------------------------------------------------------------
# J5 — as-of join (custom operator Spark lacks; DuckDB has native
# ASOF JOIN, making this directly oracle-checkable): each purchase
# event gets the latest prior click by the same user.
# ---------------------------------------------------------------------------
@register(
    "j5_asof_join",
    """
    WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS ts_asof, c.value AS value_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="Backward as-of join via union + window ffill (one shuffle).",
)
def j5_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.joins import join_asof

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return join_asof(
        purchases, clicks, "ts", ["user_id"], ["ts", "value"]
    )


# ---------------------------------------------------------------------------
# J6 — range (interval) join: assign error events to the per-user
# session interval containing them (sessions from st2's definition).
# Bin-bucketed equi-join, not a nested-loop theta join.
# ---------------------------------------------------------------------------
_SESSIONS_SQL = """
    WITH g AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    ), sessions AS (
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM s GROUP BY user_id, sid
    )
"""


@register(
    "j6_range_join",
    _SESSIONS_SQL
    + """
    SELECT e.event_id, e.user_id, e.ts,
           sess.session_start, sess.session_end
    FROM events e
    JOIN sessions sess
      ON e.user_id = sess.user_id
     AND e.ts BETWEEN sess.session_start AND sess.session_end
    WHERE e.event_type = 'error'
    """,
    doc="Interval join via bin-bucketed equi-join + exact filter.",
)
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.joins import join_range
    from garmin_data_pipeline_spark.streaming import sessionize

    ev = table(spark, sf_dir, "events")
    sessions = sessionize(ev, gap_minutes=30).select(
        "user_id", "session_start", "session_end"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return join_range(
        errors,
        sessions,
        "ts",
        "session_start",
        "session_end",
        by=["user_id"],
        bin_seconds=86400,
    ).select("event_id", "user_id", "ts", "session_start", "session_end")


# ---------------------------------------------------------------------------
# A12 — hierarchical rollup: (year, month) -> year -> grand total in
# one pass (the hypertable-rollup shape; Spark `rollup` == SQL GROUP BY
# ROLLUP, one shuffle with grouping-set expansion).
# ---------------------------------------------------------------------------
@register(
    "a12_time_rollup",
    """
    SELECT EXTRACT(year FROM ts)::BIGINT AS y,
           EXTRACT(month FROM ts)::BIGINT AS m,
           COUNT(*) AS n,
           {v}
    FROM events
    GROUP BY ROLLUP (EXTRACT(year FROM ts)::BIGINT,
                     EXTRACT(month FROM ts)::BIGINT)
    """.format(v=dsum("value", "total_value")),
    doc="GROUP BY ROLLUP over (year, month) — hypertable-style rollup.",
)
def a12_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        "value",
    )
    return ev.rollup("y", "m").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value")).alias("total_value"),
    )


@register(
    "a14_salted_event_stats",
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
           MIN(value) AS min_val,
           COUNT(event_id) AS count_event_id
    FROM events
    GROUP BY event_type
    """,
    doc="Skew-resilient two-stage salted aggregation (operators/"
    "skew.py): stage 1 groups on (key, hash-salt) so a pathological "
    "hot key spreads over 16 reducers, stage 2 combines the algebraic "
    "partials — bit-identical to the direct aggregate (the oracle IS "
    "the direct aggregate). DECIMAL accumulation keeps the double sum "
    "order-independent across the two stages.",
)
def a14_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.skew import salted_agg

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.col("value").alias("val"),
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {"v": "sum", "val": "min", "event_id": "count"},
        salt_col="event_id",
        buckets=16,
    )
    return out.select(
        "event_type",
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_val"),
        "count_event_id",
    )


_A13_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "a13_pivot_event_values",
    """
    SELECT user_id,
           {cols}
    FROM events
    GROUP BY user_id
    """.format(
        cols=",\n           ".join(
            "CAST(SUM(CAST(value AS DECIMAL(18,6))) "
            f"FILTER (WHERE event_type = '{t}') AS DOUBLE) AS {t}_value"
            for t in _A13_TYPES
        )
    ),
    doc="Pivot (long -> wide): per-user sum(value) by event type with "
    "a FIXED column list — the schema-stable form a production "
    "pipeline needs (an inferred pivot would re-scan to discover "
    "labels and drift the schema when a type is absent). One "
    "hash-aggregate shuffle on user_id; the oracle mirrors it as "
    "conditional FILTER aggregation.",
)
def a13_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _A13_TYPES)
        .agg(F.sum("v").cast("double"))
    )
    renames = {t: f"{t}_value" for t in _A13_TYPES}
    return out.select(
        "user_id",
        *[F.col(t).alias(n) for t, n in renames.items()],
    )


# ---------------------------------------------------------------------------
# J4 — spatial join (reference documents-but-never-runs an ST_Contains
# join of runs to routes, ETL Scripts/README.md:200-210). Executed here
# as the grid-bucketed radius join: points (synthesized deterministic
# coordinates over events) vs a small station table, pairs within 5 km.
# The Spark plan uses cell binning + broadcast equi-join; the oracle
# computes the exact cross-join answer — proving the binning lossless.
# ---------------------------------------------------------------------------
from garmin_data_pipeline_spark.operators.spatial import (  # noqa: E402
    sql_haversine_km,
)

_J4_DIST = sql_haversine_km("p.lat", "p.lon", "g.place_lat", "g.place_lon")


@register(
    "j4_spatial_join",
    f"""
    WITH pts AS (
        SELECT event_id,
               40.0 + (event_id % 500) * 0.001 AS lat,
               -74.0 + ((event_id * 7) % 500) * 0.001 AS lon
        FROM events
    ), places(station, place_lat, place_lon) AS (
        VALUES ('downtown', 40.10, -73.90),
               ('midtown', 40.30, -73.70),
               ('uptown', 40.45, -74.00)
    )
    SELECT p.event_id, g.station,
           ROUND({_J4_DIST}, 4) AS dist_km
    FROM pts p CROSS JOIN places g
    WHERE {_J4_DIST} <= 5.0
    """,
    doc="Grid-bucketed haversine radius join (J4; exact-equivalent "
    "oracle via cross join).",
)
def j4_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.spatial import (
        join_points_in_radius,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        (F.lit(40.0) + (F.col("event_id") % 500) * 0.001).alias("lat"),
        (F.lit(-74.0) + ((F.col("event_id") * 7) % 500) * 0.001).alias(
            "lon"
        ),
    )
    places = spark.createDataFrame(
        [
            ("downtown", 40.10, -73.90),
            ("midtown", 40.30, -73.70),
            ("uptown", 40.45, -74.00),
        ],
        "station string, place_lat double, place_lon double",
    )
    out = join_points_in_radius(ev, places, 5.0)
    return out.select(
        "event_id",
        "station",
        F.round("distance_km", 4).alias("dist_km"),
    )


# ---------------------------------------------------------------------------
# E2E — the fused master-table pipeline: the reference's flagship
# MLPREP -> MERGE chain (MERGE cell 18: 7-way outer join on
# calendarDate -> impute -> ffill -> flags -> TBL_ML_MASTER) composed
# as ONE Catalyst plan. j1 certifies the join operator alone; this row
# certifies the fusion SURVEY §3 promises: scan -> clean -> 7-way full
# outer join on the day key -> mean imputation (1-row broadcast) ->
# year-partitioned LOCF -> threshold flags, with the small dims
# (nation, region) broadcast inside the same plan.
#
# Branch day ranges are deliberately disjoint (events: 2024-01;
# orders/lineitem: 1995-2001), so the outer join produces real NULL
# regions and the impute/ffill stages do real work. LOCF is
# partitioned by year(day) — mirrored exactly in the oracle — so no
# window serializes the whole series through one task at scale; day
# is unique per partition, so ordering is unambiguous.
# ---------------------------------------------------------------------------
@register(
    "e2e_master_daily",
    """
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type, value
        FROM events WHERE ts IS NOT NULL
    ), clicks AS (
        SELECT day, COUNT(*) AS click_n FROM ev
        WHERE event_type = 'click' GROUP BY day
    ), views AS (
        SELECT day, COUNT(*) AS view_n FROM ev
        WHERE event_type = 'view' GROUP BY day
    ), purchases AS (
        SELECT day, COUNT(*) AS purchase_n FROM ev
        WHERE event_type = 'purchase' GROUP BY day
    ), od AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS order_n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS order_total
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), sd AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   AS ship_qty
        FROM lineitem
        WHERE l_returnflag <> 'R' AND l_shipdate IS NOT NULL
        GROUP BY 1
    ), asia AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS asia_order_n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND o_orderdate IS NOT NULL
        GROUP BY 1
    ), vd AS (
        -- sparse series (purchase days, day-of-month % 5 <> 2 holes)
        -- so the LOCF stage has real gaps to fill
        SELECT day,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value) AS avg_value
        FROM ev
        WHERE event_type = 'purchase' AND day(day) % 5 <> 2
        GROUP BY day
    ), m AS (
        SELECT * FROM clicks
        FULL JOIN views USING (day)
        FULL JOIN purchases USING (day)
        FULL JOIN od USING (day)
        FULL JOIN sd USING (day)
        FULL JOIN asia USING (day)
        FULL JOIN vd USING (day)
    ), b AS (
        SELECT CAST(SUM(CAST(ship_qty AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(ship_qty) AS ship_mean
        FROM sd
    )
    SELECT day, click_n, view_n, purchase_n, order_n, order_total,
           ROUND(COALESCE(ship_qty, (SELECT ship_mean FROM b)), 6)
               AS ship_qty_filled,
           asia_order_n,
           ROUND(last_value(avg_value IGNORE NULLS) OVER (
               PARTITION BY year(day) ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS value_locf,
           CAST((COALESCE(click_n, 0) + COALESCE(view_n, 0)
                 + COALESCE(purchase_n, 0)) > 200 AS INT) AS is_active,
           CAST(day >= DATE '1998-01-01' AS INT) AS is_recent
    FROM m
    """,
    doc="Fused master-table pipeline (MLPREP+MERGE in one plan): "
    "clean -> 7-branch daily aggregates -> full outer join on day -> "
    "broadcast-mean imputation -> year-partitioned LOCF -> flags. "
    "The end-to-end TBL_ML_MASTER artifact (MERGE cell 18) as a "
    "single Catalyst plan with nation/region broadcast.",
)
def e2e_master_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .withColumn("day", F.to_date("ts"))
    )

    # day is materialized BEFORE each groupBy (see j1's note): the
    # aggregate then hash-partitions on the concrete column and every
    # downstream full-outer join reuses that distribution.
    def daily(event_type: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias(out))
        )

    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .withColumn("day", F.to_date("o_orderdate"))
    )
    od = orders.groupBy("day").agg(
        F.count(F.lit(1)).alias("order_n"),
        _dsum(F.col("o_totalprice")).alias("order_total"),
    )
    sd = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_returnflag") != "R")
            & F.col("l_shipdate").isNotNull()
        )
        .withColumn("day", F.to_date("l_shipdate"))
        .groupBy("day")
        .agg(_dsum(F.col("l_quantity")).alias("ship_qty"))
    )
    # small-dim chain: nation (25 rows) and region (5) broadcast;
    # orders x customer is the one genuine shuffle join of the branch
    asia = (
        orders.join(
            table(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey"
            ),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("asia_order_n"))
    )
    vd = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.dayofmonth("day") % 5 != 2)
        )
        .groupBy("day")
        .agg((_dsum(F.col("value")) / F.count("value")).alias("avg_value"))
    )

    m = master_outer_join(
        [daily("click", "click_n"), daily("view", "view_n"),
         daily("purchase", "purchase_n"), od, sd, asia, vd],
        on="day",
    )
    ship_mean = sd.agg(
        (_dsum(F.col("ship_qty")) / F.count("ship_qty")).alias("ship_mean")
    )
    locf = Window.partitionBy(F.year("day")).orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return m.crossJoin(F.broadcast(ship_mean)).select(
        "day",
        "click_n",
        "view_n",
        "purchase_n",
        "order_n",
        "order_total",
        F.round(
            F.coalesce(F.col("ship_qty"), F.col("ship_mean")), 6
        ).alias("ship_qty_filled"),
        "asia_order_n",
        F.round(
            F.last("avg_value", ignorenulls=True).over(locf), 6
        ).alias("value_locf"),
        (
            F.coalesce(F.col("click_n"), F.lit(0))
            + F.coalesce(F.col("view_n"), F.lit(0))
            + F.coalesce(F.col("purchase_n"), F.lit(0))
            > 200
        )
        .cast("int")
        .alias("is_active"),
        (F.col("day") >= F.lit("1998-01-01").cast("date"))
        .cast("int")
        .alias("is_recent"),
    )



# ---------------------------------------------------------------------------
# J7 — skew-resilient salted equi-join (SURVEY §4 scale notes, the
# join twin of a14's salted aggregate): events (big, potentially
# hot-keyed) x customer (too big to broadcast in the 100 TB regime)
# on user_id, salted over 8 buckets. Row-identical to the plain join
# — the oracle IS the plain join.
# ---------------------------------------------------------------------------
@register(
    "j7_salted_skew_join",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment AS mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc="Salted sort-merge join: big side salted by hash(event_id) "
    "mod 8, small side replicated once per salt, join on (key, salt) "
    "- a pathological hot key spreads over 8 reducers instead of "
    "pinning one task. Static fix for skew AQE can't rewrite; "
    "results identical to the unsalted join.",
)
def j7_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators import salted_join

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    return salted_join(
        ev, cust, key="user_id", salt_col="event_id", buckets=8
    ).select("event_id", "user_id", "mktsegment", "value")


# ---------------------------------------------------------------------------
# ST5 — stream-static enrichment join + windowed rollup: the stream
# side joins a static dim (stateless, broadcast per micro-batch),
# then aggregates per (day, segment). Registered entry runs the
# batch twin of the same code path; the streaming test asserts
# stream-vs-batch row equivalence.
# ---------------------------------------------------------------------------
@register(
    "st5_segment_rollup",
    """
    SELECT CAST(time_bucket(INTERVAL '1 day', e.ts) AS DATE) AS day,
           c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_events,
           {sv}
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.ts IS NOT NULL
    GROUP BY 1, 2
    """.format(sv=dsum("e.value", "total_value")),
    doc="Stream-static enrichment: events joined to the customer dim "
    "(broadcast - zero join state in streaming), tumbling-day rollup "
    "per market segment. One shuffle (the windowed aggregate); the "
    "dim never shuffles the stream.",
)
def st5_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.streaming import enrich_events

    return enrich_events(
        table(spark, sf_dir, "events"),
        table(spark, sf_dir, "customer"),
        window="1 day",
    )


# ---------------------------------------------------------------------------
# B2 — Z-order (Morton) layout key: the multi-column data-skipping
# lever (Delta OPTIMIZE ZORDER / UB-tree, public literature) — see
# operators/layout.py for the layout write itself and
# tests/test_layout_zorder.py for the measured per-file min/max
# tightening on BOTH filter axes. This row certifies the KEY
# arithmetic end to end: rank-scale user_id and epoch-micros ts into
# 16 bits each with exact integer arithmetic (DECIMAL(38,0)/HUGEINT
# product, truncating div == flooring // on the non-negative
# operands — the w9/w10 discipline), then the unrolled 32-term
# shift/mask interleave. Pure JVM column arithmetic, one 4-scalar
# aggregate broadcast back (the e2e/t17 1-row pattern), zero
# shuffles beyond it.
# ---------------------------------------------------------------------------
def _b2_oracle() -> str:
    from garmin_data_pipeline_spark.operators.layout import (
        zorder_oracle_interleave_sql,
        zorder_oracle_scale_sql,
    )

    sa = zorder_oracle_scale_sql("user_id", "amin", "amax", 16)
    sb = zorder_oracle_scale_sql("t", "bmin", "bmax", 16)
    inter = zorder_oracle_interleave_sql("sa", "sb", 16)
    return f"""
    WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS t
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), st AS (
        SELECT MIN(user_id) AS amin, MAX(user_id) AS amax,
               MIN(t) AS bmin, MAX(t) AS bmax
        FROM ev
    ), scaled AS (
        SELECT event_id, {sa} AS sa, {sb} AS sb
        FROM ev CROSS JOIN st
    )
    SELECT event_id, CAST({inter} AS BIGINT) AS z
    FROM scaled
    """


@register(
    "b2_zorder_key",
    _b2_oracle(),
    doc="Z-order/Morton layout key over (user_id, epoch-micros ts): "
    "exact integer rank-scale to 16 bits per key plus the unrolled "
    "bit interleave — the value write_zordered range-partitions and "
    "sorts by so parquet min/max stats prune on EITHER column. "
    "Engine-exact integer arithmetic end to end (hash-matched "
    "oracle); one 4-scalar aggregate broadcast back, no other "
    "shuffle.",
)
def b2_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions.durations import (
        epoch_micros,
    )
    from garmin_data_pipeline_spark.operators.layout import (
        with_zorder_key,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    ev = ev.select(
        "event_id",
        "user_id",
        epoch_micros("ts", dtype=ev.schema["ts"].dataType).alias("t"),
    )
    return with_zorder_key(ev, "user_id", "t", bits=16, out="z").select(
        "event_id", "z"
    )


# ---------------------------------------------------------------------------
# B1 — bucketed co-located join: lineitem and orders written once as
# 8-bucket bucket-sorted tables on the join key, then joined with NO
# Exchange and NO Sort (the warehouse layout that amortizes one
# write-time shuffle over every downstream join on that key — the
# Spark analog of the reference warehouse's join-key B-tree indexes,
# create_summarized_activities_table.sql:93-96). The plan invariant
# is asserted by tests/test_scale_ops.py; the oracle is the plain
# join+agg, since bucketing only changes layout, never results.
# ---------------------------------------------------------------------------
@register(
    "b1_bucketed_join_agg",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {sp}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """.format(sp=dsum("l_extendedprice", "sum_price")),
    doc="Join over pre-bucketed tables: both sides bucket-sorted by "
    "the join key at write time (8 buckets here; cores x small "
    "multiple at cluster scale), so the sort-merge join reads "
    "co-located pre-sorted buckets - zero Exchange, zero Sort in "
    "the join stage. Layout cost paid once, amortized per query.",
)
def b1_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from garmin_data_pipeline_spark.sources import write_bucketed_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tl, to = f"b1_lineitem_{tag}", f"b1_orders_{tag}"
    base = f"/tmp/spark-bucketed-{tag}"
    # write_bucketed_table lays out ONE file per bucket, which makes
    # it safe to honor the written per-bucket sort at scan time —
    # with it, the merge join needs neither Exchange NOR Sort.
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    # Layout pass: once per (session, sf_dir) — exactly the
    # write-once / join-many contract bucketing exists for.
    if not spark.catalog.tableExists(tl):
        write_bucketed_table(
            table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice"
            ),
            tl,
            "l_orderkey",
            n_buckets=8,
            path=f"{base}/lineitem",
        )
    if not spark.catalog.tableExists(to):
        write_bucketed_table(
            table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
            to,
            "o_orderkey",
            n_buckets=8,
            path=f"{base}/orders",
        )
    bl, bo = spark.table(tl), spark.table(to)
    joined = bl.hint("merge").join(
        bo, bl["l_orderkey"] == bo["o_orderkey"]
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        _dsum(F.col("l_extendedprice")).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# A15 — CUBE over (event_type, day): every rollup combination in one
# pass. Extends a12's ROLLUP (hypertable-style) to the full lattice —
# Spark expands the cube with a single Expand node feeding one hash
# aggregate (partial combine still applies), not 4 scans.
# ---------------------------------------------------------------------------
@register(
    "a15_cube_events",
    """
    SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(*) AS n,
           {v},
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_day
    FROM events
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """.format(v=dsum("value", "total_value")),
    doc="GROUP BY CUBE over (event_type, day) with GROUPING flags to "
    "disambiguate native NULLs from subtotal rows; one Expand + one "
    "partial-combined hash aggregate, no re-scan per grouping set.",
)
def a15_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value")).alias("total_value"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("day").cast("int").alias("g_day"),
    )


# ---------------------------------------------------------------------------
# W6 — time-RANGE rolling aggregate: per-user 7-day rolling spend over
# events. Distinct window form from w1's ROWS cumsum: the frame is a
# TIME interval (rangeBetween on epoch micros), so peers at the same
# instant aggregate together and gaps shrink the frame. Exact DECIMAL
# accumulation keeps DuckDB's segment-tree window sums hash-equal.
# ---------------------------------------------------------------------------
@register(
    "w6_rolling_7d",
    """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS roll_7d_sum,
           COUNT(*) OVER w AS roll_7d_n
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
    )
    """,
    doc="Per-user 7-day rolling sum/count: user-partitioned window "
    "(one shuffle on user_id), RANGE frame over epoch-microsecond "
    "order — never a global window.",
)
def w6_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from garmin_data_pipeline_spark.functions.durations import (
        epoch_micros,
    )

    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ts_us = epoch_micros("ts", dtype=ev.schema["ts"].dataType)
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-7 * 24 * 3600 * 1000000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("roll_7d_sum"),
        F.count(F.lit(1)).over(w).alias("roll_7d_n"),
    )


# ---------------------------------------------------------------------------
# A16 — NTILE decile stats: per-language document-length deciles, then
# per-decile aggregates. The window runs per-lang (partitioned, never
# global) over a deterministic ordering; the decile assignment is an
# exact integer so the oracle hash cannot drift.
# ---------------------------------------------------------------------------
@register(
    "a16_decile_stats",
    """
    WITH d AS (
        SELECT lang, n_chars,
               -- NULLS FIRST: Spark's ASC default; DuckDB defaults
               -- NULLS LAST, which would shift every decile when a
               -- length is missing
               CAST(NTILE(10) OVER (
                   PARTITION BY lang
                   ORDER BY n_chars NULLS FIRST, doc_id
               ) AS INT) AS decile
        FROM documents
    )
    SELECT lang, decile, COUNT(*) AS n,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM d GROUP BY lang, decile
    """,
    doc="Per-language NTILE(10) length deciles -> per-decile count/"
    "min/max: a lang-partitioned window (shuffle on lang only) feeding "
    "a partial-combined hash aggregate. The decile boundary summary a "
    "corpus length-profile report is built from.",
)
def a16_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    d = table(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.ntile(10).over(w).cast("int").alias("decile"),
    )
    return d.groupBy("lang", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# P15 — semi/anti join surface: customers WITH at least one order vs
# customers with NONE, one output with a flag. The semi/anti pair is
# the relational idiom every retention/backfill audit runs; both sides
# shuffle on the key once (or broadcast when the order side is small).
# ---------------------------------------------------------------------------
@register(
    "p15_semi_anti_orders",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(EXISTS (
               SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           ) AS INT) AS has_orders
    FROM customer c
    """,
    doc="LEFT SEMI + LEFT ANTI join pair (EXISTS / NOT EXISTS) "
    "unioned with a flag: the customers-with/without-orders audit. "
    "Spark plans both sides as one existence join, not two scans.",
)
def p15_semi_anti_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    with_o = cust.join(orders, "c_custkey", "left_semi").withColumn(
        "has_orders", F.lit(1)
    )
    without_o = cust.join(orders, "c_custkey", "left_anti").withColumn(
        "has_orders", F.lit(0)
    )
    return with_o.unionByName(without_o)


# ---------------------------------------------------------------------------
# O4 — per-group top-k via AGGREGATE (collect_list -> sort_array ->
# slice) instead of o3's window. The tradeoff this query certifies:
# the window form shuffles once then sorts every group fully; the
# aggregate form carries whole groups through collect_list (no
# map-side partial), so it wins only when groups are small and the
# input is already partitioned by the key — and it can never spill a
# single group. Pick per workload; both are now oracle-certified to
# agree.
# ---------------------------------------------------------------------------
@register(
    "o4_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rnk
        FROM orders WHERE o_totalprice IS NOT NULL
    ) WHERE rnk <= 3
    """,
    doc="Top-3 orders per customer via the aggregate strategy: "
    "collect_list of (neg-price, key) structs, sort_array, slice — "
    "struct comparison gives the DESC-price / ASC-key order without "
    "a window sort of full groups. NULL prices excluded on both "
    "sides (a NULL struct field would sort engine-specifically).",
)
def o4_topk_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    s = F.struct(
        (-F.col("o_totalprice")).alias("np"),
        F.col("o_orderkey").alias("k"),
    )
    agg = orders.groupBy("o_custkey").agg(
        F.slice(F.sort_array(F.collect_list(s)), 1, 3).alias("top")
    )
    ex = agg.select(
        "o_custkey", F.posexplode("top").alias("pos", "t")
    )
    return ex.select(
        "o_custkey",
        F.col("t.k").alias("o_orderkey"),
        (-F.col("t.np")).alias("o_totalprice"),
        (F.col("pos") + 1).cast("int").alias("rnk"),
    )


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {
        name: q.oracle for name, q in QUERIES.items() if q.oracle is not None
    }


# ---------------------------------------------------------------------------
# Q3 — shipping-priority revenue top-10, registered as a PURE SQL
# query: the Spark side runs the SAME ANSI text through spark.sql()
# over temp views that the oracle runs on DuckDB — certifying the
# SQL entry path end-to-end (every other query certifies the
# DataFrame API; a reference user migrating raw SQL gets this path).
# Dialect-shared constructs only: DATE literals, DECIMAL-exact
# revenue sum (bit-identical, so the float top-10 selection is
# deterministic on both engines).
# ---------------------------------------------------------------------------
_Q3_SQL = """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
               AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) > DATE '1996-06-30'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@register(
    "q3_sql_revenue_topk",
    _Q3_SQL,
    doc="TPC-H Q3-shaped shipping-priority query run through "
    "spark.sql() verbatim — the identical ANSI text IS the oracle. "
    "Catalyst gets the full query at once: both joins plan as "
    "broadcast-hash under AQE (customer filter first), dates prune "
    "at the scans, and the top-10 is TakeOrderedAndProject.",
)
def q3_sql_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q3_SQL)


# ---------------------------------------------------------------------------
# Q5 — local-supplier volume (TPC-H Q5 shape): revenue per nation for
# orders whose customer AND line-supplier sit in the same nation of
# one region, over a two-year window. The classic warehouse star-join
# planning exercise the q3 entry only half-covers: SIX relations, a
# non-key equality (s_nationkey = c_nationkey) that correlates two
# branches of the join tree, and selective dim filters that must
# prune before the fact scan.
# Scale shape: region/nation are constant-size (broadcast literals),
# customer/supplier are key-joined dims AQE broadcasts at any
# realistic dim:fact ratio, and the only required shuffle is the
# final nation aggregate — Catalyst plans the whole chain as
# broadcast-hash joins over ONE lineitem scan with the date filter
# pushed into the orders scan.
# Float discipline: extendedprice/discount are 2-dp grid data — the
# DECIMAL(12,2) casts are exact (never a round-half tie), the
# accumulation is exact DECIMAL, and only the finished sum widens to
# DOUBLE (a value with a 4-dp exact decimal expansion well inside
# 2^53 — identical on both engines).
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-shaped local-supplier volume: six-relation "
    "star join (lineitem x orders x customer x supplier x nation x "
    "region) with the local-supplier correlation "
    "s_nationkey = c_nationkey, revenue per nation in exact DECIMAL "
    "accumulation widened to DOUBLE at the end. Dims broadcast, "
    "date filter pushed to the orders scan, one shuffle for the "
    "final aggregate.",
)
def q5_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(
        table(spark, sf_dir, "region").filter(
            F.col("r_name") == "ASIA"
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# E3 — cohort retention matrix: users bucketed by first-activity day,
# distinct-user counts per (cohort, day-offset). THE standard product-
# analytics rollup over an event stream; the reference's notebooks
# stop at per-day aggregates — this is the cross-day composition a
# warehouse user asks for next.
# Scale shape: one groupBy(user) for cohort assignment, one join back
# on user_id (both sides keyed by the same column — at 100 TB this is
# two shuffles on user_id total), then a (cohort, offset) aggregate
# whose distinct-count gets map-side partial aggregation. No windows,
# no driver state.
# ---------------------------------------------------------------------------
@register(
    "e3_cohort_retention",
    """
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day FROM events
    ), cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, e.day) AS INT)
               AS offset_days,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM ev e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY c.cohort_day, offset_days
    """,
    doc="Cohort retention: first-activity-day cohorts x day offset "
    "-> distinct active users. Two user-keyed shuffles + one "
    "partial-aggregated distinct count.",
)
def e3_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day")
            .cast("int")
            .alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# E4 — strictly-ordered conversion funnel: view -> click -> purchase,
# each stage's timestamp must FOLLOW the previous stage's first
# occurrence (a click before any view doesn't count). Per stage, the
# distinct users who reached it.
# Scale shape: one events scan feeds three stage branches, each a
# pushed-down filter on event_type + a user-keyed min-aggregate; the
# stage joins are user-keyed equi-joins (no windows, no per-user
# event sorting — the min-ts reduction is all the ordering needed).
# ---------------------------------------------------------------------------
@register(
    "e4_funnel_stages",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_buy
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT stage, COUNT(*) AS n_users FROM (
        SELECT 'view' AS stage, user_id FROM v
        UNION ALL SELECT 'click' AS stage, user_id FROM c
        UNION ALL SELECT 'purchase' AS stage, user_id FROM p
    ) GROUP BY stage
    """,
    doc="Ordered funnel view->click->purchase (each stage strictly "
    "after the previous stage's first event): per-stage reached-user "
    "counts. Filter-pushed stage scans + user-keyed min aggregates.",
)
def e4_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    stages = (
        v.select(F.lit("view").alias("stage"), "user_id")
        .unionByName(c.select(F.lit("click").alias("stage"), "user_id"))
        .unionByName(
            p.select(F.lit("purchase").alias("stage"), "user_id")
        )
    )
    return stages.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# U3 — unpivot/melt (wide -> long), beyond-reference: SURVEY's
# U-family stops at concat (U1) and struct flatten (U2); melt is
# their inverse and the reshape a pandas user reaches for next.
# Values pass through unchanged — no arithmetic, so doubles
# hash exactly. Narrow month filter keeps the oracle compare fast;
# the operator itself is a zero-shuffle row-local expansion
# (Catalyst compiles unpivot to Expand — 4 output rows per input row
# in one codegen stage, no exchange).
# ---------------------------------------------------------------------------
@register(
    "u3_unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, val FROM (
        SELECT l_orderkey, l_linenumber,
               'l_quantity' AS measure, l_quantity AS val
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-08-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-09-01'
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-08-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-09-01'
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-08-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-09-01'
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-08-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-09-01'
    )
    """,
    doc="Wide->long melt of the four lineitem measures via "
    "DataFrame.unpivot (Expand node: row-local, zero shuffle); "
    "oracle spells it as the dialect-shared UNION ALL.",
)
def u3_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    month = li.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-08-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-09-01").cast("date"))
    )
    return month.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# J8 — snapshot diff / CDC classification, beyond-reference: given a
# keyed table's state at two times, emit (key, change_type, old, new)
# for inserts / deletes / updates — the operator every incremental
# warehouse load and table-comparison job runs. Snapshots here are
# the per-order LATEST lineitem quantity as of two ship-date cutoffs
# (a real "state of the table at time T" pair); classification is one
# full-outer join on the key.
# Scale shape: two argmax-per-key aggregates (window over the key) +
# one key-keyed full-outer sort-merge join; unchanged keys are
# filtered out before the sink, so output is O(changes), not O(keys).
# ---------------------------------------------------------------------------
_J8_OLD = "1997-01-01"
_J8_NEW = "1998-01-01"


@register(
    "j8_snapshot_diff",
    f"""
    WITH snap_old AS (
        SELECT l_orderkey, l_quantity AS qty FROM (
            SELECT l_orderkey, l_quantity, ROW_NUMBER() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_shipdate DESC, l_linenumber DESC
            ) AS rn
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) < DATE '{_J8_OLD}'
        ) WHERE rn = 1
    ), snap_new AS (
        SELECT l_orderkey, l_quantity AS qty FROM (
            SELECT l_orderkey, l_quantity, ROW_NUMBER() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_shipdate DESC, l_linenumber DESC
            ) AS rn
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) < DATE '{_J8_NEW}'
        ) WHERE rn = 1
    )
    SELECT COALESCE(o.l_orderkey, n.l_orderkey) AS l_orderkey,
           CASE WHEN o.l_orderkey IS NULL THEN 'insert'
                WHEN n.l_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.qty AS old_qty, n.qty AS new_qty
    FROM snap_old o FULL OUTER JOIN snap_new n
      ON o.l_orderkey = n.l_orderkey
    WHERE o.l_orderkey IS NULL OR n.l_orderkey IS NULL
       OR o.qty IS DISTINCT FROM n.qty
    """,
    doc="Snapshot diff (CDC classify): per-order latest-lineitem "
    "state at two cutoffs, full-outer joined on the key and "
    "classified insert/delete/update; unchanged keys dropped before "
    "the sink so output is O(changes).",
)
def j8_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")

    def snapshot(cutoff: str) -> DataFrame:
        w = Window.partitionBy("l_orderkey").orderBy(
            F.col("l_shipdate").desc(), F.col("l_linenumber").desc()
        )
        return (
            li.filter(
                F.to_date("l_shipdate") < F.lit(cutoff).cast("date")
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("l_orderkey", F.col("l_quantity").alias("qty"))
        )

    old = snapshot(_J8_OLD).alias("o")
    new = snapshot(_J8_NEW).alias("n")
    joined = old.join(
        new, F.col("o.l_orderkey") == F.col("n.l_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("o.l_orderkey").isNull(), F.lit("insert"))
        .when(F.col("n.l_orderkey").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return joined.select(
        F.coalesce(F.col("o.l_orderkey"), F.col("n.l_orderkey")).alias(
            "l_orderkey"
        ),
        change.alias("change_type"),
        F.col("o.qty").alias("old_qty"),
        F.col("n.qty").alias("new_qty"),
    ).filter(
        F.col("o.l_orderkey").isNull()
        | F.col("n.l_orderkey").isNull()
        | ~F.col("o.qty").eqNullSafe(F.col("n.qty"))
    )


# ---------------------------------------------------------------------------
# W8 — SCD2 validity intervals, beyond-reference: turn an event log
# into slowly-changing-dimension rows (state, valid_from, valid_to,
# is_current) — the standard way a warehouse materializes "what was
# this user's state at time T". One user-partitioned window (LEAD);
# no self-join, no driver state.
# ---------------------------------------------------------------------------
@register(
    "w8_scd2_intervals",
    """
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to,
           CAST(LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS BOOLEAN) AS is_current
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    """,
    doc="SCD2 interval build from the event log: each event opens a "
    "state valid until the user's next event (LEAD over a "
    "user-partitioned window, event_id tiebreak for simultaneous "
    "events); NULL valid_to marks the current row.",
)
def w8_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# O5 — exact grouped median, beyond-reference: the percentile family
# demonstrated per-group (t4's quantiles are global and approximate —
# this is the exact form a reporting layer asks for). EXACT because
# l_quantity is integer-valued: the 0.5-quantile interpolation is a
# midpoint of two representable doubles, identical on both engines
# regardless of their interpolation formulae. (Non-midpoint quantiles
# of arbitrary doubles would NOT hash cross-engine — Spark computes
# (1-g)*a + g*b, DuckDB a + (b-a)*g, which differ in ULPs.)
# Scale shape: Spark's percentile is a full-sort-free aggregate
# (OpenHashMap of counts per group); one shuffle on the group key.
# ---------------------------------------------------------------------------
@register(
    "o5_median_quantity",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Exact per-group median of an integer-valued measure — "
    "midpoint interpolation is representable, so the double is "
    "bit-identical cross-engine; one group-keyed aggregate.",
)
def o5_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# O6 — Pareto frontier (skyline), beyond-reference: orders on the
# (earliest o_orderdate, highest o_totalprice) frontier — no other
# order is at an earlier-or-equal date with a greater-or-equal price
# and strictly better on one axis. The oracle is the TEXTBOOK O(n^2)
# dominance anti-join; the Spark plan is the scale re-expression
# (operators/skyline.py): collapse to per-timestamp maxes (the only
# full-data shuffle), day-partitioned running max within buckets, a
# calendar-bounded broadcast inequality self-join across buckets
# (allowlisted NLJ — both sides one-row-per-day-ever, ~4e4 rows a
# century), then the frontier-sized coordinate set broadcast back
# onto the fact. No global sort, no all-pairs, fact scanned twice.
# Float discipline: prices are compared, never combined — stored
# doubles flow through max/greater-than identically on both engines.
# ---------------------------------------------------------------------------
@register(
    "o6_pareto_frontier",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders q
      WHERE q.o_orderdate <= o.o_orderdate
        AND q.o_totalprice >= o.o_totalprice
        AND (q.o_orderdate < o.o_orderdate
             OR q.o_totalprice > o.o_totalprice))
    """,
    doc="2-D skyline (minimize orderdate, maximize totalprice): "
    "textbook quadratic dominance oracle vs aggregate-and-broadcast "
    "Spark plan — one fact shuffle, bucket-partitioned windows only, "
    "cross-bucket prefix max on a calendar-bounded broadcast table.",
)
def o6_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.skyline import (
        pareto_frontier_2d,
    )

    orders = table(spark, sf_dir, "orders")
    return pareto_frontier_2d(
        orders, "o_orderdate", "o_totalprice"
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


# ---------------------------------------------------------------------------
# W9 — time-weighted average, beyond-reference: the irregular-series
# mean a metrics warehouse actually wants (arithmetic mean over-weights
# burst periods). Each observation's value is held until the user's
# next observation (same step-function reading as w8's SCD2
# intervals); weight = hold duration in integer epoch micros.
# Float discipline (r8 lesson — the first cut of this query cast a
# COMPUTED double (value * dur) to DECIMAL(38,6), and double->DECIMAL
# conversion rounds HALF_UP on Spark vs HALF_EVEN on DuckDB: green
# locally, red on the driver host): nothing here touches a
# rounding-mode-sensitive conversion anymore. `value` is 2-dp grid
# data, so CAST(value AS DECIMAL(12,2)) is exact on BOTH engines (the
# stored double's decimal expansion is never a tie at the 2nd place);
# cents = vd*100 is an exact integer; cents x integer micros
# accumulates in DECIMAL(38,0)/HUGEINT with zero rounding anywhere;
# and the output is twa_e6 = floor(num * 1e6 / den) as BIGINT — the
# floor of an exact rational, engine-independent (operands positive,
# so Spark's truncating `div` == DuckDB's flooring `//`). Users with
# a single observation have no held interval -> NULL twa_e6/held_us
# (both engines: SUM over empty is NULL).
# Scale shape: one user-partitioned LEAD window + one hash aggregate
# — the same single shuffle w8 pays; no global window anywhere.
# ---------------------------------------------------------------------------
@register(
    "w9_time_weighted_avg",
    """
    WITH pts AS (
        SELECT user_id, CAST(value AS DECIMAL(12,2)) AS vd,
               epoch_us(ts) AS t,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND value IS NOT NULL
    ), agg AS (
        SELECT user_id,
               SUM(CAST(vd * 100 AS HUGEINT) * (nxt - t)) AS num_c,
               SUM(nxt - t) AS held_us,
               COUNT(*) AS n_obs
        FROM pts
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(CASE WHEN held_us > 0
                     THEN (num_c * 10000) // held_us END
                AS BIGINT) AS twa_e6,
           CAST(held_us AS BIGINT) AS held_us,
           n_obs
    FROM agg
    """,
    doc="Time-weighted average of the event value per user: value "
    "held until the next observation, weighted by integer hold "
    "micros; exact cents x micros DECIMAL accumulation (no "
    "double->DECIMAL cast of any computed expression), emitted as "
    "the floor-scaled BIGINT twa_e6; one LEAD window + one "
    "aggregate (single user-keyed shuffle).",
)
def w9_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from garmin_data_pipeline_spark.functions.durations import (
        epoch_micros,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    t_us = epoch_micros("ts", dtype=ev.schema["ts"].dataType)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = ev.select(
        "user_id",
        # value is 2-dp data: the cast is exact (never a round-half
        # tie), cents is then an exact DECIMAL integer.
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("decimal(20,0)")
        .alias("cents"),
        t_us.alias("t"),
        (F.lead(t_us).over(w)).alias("nxt"),
    )
    dur = F.col("nxt") - F.col("t")
    agg = pts.groupBy("user_id").agg(
        # DECIMAL(20,0) x micros -> DECIMAL(38,0): exact integer
        # cents-micro-seconds, no rounding reachable anywhere.
        F.sum(F.col("cents") * dur).alias("num_c"),
        F.sum(dur).alias("held_us"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    # floor(num * 1e6 / den) over exact integers: `div` truncates,
    # operands are non-negative, so it equals DuckDB's flooring `//`.
    # PRECONDITION (ADVICE r9): non-negativity comes from
    # events.value >= 0 — a fixture/corpus with negative gauge values
    # breaks truncate==floor and the engines drift by 1 ulp of scale.
    # tools/check.py fails loudly on a negative-value fixture before
    # running any query; a real deployment with signed gauges must
    # split sign out first (abs + sign column) or switch both sides
    # to an explicit floor.
    # The CASE guards ANSI division-by-zero (all-zero hold spans).
    return agg.select(
        "user_id",
        F.expr(
            "CASE WHEN held_us > 0"
            " THEN (num_c * 10000) div held_us END"
        ).alias("twa_e6"),
        "held_us",
        "n_obs",
    )


def _typed_intervals_cte(tag: str, etype: str) -> str:
    return f"""
    iv_{tag} AS (
        SELECT user_id, ts AS s,
               LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS e
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_type = '{etype}'
        QUALIFY e IS NOT NULL
    )"""


# ---------------------------------------------------------------------------
# W10 — exponentially-decayed rolling average (EWMA over the last 8
# observations per user), beyond-reference: the smoothing a metrics
# warehouse applies to irregular gauges where w9's time-weighting is
# too aggressive. Float discipline BY CONSTRUCTION (the w9 lesson
# applied forward): decay 0.5 makes every weight 2^-k — an EXACT
# decimal literal (0.0078125 at k=7) — so DECIMAL(12,2) values times
# DECIMAL(9,7) weights accumulate exactly, and the result is emitted
# as the floor-scaled BIGINT ewma_e6. No double appears anywhere in
# the plan. The k=0 term always exists (the row itself), so the
# denominator is never zero.
# Scale shape: 8 LAG columns over ONE user-keyed window — a single
# shuffle, no self-join; the window-frame alternative (weighted SUM
# OVER ROWS) cannot weight by distance and a per-row explode of the
# history would be an 8x blowup.
# ---------------------------------------------------------------------------
_EWMA_W = [0.5**k for k in range(8)]  # exact binary->decimal


def _ewma_terms_sql() -> tuple[str, str]:
    num, den = [], []
    for k, w in enumerate(_EWMA_W):
        lag = f"LAG(vd, {k}) OVER w" if k else "vd"
        wk = f"CAST({w!r} AS DECIMAL(9,7))"
        num.append(
            f"COALESCE({lag} * {wk}, CAST(0 AS DECIMAL(21,9)))"
        )
        den.append(
            f"CASE WHEN {lag} IS NOT NULL THEN {wk} "
            f"ELSE CAST(0 AS DECIMAL(9,7)) END"
        )
    return " + ".join(num), " + ".join(den)


@register(
    "w10_ewma_8",
    f"""
    WITH pts AS (
        SELECT user_id, event_id, ts,
               CAST(value AS DECIMAL(12,2)) AS vd
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND value IS NOT NULL
    ), terms AS (
        SELECT user_id, event_id,
               {_ewma_terms_sql()[0]} AS num,
               {_ewma_terms_sql()[1]} AS den
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    -- clear the scales to INTEGERS before dividing (the w9 recipe):
    -- decimal // decimal floors an already-ROUNDED decimal quotient
    -- (observed one-ulp-of-scale differences vs Spark's div), while
    -- integer // integer is the exact-rational floor on both engines.
    -- floor(num*1e6/den) == (num*1e9 * 10000) // (den*1e7).
    SELECT user_id, event_id,
           CAST((CAST(num * 1000000000 AS HUGEINT) * 10000)
                // CAST(den * 10000000 AS HUGEINT)
                AS BIGINT) AS ewma_e6
    FROM terms
    """,
    doc="Exponentially-decayed rolling mean (decay 0.5, last 8 "
    "observations) per user: every weight is an exact power-of-two "
    "decimal, values are exact DECIMAL(12,2), so the whole "
    "computation is rational-exact and the floor-scaled BIGINT "
    "output is engine-independent; 8 LAGs over one user-keyed "
    "window = a single shuffle.",
)
def w10_ewma_8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import Decimal

    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vd = F.col("value").cast("decimal(12,2)")
    pts = ev.select("user_id", "event_id", "ts", vd.alias("vd"))
    num = None
    den = None
    zero_n = F.lit(Decimal(0)).cast("decimal(21,9)")
    zero_d = F.lit(Decimal(0)).cast("decimal(9,7)")
    for k, wt in enumerate(_EWMA_W):
        lag = F.col("vd") if k == 0 else F.lag("vd", k).over(w)
        wk = F.lit(Decimal(str(wt))).cast("decimal(9,7)")
        term_n = F.coalesce(lag * wk, zero_n)
        term_d = F.when(lag.isNotNull(), wk).otherwise(zero_d)
        num = term_n if num is None else num + term_n
        den = term_d if den is None else den + term_d
    terms = pts.select(
        "user_id",
        "event_id",
        num.alias("num"),
        den.alias("den"),
    )
    # integers before the floor division — see the oracle comment.
    # Same truncate==floor PRECONDITION as w9: operands non-negative
    # because events.value >= 0 (gated in tools/check.py).
    return terms.select(
        "user_id",
        "event_id",
        F.expr(
            "(CAST(num * 1000000000 AS DECIMAL(38,0)) * 10000)"
            " div CAST(den * 10000000 AS DECIMAL(20,0))"
        ).alias("ewma_e6"),
    )


# ---------------------------------------------------------------------------
# J10 — interval anti-join, beyond-reference: j9's complement — the
# click-state intervals during which the user had NO overlapping
# view-state interval (coverage-gap / downtime detection; the
# reconciliation question "what ran unmonitored"). Semantics: a
# click interval survives iff it overlaps ZERO view intervals of the
# same user (closed intervals, touching counts as overlap — exactly
# j9's predicate, negated).
# Scale shape: the overlap pairs come from the same bin-bucketed
# hash join j9 runs (never a theta join), and the anti is one
# LEFT ANTI hash join on the interval's own identity — Catalyst
# builds the (small, already-deduped) overlap-key side as the hash
# side under AQE.
# ---------------------------------------------------------------------------
@register(
    "j10_interval_anti_join",
    "WITH "
    + _typed_intervals_cte("c", "click")
    + ", "
    + _typed_intervals_cte("v", "view")
    + """
    SELECT a.user_id, a.s AS click_start, a.e AS click_end
    FROM iv_c a
    WHERE NOT EXISTS (
        SELECT 1 FROM iv_v b
        WHERE b.user_id = a.user_id
          AND epoch_us(a.s) <= epoch_us(b.e)
          AND epoch_us(b.s) <= epoch_us(a.e)
    )
    """,
    doc="Interval anti-join: click-state intervals overlapping ZERO "
    "view-state intervals of the same user (coverage gaps). The "
    "overlap candidates come from j9's bin-bucketed hash join; the "
    "negation is one LEFT ANTI join on the interval identity.",
)
def j10_interval_anti_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    from garmin_data_pipeline_spark.operators.joins import (
        join_interval_overlap,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def intervals(etype: str, s_name: str, e_name: str) -> DataFrame:
        sub = ev.filter(F.col("event_type") == etype)
        return (
            sub.select(
                "user_id",
                F.col("ts").alias(s_name),
                F.lead("ts").over(w).alias(e_name),
            )
            .filter(F.col(e_name).isNotNull())
        )

    clicks = intervals("click", "click_start", "click_end")
    views = intervals("view", "view_start", "view_end")
    overlapped = join_interval_overlap(
        clicks,
        views,
        "click_start",
        "click_end",
        "view_start",
        "view_end",
        by=["user_id"],
        bin_seconds=86400,
    ).select("user_id", "click_start", "click_end")
    return clicks.join(
        overlapped,
        ["user_id", "click_start", "click_end"],
        "left_anti",
    )


# ---------------------------------------------------------------------------
# J9 — interval x interval overlap join, beyond-reference: j6's
# two-sided sibling (co-occurrence analysis, downtime x session
# attribution, SCD2 x SCD2 reconciliation). Interval sources are
# w8-style state intervals per event TYPE — each click holds until
# the user's next click, each view until the next view — which
# interleave and so genuinely overlap (30-min sessions from a sparse
# event log almost never do: the first cut of this query returned
# zero rows — a vacuous PASS — and was reshaped). Closed-interval
# semantics: touching intervals match with overlap_us = 0. The
# bin-bucket trick keeps it a hash join (fan-out = interval length /
# bin, never |other side|) and the pair-kept-only-in-its-overlap-
# start-bin rule dedupes WITHOUT a distinct
# (see operators/joins.py:join_interval_overlap). The shared
# _typed_intervals_cte helper lives above w10 (j10 uses it too).
# ---------------------------------------------------------------------------
@register(
    "j9_interval_overlap",
    "WITH "
    + _typed_intervals_cte("c", "click")
    + ", "
    + _typed_intervals_cte("v", "view")
    + """
    SELECT a.user_id,
           a.s AS click_start, a.e AS click_end,
           b.s AS view_start, b.e AS view_end,
           LEAST(epoch_us(a.e), epoch_us(b.e))
             - GREATEST(epoch_us(a.s), epoch_us(b.s)) AS overlap_us
    FROM iv_c a
    JOIN iv_v b
      ON a.user_id = b.user_id
     AND epoch_us(a.s) <= epoch_us(b.e)
     AND epoch_us(b.s) <= epoch_us(a.e)
    """,
    doc="Interval x interval overlap join: per-user click-state x "
    "view-state intervals (w8's LEAD construction per event type) "
    "with exact integer overlap micros; bin-bucketed hash join, "
    "dedup-by-construction (pair kept only in its overlap-start "
    "bin), no theta/nested-loop join.",
)
def j9_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from garmin_data_pipeline_spark.operators.joins import (
        join_interval_overlap,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def intervals(etype: str, s_name: str, e_name: str) -> DataFrame:
        sub = ev.filter(F.col("event_type") == etype)
        return (
            sub.select(
                "user_id",
                F.col("ts").alias(s_name),
                F.lead("ts").over(w).alias(e_name),
            )
            .filter(F.col(e_name).isNotNull())
        )

    out = join_interval_overlap(
        intervals("click", "click_start", "click_end"),
        intervals("view", "view_start", "view_end"),
        "click_start",
        "click_end",
        "view_start",
        "view_end",
        by=["user_id"],
        bin_seconds=86400,
    )
    return out.select(
        "user_id",
        "click_start",
        "click_end",
        "view_start",
        "view_end",
        "overlap_us",
    )
