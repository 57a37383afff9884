"""Tests for the 100 TB scale path: salted aggregation and bucketed
(shuffle-free) joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators.skew import salted_agg
from garmin_data_pipeline_spark.sources import sinks


class TestSaltedAgg:
    def test_matches_direct_aggregate(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        got = salted_agg(
            li,
            ["l_returnflag"],
            {"l_quantity": "sum", "l_extendedprice": "avg", "l_orderkey": "count"},
            salt_col="l_orderkey",
            buckets=8,
        )
        want = li.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("sum_l_quantity"),
            F.avg("l_extendedprice").alias("avg_l_extendedprice"),
            F.count("l_orderkey").alias("count_l_orderkey"),
        )
        g = {r["l_returnflag"]: r for r in got.collect()}
        w = {r["l_returnflag"]: r for r in want.collect()}
        assert set(g) == set(w)
        for k in w:
            assert g[k]["count_l_orderkey"] == w[k]["count_l_orderkey"]
            assert abs(g[k]["sum_l_quantity"] - w[k]["sum_l_quantity"]) < 1e-6
            assert (
                abs(g[k]["avg_l_extendedprice"] - w[k]["avg_l_extendedprice"])
                < 1e-6
            )

    def test_min_max(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        got = salted_agg(
            li,
            ["l_linestatus"],
            {"l_shipdate": "min", "l_discount": "max"},
            salt_col="l_orderkey",
        ).collect()
        want = (
            li.groupBy("l_linestatus")
            .agg(F.min("l_shipdate"), F.max("l_discount"))
            .collect()
        )
        assert {tuple(r) for r in got} == {tuple(r) for r in want}


class TestBucketedJoin:
    def test_bucketed_join_is_shuffle_free(self, spark, sf_dir):
        import shutil

        for t in ("b_lineitem", "b_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"/tmp/spark-test-warehouse/{t}", ignore_errors=True)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        sinks.load_table(
            li.select("l_orderkey", "l_quantity"),
            "b_lineitem",
            bucket_by=["l_orderkey"],
            buckets=8,
        )
        sinks.load_table(
            orders.select("o_orderkey", "o_totalprice"),
            "b_orders",
            bucket_by=["o_orderkey"],
            buckets=8,
        )
        # Disable auto-broadcast: at test scale Catalyst would (rightly)
        # broadcast the small side; the point here is the big-big path,
        # where bucketing must remove the shuffle before the merge join.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            assert "Exchange hashpartitioning" not in plan, plan
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_lineitem")
        spark.sql("DROP TABLE b_orders")


class TestPerUserPartitioning:
    """The reference is single-user; these prove the same operators
    hold when partitioned by a tenant key (the 1000x scale shape)."""

    def test_densify_ffill_per_user(self, spark):
        from garmin_data_pipeline_spark.operators import densify_daily_ffill

        df = spark.createDataFrame(
            [
                (1, "2024-01-01", 10.0),
                (1, "2024-01-04", 13.0),
                (2, "2024-02-01", 50.0),
                (2, "2024-02-03", None),
            ],
            "user long, d string, v double",
        ).selectExpr("user", "CAST(d AS DATE) AS d", "v")
        out = densify_daily_ffill(df, "d", ["v"], partition_by=["user"])
        rows = {(r["user"], str(r["d"])): r["v"] for r in out.collect()}
        # user 1: gap days 01-02/01-03 exist and carry the LOCF value
        assert rows[(1, "2024-01-02")] == 10.0
        assert rows[(1, "2024-01-03")] == 10.0
        assert rows[(1, "2024-01-04")] == 13.0
        # user 2's scaffold is its own range — no bleed from user 1
        assert (2, "2024-01-02") not in rows
        assert rows[(2, "2024-02-02")] == 50.0
        assert rows[(2, "2024-02-03")] == 50.0  # null ffilled

    def test_dedupe_latest_per_user_day(self, spark):
        from garmin_data_pipeline_spark.operators import dedupe_latest

        df = spark.createDataFrame(
            [
                (1, "2024-01-01", "2024-01-01 08:00:00", "a"),
                (1, "2024-01-01", "2024-01-01 09:00:00", "b"),
                (2, "2024-01-01", "2024-01-01 07:00:00", "c"),
            ],
            "user long, d string, ts string, val string",
        )
        out = dedupe_latest(df, ["user", "d"], "ts")
        got = {(r["user"], r["d"]): r["val"] for r in out.collect()}
        assert got == {(1, "2024-01-01"): "b", (2, "2024-01-01"): "c"}


class TestDurationProperties:
    """Property-style checks (SURVEY §5.3 item 4) over a value sweep in
    one DataFrame — format/parse round-trips and binning consistency."""

    def test_format_parse_roundtrip(self, spark):
        from garmin_data_pipeline_spark.functions.durations import (
            format_timedelta,
            parse_hms_to_seconds,
        )

        secs = list(range(0, 86400, 1047)) + [0, 59, 60, 3599, 3600, 86399]
        df = spark.createDataFrame([(s,) for s in secs], "s long")
        out = df.select(
            "s",
            parse_hms_to_seconds(format_timedelta(F.col("s"))).alias("rt"),
        ).collect()
        bad = [(r["s"], r["rt"]) for r in out if r["s"] != r["rt"]]
        assert not bad, bad[:5]

    def test_format_duration_roundtrip(self, spark):
        from garmin_data_pipeline_spark.functions.durations import (
            format_duration,
            parse_hms_to_seconds,
        )

        secs = [0, 1, 61, 3661, 7203, 45296, 360000 + 47]
        df = spark.createDataFrame([(s,) for s in secs], "s long")
        out = df.select(
            "s",
            parse_hms_to_seconds(format_duration(F.col("s"))).alias("rt"),
        ).collect()
        assert all(r["s"] == r["rt"] for r in out)

    def test_bin_label_id_consistency(self, spark):
        from garmin_data_pipeline_spark.functions.cleaning import (
            DISTANCE_BINS,
            bin_to_id,
            bin_to_label,
        )

        vals = [0.0, 2.99, 3.0, 4.9, 5.0, 6.99, 7.0, 9.9, 10.0, 12.9, 13.0, 30.0]
        df = spark.createDataFrame([(v,) for v in vals], "d double")
        out = df.select(
            "d",
            bin_to_label("d").alias("label"),
            bin_to_id("d").alias("bid"),
        ).collect()
        label_to_id = {lab: bid for _, _, lab, bid in DISTANCE_BINS}
        for r in out:
            assert label_to_id[r["label"]] == r["bid"], r


def test_sorted_write_enables_rowgroup_skipping(spark, sf_dir):
    import shutil

    from garmin_data_pipeline_spark.sources import sinks

    spark.sql("DROP TABLE IF EXISTS s_lineitem")
    shutil.rmtree("/tmp/spark-test-warehouse/s_lineitem", ignore_errors=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sinks.load_table(
        li, "s_lineitem", sort_within_partitions=["l_shipdate"]
    )
    t = spark.table("s_lineitem")
    assert t.count() == li.count()
    # the range predicate reaches the parquet scan as a pushed filter
    plan = (
        t.filter(F.col("l_shipdate") >= "1995-01-01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual" in plan
    spark.sql("DROP TABLE s_lineitem")


def _unpartitioned_window_specs(plan: str) -> list[str]:
    """Window specs with no PARTITION BY: in the plan string a
    windowspecdefinition lists partition attributes first (bare refs),
    then ordering attributes (suffixed ASC/DESC) — so a spec whose
    FIRST argument carries a sort direction has an empty partition
    spec, i.e. the whole input flows through one task."""
    import re

    bad = []
    for spec in re.findall(
        r"windowspecdefinition\((.*?)specifiedwindowframe", plan
    ):
        first = spec.split(",")[0]
        if " ASC" in first or " DESC" in first:
            bad.append(spec.strip().rstrip(","))
    return bad


def test_registered_plans_stay_jvm_side(spark, sf_dir):
    """Engine-wide invariants over EVERY registered plan:
    - no row-at-a-time Python eval (SURVEY §2.9) — Python appears only
      as Arrow-batched mapInPandas in the multimodal decode kernel;
    - no cartesian product outside the deliberate broadcast NLJs (v1's
      scored cross product, t9's 1-row bounds attach);
    - no UNPARTITIONED window: a global window serializes the corpus
      through one task at scale, so every Window node must carry a
      partition spec (t6 routes through the sharded packer; the t6b
      bin-offset prefix sum is computed driver-side from a #shards-row
      aggregate instead of a global window)."""
    from garmin_data_pipeline_spark import plans
    from garmin_data_pipeline_spark.plans.lint import NLJ_ALLOWLIST

    arrow_ok = {
        "m1_multimodal_metadata",
        # m4 exists precisely to exercise the decode_frames Arrow
        # boundary with a driver row (r4 verdict item 8); only sliced
        # frame bytes cross into Python, never the full payload
        "m4_frame_checksums",
        # m5/m6 are the REAL codec certifications (r11): pixel/PCM
        # decode is inherently a Python kernel — one Arrow-batched
        # mapInPandas for m5's netpbm decode, two for m6's WAV
        # encode->decode round-trip; no shuffle in either plan
        "m5_image_stats",
        "m6_audio_features",
        # m7: real mixed AVI/GIF frame decode (encode kernel +
        # decode/explode kernel; no shuffle)
        "m7_video_frame_stats",
        # s14: WARC ingest — grouped Arrow encode (applyInPandas) +
        # Arrow record explode; the HTTP split stays JVM-side
        "s14_warc_scan",
        # s15: HTML→text extraction — ONE Arrow-batched scalar
        # pandas_udf (general entity decode + raw-text-mode tag
        # handling are beyond column expressions); pinned to a single
        # evaluation in functions/html.py
        "s15_html_extract",
        # e2e_crawl: the fused crawl front-end — s14's two Arrow
        # stages + s15's one; everything downstream is JVM-side
        "e2e_crawl",
        # s18: block segmentation is one Arrow mapInPandas pass (the
        # parser is the same stdlib kernel family as s15); the
        # jusText scoring + keep policy stay JVM-side column
        # expressions
        "s18_main_content_blocks",
        # e2e_crawl_mc: e2e_crawl's Arrow stages with the s18 block
        # kernel replacing the tag-strip kernel (the checkpoint hides
        # them from the outer plan; the upstream is asserted in
        # tests/test_skew_hardening.py)
        "e2e_crawl_mc",
    }
    # per-plan justifications live with the allowlist in plans/lint.py
    # (shared with tools/explain_audit.py's footer so prose and gate
    # cannot drift)
    nlj_ok = set(NLJ_ALLOWLIST)
    # demoted pytest-tier queries stay under the same invariants —
    # demotion changes driver visibility, not engine standards
    surface = dict(plans.queries())
    surface.update({n: q.fn for n, q in plans.PYTEST_QUERIES.items()})
    for name, fn in surface.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name}: row-wise Python"
        if name not in arrow_ok:
            assert "MapInPandas" not in plan, f"{name}: unexpected Python"
            assert "ArrowEvalPython" not in plan, (
                f"{name}: unexpected Python (pandas_udf)"
            )
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        if name not in nlj_ok:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: unexpected NLJ"
            )
        bad = _unpartitioned_window_specs(plan)
        assert not bad, f"{name}: unpartitioned window(s): {bad}"


def test_serve_plans_never_move_the_index(spark, sf_dir):
    """Serving-tier invariant (r7 verdict directive 3): at serve time
    the corpus-sized index must NEVER be shuffled or sorted — the
    query-side relation (buckets / probe cells / LUTs) is the tiny
    side and must broadcast. Concretely: no SortMergeJoin in any
    `*_serve_q500` plan (an smj sorts BOTH sides — on the index that
    is a corpus sort per serve batch), and at most one Exchange (the
    final per-query top-k rank window; v4's extra probe-rank window
    over queries x cells is documented and query-side-only). The r7
    regression this pins down: v9's un-broadcast LUT join cost
    3 shuffles + 1 smj on the most expensive bench entry."""
    import re

    from garmin_data_pipeline_spark.plans.llm_queries import (
        v2_lsh_serve_q500,
        v2mp_lsh_serve_q500,
        v4_ivf_serve_q500,
        v5_int8_serve_q500,
        v8_pq_serve_q500,
        v8t_pq_serve_q500,
        v9_ivfpq_serve_q500,
        v9ps_ivfpq_product_serve_q500,
        v9r_ivfpq_rerank_serve_q500,
    )

    serves = {
        "v2_lsh_serve_q500": (v2_lsh_serve_q500, 1),
        "v2mp_lsh_serve_q500": (v2mp_lsh_serve_q500, 1),
        "v4_ivf_serve_q500": (v4_ivf_serve_q500, 2),
        "v5_int8_serve_q500": (v5_int8_serve_q500, 1),
        "v8_pq_serve_q500": (v8_pq_serve_q500, 1),
        "v8t_pq_serve_q500": (v8t_pq_serve_q500, 1),
        "v9_ivfpq_serve_q500": (v9_ivfpq_serve_q500, 1),
        "v9ps_ivfpq_product_serve_q500": (
            v9ps_ivfpq_product_serve_q500, 1,
        ),
        "v9r_ivfpq_rerank_serve_q500": (v9r_ivfpq_rerank_serve_q500, 1),
    }
    shuffle_re = (
        r"Exchange (?:hashpartitioning|rangepartitioning"
        r"|RoundRobinPartitioning|SinglePartition)"
    )
    for name, (fn, max_shuffles) in serves.items():
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan, f"{name}: smj at serve time"
        n = len(re.findall(shuffle_re, plan))
        assert n <= max_shuffles, (
            f"{name}: {n} shuffles at serve time (max {max_shuffles})"
        )


def test_decimal_cast_lint_detects_the_w9_antipattern(spark):
    """Positive-detection check for the float-discipline lint: the
    exact shape that produced the r8 w9 driver hash miss (computed
    double product cast to DECIMAL) must be flagged, and each
    sanctioned form (bare column, round() root, exact-widening cast
    of a raw non-double column, decimal-exact arithmetic) must not.
    Guards the lint itself — a detector that silently stops firing
    would let the failure class back in unnoticed."""
    from garmin_data_pipeline_spark.plans.lint import (
        unsafe_decimal_casts,
    )

    df = spark.createDataFrame(
        [(1.5, 3, 2.25)], "v double, d long, f double"
    )
    bad = df.select(
        F.sum(
            (F.col("v") * F.col("d").cast("double")).cast(
                "decimal(38,6)"
            )
        ).alias("s")
    )
    hits = unsafe_decimal_casts(bad)
    assert hits and "decimal(38,6)" in hits[0], hits
    # double + double arithmetic without any inner cast leaks too
    bad2 = df.select((F.col("v") + F.col("f")).cast("decimal(18,6)").alias("x"))
    assert unsafe_decimal_casts(bad2), "sum-of-doubles cast missed"
    # ADVICE r9: the same antipattern split across plan nodes — the
    # cast's direct child is an AttributeReference, but the attribute
    # CARRIES a computed double from a prior projection / aggregate
    # (the codebase's common multi-stage style). Both shapes verified
    # to return [] under the analyzed-plan-only lint.
    bad3 = df.select((F.col("v") * F.col("f")).alias("x")).select(
        F.col("x").cast("decimal(18,6)").alias("y")
    )
    assert unsafe_decimal_casts(bad3), "staged projection cast missed"
    bad4 = df.agg(F.sum("v").alias("s")).select(
        F.col("s").cast("decimal(38,6)").alias("y")
    )
    assert unsafe_decimal_casts(bad4), "staged aggregate cast missed"
    # ADVICE r10: double-PRODUCING aggregates over EXACT inputs —
    # avg(int) has dataType double while its child is a long, so a
    # leaves-only source rule never fired. Both the direct and the
    # staged shape must be flagged.
    bad5 = df.select(F.avg("d").cast("decimal(18,6)").alias("y"))
    assert unsafe_decimal_casts(bad5), "avg(int) direct cast missed"
    bad6 = df.agg(F.avg("d").alias("m")).select(
        F.col("m").cast("decimal(18,6)").alias("y")
    )
    assert unsafe_decimal_casts(bad6), "avg(int) staged cast missed"
    # int/int division is double-typed too
    bad7 = df.select(
        (F.col("d") / (F.col("d") + 1)).cast("decimal(18,6)").alias("y")
    )
    assert unsafe_decimal_casts(bad7), "int/int divide cast missed"
    # ...and the staged SANCTIONED forms must stay clean: an attribute
    # carrying round() output or a DECIMAL-exact accumulator is not
    # tainted, nor is a pass-through alias of a raw double column.
    ok2 = df.select(
        F.round(F.col("v") * 2, 6).alias("r"),
        F.col("v").alias("passthru"),
    ).select(
        F.col("r").cast("decimal(18,6)").alias("a"),
        F.col("passthru").cast("decimal(12,2)").alias("b"),
    )
    assert unsafe_decimal_casts(ok2) == []
    ok3 = df.agg(
        F.sum(F.col("v").cast("decimal(18,6)")).alias("s")
    ).select(F.col("s").cast("decimal(38,6)").alias("y"))
    assert unsafe_decimal_casts(ok3) == []
    # r11: floor()/ceil() of a double are UNAMBIGUOUS integral values
    # (no rounding mode), so a downstream DECIMAL cast of the result
    # — including across a staged projection (t24's
    # floor(sqrt(c)*1e6) -> DECIMAL(38,0) rate arithmetic) — is
    # sanctioned, while the same shape WITHOUT the floor still fires.
    ok4 = df.select(
        F.floor(F.sqrt("d") * 1_000_000).alias("s_int")
    ).select(F.col("s_int").cast("decimal(38,0)").alias("y"))
    assert unsafe_decimal_casts(ok4) == []
    bad8 = df.select(
        (F.sqrt("d") * 1_000_000).alias("s_dbl")
    ).select(F.col("s_dbl").cast("decimal(38,0)").alias("y"))
    assert unsafe_decimal_casts(bad8), "unfloored sqrt cast missed"
    # sanctioned forms stay clean
    ok = df.select(
        F.col("v").cast("decimal(12,2)").alias("a"),
        F.round(F.col("v") * 2, 6).cast("decimal(18,6)").alias("b"),
        F.col("d").cast("double").cast("decimal(18,6)").alias("c"),
        (F.col("v").cast("decimal(12,2)") * F.col("d"))
        .cast("decimal(38,2)")
        .alias("e"),
    )
    assert unsafe_decimal_casts(ok) == []


def test_no_computed_double_to_decimal_cast(spark, sf_dir):
    """Float-discipline lint (r8 verdict directive 1): no registered
    plan may cast a COMPUTED double expression to DECIMAL. The
    conversion is a decimal rounding whose mode is engine-dependent
    (Spark HALF_UP, DuckDB HALF_EVEN), so a product/sum landing on an
    exact round-half tie hashes differently across engines — AND
    whether a tie is reachable depends on magnitude, so the failure
    is host/data dependent: w9's cents x micros products passed
    strict local equality for a full round while the driver
    disagreed. Raw grid-data columns, exact widenings, and round(x,n)
    roots are sanctioned; everything else must stay in exact
    integer/DECIMAL arithmetic end to end (the w9_time_weighted_avg
    fix pattern). DECIMAL_CAST_ALLOWLIST carries the queries whose
    casts are PROVABLY tie-free by magnitude bound — each entry
    documents the bound."""
    from garmin_data_pipeline_spark import plans
    from garmin_data_pipeline_spark.plans.lint import (
        DECIMAL_CAST_ALLOWLIST,
        unsafe_decimal_casts,
    )

    surface = dict(plans.queries())
    surface.update({n: q.fn for n, q in plans.PYTEST_QUERIES.items()})
    offenders = []
    for name, fn in surface.items():
        if name in DECIMAL_CAST_ALLOWLIST:
            continue
        hits = unsafe_decimal_casts(fn(spark, sf_dir))
        if hits:
            offenders.append(f"{name}: {hits}")
    assert not offenders, (
        "computed-double->DECIMAL casts (engine-dependent rounding "
        "mode; see plans/lint.py): " + "; ".join(offenders)
    )


def test_registered_outputs_are_driver_hashable(spark, sf_dir):
    """No Array/Map/Struct column in ANY driver-registered query's
    output schema. The driver's canonicalizer (pandas sort_values
    over every column before value-hashing) raises `unhashable type:
    'list'` on complex-typed cells — the r7 `v8_pq_codes` err, which
    tools/check.py's tuple-normalizing compare silently tolerated for
    two rounds. Registered outputs must pack (pack_pq_code) or
    explode (v5's posexplode) complex values to scalars; internal
    operator surfaces may keep arrays. Applies to rows-only entries
    too (same driver ingestion path), and to the pytest tier for
    uniformity — its DuckDB comparisons share the pandas path."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from garmin_data_pipeline_spark import plans

    surface = dict(plans.queries())
    surface.update({n: q.fn for n, q in plans.PYTEST_QUERIES.items()})
    offenders = []
    for name, fn in surface.items():
        for f in fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType}")
    assert not offenders, (
        "driver-unhashable complex-typed output columns: "
        + "; ".join(offenders)
    )


class TestSemanticDedup:
    """SemDeDup-style semantic dedup: survivors/losers partition the
    corpus; no surviving same-cell pair is over-threshold; the min-id
    member of every cell always survives."""

    TAU = 0.3

    def _parts(self, spark, sf_dir):
        from garmin_data_pipeline_spark.operators.similarity import (
            assign_cells_fixed,
            grid_centroids,
            semantic_dedup,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        grid = grid_centroids(8, 64)
        survivors = semantic_dedup(emb, grid, threshold=self.TAU)
        assigned = assign_cells_fixed(emb, grid)
        return emb, survivors, assigned

    def test_partition_and_representatives(self, spark, sf_dir):
        emb, survivors, assigned = self._parts(spark, sf_dir)
        n_total = emb.count()
        n_surv = survivors.count()
        assert 0 < n_surv <= n_total
        # every cell's min-id member has no smaller-id mate -> survives
        min_ids = assigned.groupBy("cell").agg(
            F.min("vec_id").alias("vec_id")
        )
        missing = min_ids.join(
            survivors.select("vec_id"), "vec_id", "left_anti"
        )
        assert missing.count() == 0

    def test_no_overthreshold_surviving_pair(self, spark, sf_dir):
        from garmin_data_pipeline_spark.operators.similarity import cosine

        emb, survivors, assigned = self._parts(spark, sf_dir)
        sv = assigned.join(survivors.select("vec_id"), "vec_id")
        a = sv.select(
            F.col("vec_id").alias("ia"), F.col("v").alias("va"), "cell"
        )
        b = sv.select(
            F.col("vec_id").alias("ib"), F.col("v").alias("vb"), "cell"
        )
        bad = (
            a.join(b, "cell")
            .filter(F.col("ia") < F.col("ib"))
            .filter(cosine(F.col("va"), F.col("vb")) >= self.TAU)
        )
        assert bad.count() == 0


def test_b1_bucketed_join_query_plan(spark, sf_dir):
    """The registered b1 query's join stage must be exchange-free AND
    sort-free: write_bucketed_table lays out one file per bucket and
    the query enables bucketed-scan output ordering, so the merge
    join zips pre-sorted co-located buckets. The single exchange in
    the plan belongs to the downstream groupBy."""
    import glob
    import shutil

    from garmin_data_pipeline_spark import plans

    for d in glob.glob("/tmp/spark-bucketed-*"):
        shutil.rmtree(d, ignore_errors=True)
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    for t in (f"b1_lineitem_{tag}", f"b1_orders_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    df = plans.QUERIES["b1_bucketed_join_agg"].fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort [") == 0, plan
    # one file per bucket is what makes the sort-free scan legal
    files = glob.glob(f"/tmp/spark-bucketed-{tag}/lineitem/*.parquet")
    assert len(files) == 8, files


class TestMergeRollups:
    def test_merge_equals_full_rollup(self, spark, sf_dir):
        from garmin_data_pipeline_spark.operators.skew import merge_rollups

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

        def rollup(df):
            return df.groupBy("l_returnflag").agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.count(F.lit(1)).alias("n"),
                F.min("l_shipdate").alias("first_ship"),
                F.max("l_shipdate").alias("last_ship"),
            )

        parts = [
            li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)
        ]
        merged = merge_rollups(
            [rollup(p) for p in parts],
            keys=["l_returnflag"],
            aggs={
                "sum_qty": "sum",
                "n": "count",
                "first_ship": "min",
                "last_ship": "max",
            },
        )
        want = {tuple(r) for r in rollup(li).collect()}
        got = {tuple(r) for r in merged.collect()}
        # float sums: compare keyed with tolerance
        w = {r[0]: r for r in want}
        g = {r[0]: r for r in got}
        assert set(w) == set(g)
        for k in w:
            assert abs(w[k][1] - g[k][1]) < 1e-6
            assert w[k][2:] == g[k][2:]

    def test_disjoint_and_overlapping_keys(self, spark):
        from garmin_data_pipeline_spark.operators.skew import merge_rollups

        a = spark.createDataFrame([("x", 1, 1), ("y", 2, 1)], ["k", "s", "n"])
        b = spark.createDataFrame([("y", 5, 2), ("z", 7, 3)], ["k", "s", "n"])
        got = {
            r["k"]: (r["s"], r["n"])
            for r in merge_rollups(
                [a, b], keys=["k"], aggs={"s": "sum", "n": "count"}
            ).collect()
        }
        assert got == {"x": (1, 1), "y": (7, 3), "z": (7, 3)}


class TestRuntimeFilters:
    """Catalyst's two runtime scan-pruning mechanisms, pinned working
    under this engine's session defaults. Both are free at 100 TB
    precisely when they matter; at test scale each needs one size
    threshold lowered (documented inline), so these tests prove the
    PLAN WIRING — that our session/readers leave Catalyst able to
    inject them — and check results against the unpruned join."""

    def test_runtime_bloom_filter_prunes_probe_side(self, spark, sf_dir):
        """A selective filter on orders should inject a bloom
        `might_contain` pre-filter into the lineitem scan of a
        shuffle join (Spark's runtime row-level filtering, on by
        default since 3.4). At test scale only
        `applicationSideScanSizeThreshold` (default 10GB — met
        trivially by any 100 TB fact scan) blocks it; lower it and
        the filter appears with NO other engine change."""
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        confs = {
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        prev = {k: spark.conf.get(k) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            j = li.join(orders, li.l_orderkey == orders.o_orderkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "might_contain" in plan, plan[:2000]
            pruned = j.count()
        finally:
            for k, v in prev.items():
                spark.conf.set(k, v)
        want = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
        assert pruned == want

    def test_dynamic_partition_pruning_on_partitioned_fact(
        self, spark, sf_dir, tmp_path
    ):
        """A day-partitioned fact table joined to a dim filtered on a
        NON-partition column gets a `dynamicpruning` subquery in its
        scan's PartitionFilters — the runtime analogue of static
        partition pruning, and the reason `sinks.load_table` exposes
        partitionBy: at 100 TB the fact scan reads only the days the
        dim selects, decided at run time."""
        fact_path = str(tmp_path / "events_by_day")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev.withColumn("day", F.to_date("ts")).write.partitionBy(
            "day"
        ).mode("overwrite").parquet(fact_path)
        fact = spark.read.parquet(fact_path)
        dim = (
            fact.select("day")
            .distinct()
            .filter(F.dayofmonth("day") <= 3)
        )
        j = fact.join(dim, "day")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # correctness: equals the statically-filtered scan
        want = fact.filter(F.dayofmonth("day") <= 3).count()
        assert j.count() == want
