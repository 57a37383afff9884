"""Skew hardening for the window/dedup family (SURVEY.md §4 scale
notes; VERDICT r3 task 6).

Fixture: a key distribution where ONE key holds 50% of all rows — the
reference analog is the `calendarDate` hot key after the master join
(MERGE cell 18). The row_number/window forms of A3/A4/W1 ship every row
of a group to one task, so a 50% key means one task processes half the
table and AQE cannot split it (skew handling covers joins, not window
partitions). These tests pin:

1. The skew-safe forms (`latest_per_group_agg`, `cumulative_sum_sharded`)
   produce byte-identical results to the window forms on the skewed
   fixture.
2. The physical plans have the shape that bounds per-task load:
   a PARTIAL aggregation phase before the shuffle (hot key collapses
   map-side) for A3/A4; windows partitioned on (key, bucket) for W1.
3. The data-level balance contract: after sharding, the largest window
   group is <= 2x the median group, where the unsharded grouping has a
   50%-of-table group.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators import dedupe, windows


N_ROWS = 40_000
N_COLD_KEYS = 100


@pytest.fixture(scope="module")
def skewed(spark):
    """seq, key, ts, v: key 'HOT' owns 50% of rows, the rest spread
    uniformly over N_COLD_KEYS cold keys. Fully generated on executors
    (spark.range), no driver data."""
    df = (
        spark.range(N_ROWS)
        .withColumn(
            "key",
            F.when(F.col("id") % 2 == 0, F.lit("HOT")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % N_COLD_KEYS).cast("string"))
            ),
        )
        .withColumn("ts", F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        .withColumn("v", (F.col("id") % 97).cast("double"))
        .withColumnRenamed("id", "seq")
    )
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


class TestSkewSafeLatestPerGroup:
    def test_matches_window_form(self, skewed):
        want = dedupe.dedupe_latest(
            skewed, "key", "ts", tiebreakers=["seq"]
        ).collect()
        got = dedupe.latest_per_group_agg(
            skewed, "key", "ts", tiebreakers=["seq"]
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        # sanity: the fixture is actually skewed — HOT holds half
        assert (
            skewed.filter(F.col("key") == "HOT").count() == N_ROWS // 2
        )

    def test_plan_has_partial_aggregate(self, skewed):
        """Map-side combine is the skew defence: each input partition
        emits ONE candidate row for HOT, so the HOT reducer receives
        #map-tasks rows, not N/2."""
        plan = (
            dedupe.latest_per_group_agg(skewed, "key", "ts", ["seq"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "partial_max_by" in plan or "partial_maxby" in plan.lower()

    def test_column_order_and_schema_parity(self, skewed):
        want = dedupe.dedupe_latest(skewed, "key", "ts", ["seq"])
        got = dedupe.latest_per_group_agg(skewed, "key", "ts", ["seq"])
        assert got.columns == want.columns
        # nullability differs by construction (fields re-extracted from
        # the max_by struct are nullable); names and types must match
        assert [(f.name, f.dataType) for f in got.schema] == [
            (f.name, f.dataType) for f in want.schema
        ]


class TestSkewSafeCumsum:
    # enough buckets that the hot key's groups outnumber tasks — with
    # buckets ~= tasks, hash collisions re-lump 2-3 hot groups onto one
    # task; at 2x tasks the per-task hot share concentrates toward the
    # mean (same rule at cluster scale: n_buckets >= 2x shuffle
    # parallelism for the hottest key)
    BUCKETS = 64

    def _bucket(self):
        # monotone in the (seq) ordering within every key
        return F.floor(F.col("seq") / (N_ROWS // self.BUCKETS))

    def test_matches_window_form(self, skewed):
        want = windows.cumulative_sum(
            skewed, "v", ["key"], ["seq"], "cum"
        ).collect()
        got = windows.cumulative_sum_sharded(
            skewed, "v", ["key"], ["seq"], self._bucket(), "cum"
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_null_key_and_bucket_rows_survive(self, spark):
        df = spark.createDataFrame(
            [(None, 1, 1.0), (None, 2, 2.0), ("a", None, 3.0), ("a", 4, 4.0)],
            "key string, seq int, v double",
        )
        got = {
            (r["key"], r["seq"]): r["cum"]
            for r in windows.cumulative_sum_sharded(
                df, "v", ["key"], ["seq"], F.col("seq"), "cum"
            ).collect()
        }
        want = {
            (r["key"], r["seq"]): r["cum"]
            for r in windows.cumulative_sum(
                df, "v", ["key"], ["seq"], "cum"
            ).collect()
        }
        assert got == want

    def test_task_balance_bound(self, skewed):
        """The verdict contract: no task processes > 2x the median
        task's rows. WindowExec's task load = sum of the window groups
        that hash onto it, so we model the shuffle exactly as Spark
        does (murmur3 hash of the partition expressions mod
        #shuffle-partitions) and measure rows per task.

        Unsharded (partition on the raw key): the task that owns HOT
        carries >= half the table — provably > 2x median. Sharded
        (partition on key + bucket): every task must land within 2x
        the median."""
        n_tasks = 32

        def rows_per_task(*cols):
            return [
                r["n"]
                for r in (
                    skewed.withColumn("__bucket", self._bucket())
                    .groupBy(F.pmod(F.hash(*cols), F.lit(n_tasks)).alias("t"))
                    .agg(F.count("*").alias("n"))
                    .collect()
                )
            ]

        def ratio(loads):
            loads = sorted(loads)
            return loads[-1] / loads[len(loads) // 2]

        unsharded = rows_per_task("key")
        assert max(unsharded) >= N_ROWS // 2  # the problem, demonstrated
        assert ratio(unsharded) > 2

        sharded = rows_per_task("key", "__bucket")
        assert ratio(sharded) <= 2, (
            f"max task {max(sharded)} > 2x median; loads={sorted(sharded)}"
        )
        # and the hot key's largest single group shrank ~BUCKETS x
        max_group = (
            skewed.withColumn("__bucket", self._bucket())
            .groupBy("key", "__bucket")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert max_group <= (N_ROWS // 2) / (self.BUCKETS / 2)

    def test_all_windows_partitioned_by_key_and_bucket(self, skewed):
        plan = (
            windows.cumulative_sum_sharded(
                skewed, "v", ["key"], ["seq"], self._bucket(), "cum"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every Window node must carry a 2-part partition spec; no
        # window partitioned on the raw hot key alone
        for line in plan.splitlines():
            if "Window " in line and "windowspecdefinition" in line:
                assert "key" in line and "__bucket" in line


def test_cumulative_sum_sharded_null_value_runs(spark):
    """NULL VALUES (not just NULL keys/buckets) must match the window
    form: a bucket whose leading rows are NULL has a NULL local cumsum,
    but the direct cumsum there is the prior bucket's total — NULL may
    survive only while no non-NULL value has appeared for the key at
    all (review finding, reproduced before the fix)."""
    from garmin_data_pipeline_spark.operators import windows

    df = spark.createDataFrame(
        [
            # key 'k': non-null in bucket 1, then bucket 2 LEADS with
            # NULL -> direct cum = [5.0, 5.0, 8.0]
            ("k", 1, 1, 5.0),
            ("k", 2, 2, None),
            ("k", 3, 2, 3.0),
            # key 'z': all-NULL first bucket, value later -> direct
            # cum = [None, None, 7.0]
            ("z", 1, 1, None),
            ("z", 2, 1, None),
            ("z", 3, 2, 7.0),
            # key 'w': never any value -> all NULL
            ("w", 1, 1, None),
            ("w", 2, 2, None),
        ],
        "key string, seq int, bkt int, v double",
    )
    want = {
        (r["key"], r["seq"]): r["cum"]
        for r in windows.cumulative_sum(
            df, "v", ["key"], ["seq"], "cum"
        ).collect()
    }
    got = {
        (r["key"], r["seq"]): r["cum"]
        for r in windows.cumulative_sum_sharded(
            df, "v", ["key"], ["seq"], F.col("bkt"), "cum"
        ).collect()
    }
    assert got == want
    assert want[("k", 2)] == 5.0 and got[("w", 2)] is None


class TestSaltedJoin:
    """salted_join must be row-identical to the plain join while
    spreading each key over `buckets` reducers."""

    def test_matches_plain_join(self, spark):
        from garmin_data_pipeline_spark.operators import salted_join

        big = spark.range(0, 2000).select(
            F.col("id").alias("row_id"),
            (F.col("id") % 5).alias("k"),
            (F.col("id") * 2).alias("val"),
        )
        # hot key: half the rows land on k=0
        big = big.withColumn(
            "k", F.when(F.col("row_id") < 1000, F.lit(0)).otherwise(F.col("k"))
        )
        small = spark.range(0, 5).select(
            F.col("id").alias("k"), F.concat(F.lit("g"), F.col("id")).alias("grp")
        )
        got = salted_join(big, small, key="k", salt_col="row_id", buckets=8)
        want = big.join(small, "k")
        assert got.count() == want.count() == 2000
        assert (
            got.exceptAll(want.select(got.columns)).count() == 0
            and want.select(got.columns).exceptAll(got).count() == 0
        )

    def test_left_join_keeps_unmatched(self, spark):
        from garmin_data_pipeline_spark.operators import salted_join

        big = spark.range(0, 100).select(
            F.col("id").alias("row_id"), (F.col("id") % 10).alias("k")
        )
        small = spark.range(0, 3).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        got = salted_join(
            big, small, key="k", salt_col="row_id", how="left"
        )
        assert got.count() == 100
        assert got.filter(F.col("tag").isNull()).count() == 70

    def test_plan_joins_on_salted_key(self, spark):
        from garmin_data_pipeline_spark.operators import salted_join

        big = spark.range(0, 100).select(
            F.col("id").alias("row_id"), (F.col("id") % 10).alias("k")
        )
        small = spark.range(0, 3).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        out = salted_join(big, small, key="k", salt_col="row_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # merge hint pins sort-merge; both join keys present means the
        # exchange hashes on (k, __salt) — the skew spread.
        assert "SortMergeJoin" in plan, plan
        assert "__salt" in plan, plan

    def test_rejects_unsupported_how(self, spark):
        import pytest

        from garmin_data_pipeline_spark.operators import salted_join

        df = spark.range(2)
        with pytest.raises(ValueError):
            salted_join(df, df, key="id", salt_col="id", how="outer")


class TestAqeSkewJoin:
    def test_aqe_splits_skewed_partition(self, spark):
        """Plan-level evidence for the runtime half of the skew story:
        salting (salted_agg/salted_join) is the WRITE-SIDE fix, AQE's
        OptimizeSkewedJoin is the runtime one — a hot join key's
        oversized partition is split into parallel sub-partitions
        after the shuffle stage materializes real sizes. Thresholds
        are lowered so the fixture-sized hot key trips detection; the
        finalized adaptive plan must carry the skew=true marker."""
        keys = [
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
        saved = {k: spark.conf.get(k, None) for k in keys}
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "100KB",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB"
            )
            # force a sort-merge join: broadcast would hide the skew
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

            left = spark.range(0, 120_000).select(
                F.when(F.col("id") < 100_000, F.lit(0))
                .otherwise(F.col("id"))
                .alias("key"),
                F.concat(F.lit("x" * 96), F.col("id").cast("string")).alias(
                    "payload"
                ),
            )
            right = spark.range(0, 500).select(
                F.col("id").alias("key"),
                F.col("id").cast("string").alias("dim"),
            )
            joined = left.join(right, "key")
            # left's non-hot keys are 100000+, right's are 0..499 —
            # only the hot key matches. collect() (not count()) so
            # THIS DataFrame's own adaptive plan is the one finalized.
            assert len(joined.collect()) == 100_000
            plan = (
                joined._jdf.queryExecution().executedPlan().toString()
            )
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan[:2000]
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestTwoPhaseDomainCap:
    """r12 verdict directive 1a: domain_cap's single-window form
    shipped every row of the hot domain to ONE task (the cap bounds
    the output, not the sort input). The two-phase form pre-caps per
    (domain, salt-bucket) and exactly re-ranks the <= buckets*k
    survivors — same contract family as cumulative_sum_sharded."""

    K = 25
    BUCKETS = 16

    def test_matches_single_window_on_50pct_hot_key(self, skewed):
        from garmin_data_pipeline_spark.operators.urls import (
            domain_cap,
            domain_rank,
        )

        naive = {
            (r["seq"], r["domain_rank"])
            for r in skewed.withColumn(
                "domain_rank",
                domain_rank("seq", "key").cast("bigint"),
            )
            .filter(F.col("domain_rank") <= self.K)
            .collect()
        }
        got = {
            (r["seq"], r["domain_rank"])
            for r in domain_cap(
                skewed, "seq", "key", self.K, buckets=self.BUCKETS
            ).collect()
        }
        assert got == naive
        # the cap binds: every key (each holds > K rows) emits
        # exactly K — the hot one included, down from its 20k
        n_keys = skewed.select("key").distinct().count()
        assert len(got) == self.K * n_keys

    def test_phase1_divides_the_hot_partition(self, skewed):
        """Data-level balance contract: the phase-1 window keys
        (domain, bucket) split the 50%-of-table hot domain into
        ~equal bucket slices — largest slice <= 2x the hot domain's
        mean slice, where the unsharded partitioning has a 20k-row
        group."""
        from garmin_data_pipeline_spark.operators.urls import (
            _rank_hash,
        )

        h = _rank_hash("seq", "s16-v1")
        b = F.pmod(
            F.conv(F.substring(h, 25, 8), 16, 10).cast("long"),
            F.lit(self.BUCKETS),
        )
        sizes = [
            r["n"]
            for r in skewed.filter(F.col("key") == "HOT")
            .groupBy(b.alias("b"))
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        hot_total = sum(sizes)
        assert hot_total == N_ROWS // 2
        assert len(sizes) == self.BUCKETS
        assert max(sizes) <= 2 * (hot_total / self.BUCKETS)

    def test_plan_prewindow_keys_include_bucket(self, skewed):
        from garmin_data_pipeline_spark.operators.urls import (
            domain_cap,
        )

        plan = (
            domain_cap(skewed, "seq", "key", self.K)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # phase 1 partitions by (key, __b); only the bounded re-rank
        # partitions by key alone
        assert "windowspecdefinition(key" in plan
        assert "__b" in plan


class TestCrawlDedupAnnotationShape:
    """r12 verdict directive 1b: e2e_crawl's dedup annotation must be
    the partial-aggregating groupBy + join-back, never a per-hash
    window (a viral page's hash would sort whole on one task with no
    partial combine)."""

    def test_e2e_plan_has_no_text_hash_window(self, spark, sf_dir):
        from garmin_data_pipeline_spark.plans.llm_queries import (
            e2e_crawl,
        )

        plan = (
            e2e_crawl(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "windowspecdefinition(text_hash" not in plan
        # the aggregate/join shape: a hash aggregate keyed by
        # text_hash with a partial phase before its Exchange
        assert "HashAggregate" in plan
        assert "partial_count" in plan or "partial" in plan.lower()

    def test_e2e_upstream_single_extraction_and_url_window(
        self, spark, sf_dir
    ):
        """The lazy checkpoint hides the upstream from the outer
        EXPLAIN, so the pre-checkpoint relation carries the two
        upstream shape pins: the extraction kernel appears EXACTLY
        once (the .asNondeterministic() single-eval guarantee — the
        r12 regression was Catalyst cloning it into filters), and the
        URL-dedup window is keyed by canonical_url (partitioned,
        never global)."""
        from garmin_data_pipeline_spark.plans.llm_queries import (
            _e2e_crawl_kept,
        )

        plan = (
            _e2e_crawl_kept(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("ArrowEvalPython") == 1, plan.count(
            "ArrowEvalPython"
        )
        assert "windowspecdefinition(canonical_url" in plan

    def test_e2e_mc_upstream_single_block_kernel(self, spark, sf_dir):
        """The main-content variant: exactly ONE block-segmentation
        kernel (plus the two WARC fixture Arrow stages), the
        partitioned URL window, and no per-hash window — same pins
        as e2e_crawl with the block kernel in the extraction seat."""
        from garmin_data_pipeline_spark.plans.llm_queries import (
            _e2e_crawl_mc_kept,
            e2e_crawl_mc,
        )

        up = (
            _e2e_crawl_mc_kept(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # MapInPandas x3: the WARC archive PACK (r14 — partition-
        # local, replacing the groupBy/applyInPandas shuffle), the
        # record explode, and the block kernel — still exactly ONE
        # block-segmentation pass
        assert up.count("MapInPandas") == 3, up.count("MapInPandas")
        # the pack stage must NOT reintroduce the archive shuffle
        assert "FlatMapGroupsInPandas" not in up
        assert "ArrowEvalPython" not in up  # no tag-strip kernel here
        assert "windowspecdefinition(canonical_url" in up
        outer = (
            e2e_crawl_mc(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "windowspecdefinition(text_hash" not in outer
        assert "HashAggregate" in outer

    def test_groupby_joinback_matches_window_on_hot_hash(self, spark):
        """Semantics pin on a 50%-hot-hash relation: the skew-safe
        shape is row-identical to the window form it replaced."""
        from pyspark.sql.window import Window

        kept = spark.range(40_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit("viral"))
            .otherwise(F.concat(F.lit("h"), (F.col("id") % 999).cast("string")))
            .alias("text_hash"),
        )
        w = Window.partitionBy("text_hash")
        want = {
            tuple(r)
            for r in kept.select(
                "doc_id",
                "text_hash",
                F.min("doc_id").over(w).alias("canonical_id"),
                F.count(F.lit(1)).over(w).alias("n_dups"),
            ).collect()
        }
        groups = kept.groupBy("text_hash").agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        got = {
            tuple(r)
            for r in kept.join(groups, "text_hash")
            .select("doc_id", "text_hash", "canonical_id", "n_dups")
            .collect()
        }
        assert got == want
