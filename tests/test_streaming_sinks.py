"""Tests: catalog sinks (S8-S12), GPX source (S6), Structured
Streaming ingest + stateful sessionization (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.sources import sinks
from garmin_data_pipeline_spark.sources.gpx import read_gpx_points
from garmin_data_pipeline_spark.streaming import (
    daily_event_summary,
    sessionize,
    start_daily_summary_stream,
)

# ---------------------------------------------------------------------------
# Sinks / catalog
# ---------------------------------------------------------------------------


class TestSinks:
    def test_load_verify_roundtrip(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/nation.parquet")
        sinks.load_table(df, "t_nation")
        assert sinks.table_exists(spark, "t_nation")
        assert sinks.verify_row_count(spark, "t_nation") == df.count()
        # truncate-and-reload: second overwrite does not append
        sinks.load_table(df, "t_nation", mode="overwrite")
        assert sinks.verify_row_count(spark, "t_nation") == df.count()
        sinks.load_table(df, "t_nation", mode="append")
        assert sinks.verify_row_count(spark, "t_nation") == 2 * df.count()
        spark.sql("DROP TABLE t_nation")

    def test_verify_missing_table_raises(self, spark):
        with pytest.raises(ValueError):
            sinks.verify_row_count(spark, "no_such_table")

    def test_drop_view(self, spark, sf_dir):
        spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView(
            "v_region"
        )
        sinks.drop_view(spark, "v_region")
        assert "v_region" not in [v.name for v in spark.catalog.listTables()]

    def test_write_csv_single_file(self, spark, sf_dir, tmp_path):
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
        out = tmp_path / "region_csv"
        sinks.write_csv(df, str(out), single_file=True)
        parts = list(out.glob("part-*.csv"))
        assert len(parts) == 1
        back = spark.read.option("header", "true").csv(str(out))
        assert back.count() == df.count()

    def test_master_table_partition_pruned_readback(self, spark, sf_dir):
        """SURVEY §4: Year partitioning replaces the reference's
        B-tree indexes (create_summarized_activities_table.sql:93-96).
        Writing the fused master table partitioned by year and filtering
        the read-back on year must turn the predicate into a
        PartitionFilters entry — a pruned DIRECTORY scan (only that
        year's files are listed/read), not a post-scan data filter.
        This is what makes a date-ranged query on a 100 TB warehouse
        table read 1/N of the data."""
        from garmin_data_pipeline_spark.plans.queries import (
            e2e_master_daily,
        )

        master = e2e_master_daily(spark, sf_dir).withColumn(
            "year", F.year("day")
        )
        sinks.load_table(
            master, "t_master_daily", partition_by=["year"]
        )
        t = spark.table("t_master_daily")
        filtered = t.filter(F.col("year") == 1998)
        plan = (
            filtered._jdf.queryExecution().executedPlan().toString()
        )
        import re

        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and "1998" in pf.group(1), plan[:2000]
        # the year predicate is satisfied by pruning alone — it must
        # NOT reappear as a pushed data filter on the parquet reader
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert pushed is None or "1998" not in pushed.group(1)
        # pruning is also semantically right
        expected = master.filter(F.col("year") == 1998).count()
        assert filtered.count() == expected > 0
        spark.sql("DROP TABLE t_master_daily")

    def test_activities_ddl(self, spark):
        sinks.create_summarized_activities_table(spark)
        assert sinks.table_exists(spark, "garmin.summarized_activities")
        cols = [
            f.name for f in spark.table("garmin.summarized_activities").schema
        ]
        assert "activity_id" in cols and "start_date" in cols
        assert len(cols) == 48  # 45 business + 2 audit + partition date
        spark.sql("DROP TABLE garmin.summarized_activities")


# ---------------------------------------------------------------------------
# GPX source
# ---------------------------------------------------------------------------

GPX_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="test">
 <trk><name>Morning Run</name><trkseg>
  <trkpt lat="35.2271" lon="-80.8431"><ele>230.1</ele><time>2024-08-13T11:00:00Z</time></trkpt>
  <trkpt lat="35.2275" lon="-80.8440"><ele>231.0</ele><time>2024-08-13T11:00:05Z</time></trkpt>
 </trkseg></trk>
</gpx>
"""

GPX_DOC2 = """<gpx><trk><trkseg>
<trkpt lat="40.0" lon="-75.0"><time>2024-08-14T09:30:00Z</time></trkpt>
</trkseg></trk></gpx>
"""


class TestGpx:
    """S6/F31 over synthetic GPX documents.

    Differential-against-real-file finding (VERDICT r3 task 8): the
    reference repository ships NO ``.gpx`` payload anywhere (verified:
    ``find /root/reference -iname '*.gpx'`` is empty — GPX cell 1 reads
    from a user-local folder outside the repo), and ``gpxpy`` is not
    installed in this container, so no gpxpy-vs-ours differential is
    possible. The synthetic documents below follow the GPX 1.1 schema
    (trk > trkseg > trkpt lat/lon/time) that gpx.py parses, which is
    what GPX cell 1's gpxpy walk consumes.
    """

    def test_read_points(self, spark, tmp_path):
        (tmp_path / "a.gpx").write_text(GPX_DOC)
        (tmp_path / "b.gpx").write_text(GPX_DOC2)
        (tmp_path / "ignore.txt").write_text("not gpx")
        pts = read_gpx_points(spark, str(tmp_path)).orderBy("Time").collect()
        assert len(pts) == 3
        assert pts[0]["Latitude"] == pytest.approx(35.2271)
        assert pts[0]["Longitude"] == pytest.approx(-80.8431)
        assert str(pts[0]["Date"]) == "2024-08-13"
        assert str(pts[2]["Date"]) == "2024-08-14"


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------


class TestStreaming:
    def test_daily_summary_stream_matches_batch(
        self, spark, sf_dir, tmp_path
    ):
        from garmin_data_pipeline_spark.plans.registry import table

        # Land clean parquet shards: the driver's events.parquet uses
        # TIMESTAMP(NANOS), which the declared streaming schema (micros)
        # cannot read directly; registry.table() normalizes it.
        src = tmp_path / "events_in"
        table(spark, sf_dir, "events").write.parquet(str(src))
        q = start_daily_summary_stream(
            spark,
            str(src),
            checkpoint=str(tmp_path / "ckpt"),
            sink_table="events_daily_test",
        )
        q.awaitTermination(120)
        got = spark.table("events_daily_test")
        batch = daily_event_summary(table(spark, sf_dir, "events"))
        # Append mode emits only watermark-finalized windows: the
        # streamed result is a prefix of the batch result.
        assert 0 < got.count() <= batch.count()
        j = got.alias("s").join(
            batch.alias("b"), ["calendarDate", "event_type"]
        )
        assert j.count() == got.count()
        mism = j.filter(
            (F.col("s.event_count") != F.col("b.event_count"))
            | (
                F.abs(F.col("s.total_value") - F.col("b.total_value"))
                > 1e-6
            )
        )
        assert mism.count() == 0

    def test_sessionize_batch(self, spark, sf_dir):
        from garmin_data_pipeline_spark.plans.registry import table

        events = table(spark, sf_dir, "events")
        sessions = sessionize(events, gap_minutes=30)
        agg = sessions.agg(
            F.sum("events").alias("n"), F.count("*").alias("sessions")
        ).first()
        assert agg["n"] == events.count()  # every event in exactly one session
        assert agg["sessions"] > events.select("user_id").distinct().count()
        # sessions are disjoint per user and ordered
        bad = sessions.filter(
            F.col("session_end") < F.col("session_start")
        ).count()
        assert bad == 0

    def test_sessionize_stream_closes_sessions(self, spark, sf_dir, tmp_path):
        from garmin_data_pipeline_spark.plans.registry import table

        src = tmp_path / "events_in2"
        table(spark, sf_dir, "events").write.parquet(str(src))
        from garmin_data_pipeline_spark.streaming import read_events_stream

        stream = read_events_stream(spark, str(src))
        sessions = sessionize(stream, gap_minutes=30)
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_test")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("sessions_test")
        # in-batch inactivity gaps close sessions even without timeouts
        assert got.count() > 0
        assert got.filter(F.col("events") <= 0).count() == 0


def test_attribution_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join (click->purchase attribution):
    the watermarked streaming join over file sources must produce
    exactly the batch twin's match set, and the streaming plan must
    carry watermarks on both sides (bounded state)."""
    from garmin_data_pipeline_spark.plans.registry import table
    from garmin_data_pipeline_spark.streaming import (
        attribute_purchases,
        read_events_stream,
    )

    src = tmp_path / "events_attr"
    table(spark, sf_dir, "events").write.parquet(str(src))

    ev_stream = read_events_stream(spark, str(src))
    joined = attribute_purchases(
        ev_stream.filter(F.col("event_type") == "purchase"),
        read_events_stream(spark, str(src)).filter(
            F.col("event_type") == "click"
        ),
        window_minutes=60,
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("attr_test").collect()
    }

    ev = table(spark, sf_dir, "events")
    want = {
        (r["purchase_id"], r["click_id"])
        for r in attribute_purchases(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
            window_minutes=60,
        ).collect()
    }
    assert want, "batch twin unexpectedly found no attributions"
    assert got == want


def test_overlap_intervals_stream_matches_batch(spark, sf_dir, tmp_path):
    """st8 — stream-stream interval OVERLAP join: the watermarked
    streaming join over two interval file-streams must produce
    exactly the batch twin's pair set with identical overlap_us
    (j9's semantics; the batch path IS join_interval_overlap, whose
    correctness the j9 driver row certifies). Interval construction
    (per-user, per-event-type LEAD state intervals) happens in batch
    upstream — the streams carry already-built intervals, as an
    upstream SCD2/session stage would emit them. ts is cast to
    TIMESTAMP (watermarks reject NTZ; UTC session keeps wall-clock
    equality with the NTZ batch plan)."""
    from pyspark.sql.window import Window

    from garmin_data_pipeline_spark.plans.registry import table
    from garmin_data_pipeline_spark.streaming import overlap_intervals

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def intervals(etype, s_name, e_name):
        sub = ev.filter(F.col("event_type") == etype)
        return (
            sub.select(
                "user_id",
                F.col("ts").cast("timestamp").alias(s_name),
                F.lead(F.col("ts").cast("timestamp"))
                .over(w)
                .alias(e_name),
            )
            .filter(F.col(e_name).isNotNull())
        )

    clicks = intervals("click", "click_start", "click_end")
    views = intervals("view", "view_start", "view_end")
    # 7-day cap: the sparse test log's state intervals are long
    # (median click-hold ~29h at sf0.001) — 266 of 330 pairs survive
    # the cap, a real population on both sides of it
    kwargs = dict(
        by=("user_id",),
        max_interval_minutes=7 * 24 * 60,
        watermark="2 hours",
    )

    want = {
        tuple(r)
        for r in overlap_intervals(
            clicks, views,
            "click_start", "click_end", "view_start", "view_end",
            **kwargs,
        ).collect()
    }
    assert want, "batch twin unexpectedly found no overlaps"

    c_src, v_src = tmp_path / "iv_clicks", tmp_path / "iv_views"
    clicks.write.parquet(str(c_src))
    views.write.parquet(str(v_src))
    c_stream = spark.readStream.schema(clicks.schema).parquet(str(c_src))
    v_stream = spark.readStream.schema(views.schema).parquet(str(v_src))
    joined = overlap_intervals(
        c_stream, v_stream,
        "click_start", "click_end", "view_start", "view_end",
        **kwargs,
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("st8_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_st8"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("st8_test").collect()}
    assert got == want


def test_overlap_intervals_cap_drops_unbounded_state(spark):
    """The max_interval cap is the state-bound contract: an interval
    longer than the cap is dropped in BOTH frames (batch checked
    here), so no pair can require unbounded buffering of the other
    side."""
    from garmin_data_pipeline_spark.streaming import overlap_intervals

    a = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 00:30:00"),
            # 10-day interval: over any sane cap — must vanish
            (1, "2024-01-01 00:00:00", "2024-01-11 00:00:00"),
        ],
        "user_id long, a_s string, a_e string",
    ).select(
        "user_id",
        F.col("a_s").cast("timestamp").alias("a_s"),
        F.col("a_e").cast("timestamp").alias("a_e"),
    )
    b = spark.createDataFrame(
        [(1, "2024-01-01 00:15:00", "2024-01-01 00:45:00")],
        "user_id long, b_s string, b_e string",
    ).select(
        "user_id",
        F.col("b_s").cast("timestamp").alias("b_s"),
        F.col("b_e").cast("timestamp").alias("b_e"),
    )
    out = overlap_intervals(
        a, b, "a_s", "a_e", "b_s", "b_e",
        by=("user_id",), max_interval_minutes=60,
    ).collect()
    assert len(out) == 1
    assert out[0]["overlap_us"] == 15 * 60 * 1_000_000


def test_daily_summary_stream_to_table(spark, sf_dir, tmp_path):
    import shutil as _sh

    from garmin_data_pipeline_spark.plans.registry import table

    spark.sql("DROP TABLE IF EXISTS events_daily_tbl")
    _sh.rmtree("/tmp/spark-test-warehouse/events_daily_tbl", ignore_errors=True)
    src = tmp_path / "events_tbl_in"
    table(spark, sf_dir, "events").write.parquet(str(src))
    q = start_daily_summary_stream(
        spark,
        str(src),
        checkpoint=str(tmp_path / "ckpt_tbl"),
        sink_table="events_daily_tbl",
        sink="table",
    )
    q.awaitTermination(120)
    assert spark.table("events_daily_tbl").count() > 0
    spark.sql("DROP TABLE events_daily_tbl")


def test_dedupe_stream_drops_replayed_shards(spark, sf_dir, tmp_path):
    from garmin_data_pipeline_spark.plans.registry import table
    from garmin_data_pipeline_spark.streaming import (
        dedupe_stream,
        read_events_stream,
    )

    # land the SAME events twice (simulated shard replay)
    ev = table(spark, sf_dir, "events")
    src = tmp_path / "dup_in"
    ev.write.parquet(str(src))
    ev.write.mode("append").parquet(str(src))

    stream = read_events_stream(spark, str(src))
    deduped = dedupe_stream(stream, ["event_id"], watermark="365 days")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_test")
    assert got.count() == ev.count()  # every duplicate dropped
    assert got.select("event_id").distinct().count() == ev.count()
    # batch fallback
    assert dedupe_stream(ev.union(ev), ["event_id"]).count() == ev.count()


def test_watermark_drops_late_events(spark, tmp_path):
    """Late events older than the watermark must not reopen finalized
    windows: run 1 sees on-time day-1 events, run 2 sees day-9 events
    that advance the watermark past day 1 (finalizing its window), and
    run 3 sees LATE day-1 events — which are dropped, not merged. Each
    arrival is a separate availableNow run over one checkpoint (the
    restartable-incremental pattern)."""
    import datetime as dt

    from garmin_data_pipeline_spark.streaming import daily_event_summary

    src = tmp_path / "late_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_late")
    out_dir = str(tmp_path / "late_out")
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )

    def land_and_run(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            daily_event_summary(stream, watermark="1 day")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    d1 = dt.datetime(2024, 1, 1, 10, 0, 0)
    d9 = dt.datetime(2024, 1, 9, 10, 0, 0)
    land_and_run([(i, d1, 1, "click", 1.0, "{}") for i in range(4)])
    land_and_run([(100 + i, d9, 1, "click", 1.0, "{}") for i in range(2)])
    land_and_run([(200 + i, d1, 1, "click", 1.0, "{}") for i in range(3)])

    rows = (
        spark.read.parquet(out_dir)
        .filter(F.col("calendarDate") == "2024-01-01")
        .collect()
    )
    # exactly one finalized emission for day 1, with only on-time events
    assert [r["event_count"] for r in rows] == [4]


class TestJdbcReaderConfig:
    """S10 read-side plumbing, testable without a database."""

    def test_table_scan_options(self):
        from garmin_data_pipeline_spark.sources.sinks import (
            jdbc_reader_options,
        )

        opts = jdbc_reader_options(
            "jdbc:postgresql://host/db",
            table="garmin.summarized_activities",
            partition_column="activity_id",
            lower_bound=0,
            upper_bound=1_000_000,
            num_partitions=16,
            fetch_size=5000,
            properties={"user": "etl"},
        )
        assert opts["dbtable"] == "garmin.summarized_activities"
        assert opts["partitionColumn"] == "activity_id"
        assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")
        assert opts["numPartitions"] == "16"
        assert opts["fetchsize"] == "5000"
        assert opts["user"] == "etl"
        assert "query" not in opts

    def test_query_scan_options(self):
        from garmin_data_pipeline_spark.sources.sinks import (
            jdbc_reader_options,
        )

        opts = jdbc_reader_options(
            "jdbc:postgresql://host/db",
            query="SELECT * FROM garmin.activities WHERE distance > 5",
        )
        assert opts["query"].startswith("SELECT")
        assert "dbtable" not in opts

    def test_invalid_combinations(self):
        import pytest as _pytest

        from garmin_data_pipeline_spark.sources.sinks import (
            jdbc_reader_options,
        )

        with _pytest.raises(ValueError, match="exactly one"):
            jdbc_reader_options("jdbc:x")
        with _pytest.raises(ValueError, match="exactly one"):
            jdbc_reader_options("jdbc:x", table="t", query="SELECT 1")
        with _pytest.raises(ValueError, match="together"):
            jdbc_reader_options(
                "jdbc:x", table="t", partition_column="id"
            )
        with _pytest.raises(ValueError, match="cannot be combined"):
            jdbc_reader_options(
                "jdbc:x",
                query="SELECT 1",
                partition_column="id",
                lower_bound=0,
                upper_bound=10,
                num_partitions=2,
            )

    def test_writer_options(self):
        from garmin_data_pipeline_spark.sources.sinks import (
            jdbc_writer_options,
        )

        opts = jdbc_writer_options(
            "jdbc:postgresql://host/db",
            "garmin.daily_summary",
            batch_size=500,
            properties={"user": "etl"},
        )
        assert opts["dbtable"] == "garmin.daily_summary"
        assert opts["batchsize"] == "500"
        assert opts["user"] == "etl"
        import pytest as _pytest

        with _pytest.raises(ValueError, match="table"):
            jdbc_writer_options("jdbc:x", "")


class TestJdbcDerbyRoundTrip:
    """S9/S10 end-to-end over a REAL JDBC database.

    The container has no network database, but the Derby jars that ship
    inside the Spark distribution (``pyspark/jars/derby*-10.16*.jar``)
    include the embedded engine — a file-backed, in-JVM JDBC database.
    That makes ``write_jdbc`` -> ``read_jdbc`` (db_utils.py:121-187
    semantics) testable for real: Spark's DerbyDialect handles the DDL
    for mode="overwrite" (the reference's truncate-and-reload), and the
    partitioned read issues stripe predicates against the same store.

    One dialect caveat worth pinning: Spark creates columns QUOTED, so
    they are case-sensitive in Derby — a raw ``query=`` must quote
    identifiers (``SELECT "id" ...``). The reference never hits this
    (PostgreSQL lowercases unquoted identifiers).
    """

    URL = "jdbc:derby:/tmp/spark-test-derby/db;create=true"
    PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    @pytest.fixture(autouse=True)
    def _derby_home(self, spark):
        # Keep derby.log out of the cwd; must be set before the engine
        # first loads in the JVM.
        spark._jvm.System.setProperty(
            "derby.system.home", "/tmp/spark-test-derby"
        )

    def test_write_read_roundtrip(self, spark):
        from garmin_data_pipeline_spark.sources import sinks

        df = spark.createDataFrame(
            [(1, "run", 5.2), (2, "walk", 1.3), (3, None, None)],
            "activity_id bigint, type string, distance_km double",
        )
        # overwrite twice: proves the truncate-and-reload path re-drops
        # the existing table (reference if_exists='replace').
        for _ in range(2):
            sinks.write_jdbc(
                df, self.URL, "activities_rt", properties=self.PROPS
            )
        back = sinks.read_jdbc(
            spark, self.URL, table="activities_rt", properties=self.PROPS
        )
        assert sorted(
            [tuple(r) for r in back.collect()]
        ) == [(1, "run", 5.2), (2, "walk", 1.3), (3, None, None)]

    def test_append_and_query_scan(self, spark):
        from garmin_data_pipeline_spark.sources import sinks

        df = spark.createDataFrame(
            [(10, 100.0), (11, 250.0)], "id bigint, calories double"
        )
        sinks.write_jdbc(df, self.URL, "cal_rt", properties=self.PROPS)
        sinks.write_jdbc(
            df, self.URL, "cal_rt", mode="append", properties=self.PROPS
        )
        got = sinks.read_jdbc(
            spark,
            self.URL,
            query='SELECT "id" FROM cal_rt WHERE "calories" >= 200',
            properties=self.PROPS,
        )
        assert sorted([r["id"] for r in got.collect()]) == [11, 11]

    def test_partitioned_stripe_read(self, spark):
        from garmin_data_pipeline_spark.sources import sinks

        df = spark.range(0, 100).withColumnRenamed("id", "k")
        sinks.write_jdbc(df, self.URL, "stripes_rt", properties=self.PROPS)
        got = sinks.read_jdbc(
            spark,
            self.URL,
            table="stripes_rt",
            partition_column="k",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
            properties=self.PROPS,
        )
        # 4 parallel stripe queries, no rows lost or duplicated at the
        # stripe boundaries.
        assert got.rdd.getNumPartitions() == 4
        assert got.count() == 100
        assert got.agg(F.sum("k")).first()[0] == 4950
        # every stripe actually reads rows — i.e. >1 task does real
        # work, not one stripe swallowing the table (the single-
        # connection bottleneck the partitioned read exists to avoid)
        per_task = got.withColumn(
            "pid", F.spark_partition_id()
        ).groupBy("pid").count().collect()
        assert len(per_task) == 4
        assert all(r["count"] == 25 for r in per_task)


def test_events_queries_portable_across_timestamp_shapes(
    spark, sf_dir, tmp_path
):
    """The driver's testdata has shipped `ts` as parquet
    TIMESTAMP(NANOS) (rounds <=3) and TIMESTAMP(MICROS)
    isAdjustedToUTC=false -> TIMESTAMP_NTZ (round 4). Pin the
    epoch_micros contract: the events family must produce IDENTICAL
    values whether `ts` reads as TIMESTAMP_NTZ or as an instant
    (TIMESTAMP_LTZ), so the next shape flip is a no-op."""
    import pandas as pd

    from garmin_data_pipeline_spark import plans

    src = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert str(src["ts"].dtype).startswith("datetime64")

    ntz_dir = tmp_path / "ntz"
    ltz_dir = tmp_path / "ltz"
    for d in (ntz_dir, ltz_dir):
        d.mkdir()
    # NTZ twin: naive micros (what pandas/Arrow write by default)
    src.to_parquet(ntz_dir / "events.parquet")
    # instant twin: UTC-stamped -> parquet isAdjustedToUTC=true, reads
    # back as TIMESTAMP (LTZ)
    ltz = src.copy()
    ltz["ts"] = ltz["ts"].dt.tz_localize("UTC")
    ltz.to_parquet(ltz_dir / "events.parquet")

    sess_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # st1 lives in the demoted pytest tier since r11 — the
        # portability pin follows it across driver-visibility moves
        qs = dict(plans.queries())
        qs.update({n: q.fn for n, q in plans.PYTEST_QUERIES.items()})
        for name in ("st2_sessionize", "j5_asof_join", "j6_range_join",
                     "st1_tumbling_daily", "st3_replay_dedup"):
            a = qs[name](spark, str(ntz_dir)).toPandas()
            b = qs[name](spark, str(ltz_dir)).toPandas()
            for df in (a, b):
                for c in df.columns:
                    if str(df[c].dtype).startswith("datetime64"):
                        df[c] = df[c].dt.tz_localize(None)
            cols = sorted(a.columns)
            a = a[cols].sort_values(cols).reset_index(drop=True)
            b = b[cols].sort_values(cols).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
    finally:
        if sess_tz is not None:
            spark.conf.set("spark.sql.session.timeZone", sess_tz)


def test_enrich_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static enrichment (st5): the streaming side joins the
    static customer dim per micro-batch (stateless — no join state
    store) and its finalized windows must value-match the batch twin.
    Append mode emits only watermark-finalized windows, so the
    streamed rows are a subset; every emitted row must match."""
    from garmin_data_pipeline_spark.plans.registry import table
    from garmin_data_pipeline_spark.streaming import (
        enrich_events,
        read_events_stream,
    )

    src = tmp_path / "events_enrich"
    table(spark, sf_dir, "events").write.parquet(str(src))
    cust = table(spark, sf_dir, "customer")

    streamed = enrich_events(
        read_events_stream(spark, str(src)), cust, window="1 day"
    )
    assert streamed.isStreaming
    q = (
        streamed.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("enrich_test")
    batch = enrich_events(table(spark, sf_dir, "events"), cust)
    assert 0 < got.count() <= batch.count()
    j = got.alias("s").join(batch.alias("b"), ["day", "mktsegment"])
    assert j.count() == got.count()
    mism = j.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("s.total_value") - F.col("b.total_value")) > 1e-6)
    )
    assert mism.count() == 0
