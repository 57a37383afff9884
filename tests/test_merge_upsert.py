"""Tests for the ORC source/sink and the partition-pruned MERGE
upsert (the load strategy the reference's db_utils explicitly
rejects)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.sources.sinks import (
    merge_upsert,
    read_orc,
    write_orc,
)


class TestOrcRoundTrip:
    def test_round_trip_and_pushdown(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "orders_orc")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        write_orc(orders, path)
        back = read_orc(spark, path)
        assert back.count() == orders.count()
        assert set(back.columns) == set(orders.columns)
        # predicate pushdown reaches the ORC scan
        plan = (
            back.filter(F.col("o_orderkey") == 7)
            .select("o_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [" in plan and "o_orderkey" in plan

    def test_partitioned_orc(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "orders_orc_part")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
            "o_year", F.year("o_orderdate")
        )
        write_orc(orders, path, partition_by=["o_year"])
        back = read_orc(spark, path)
        years = {r[0] for r in back.select("o_year").distinct().collect()}
        assert len(years) > 1


class TestJsonlCorpusExport:
    def test_round_trip_gzip_with_schema(self, spark, sf_dir, tmp_path):
        from garmin_data_pipeline_spark.sources.sinks import (
            read_jsonl,
            write_jsonl,
        )

        path = str(tmp_path / "docs_jsonl")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_jsonl(docs, path)  # gzip default
        files = list((tmp_path / "docs_jsonl").glob("*.json.gz"))
        assert files, "expected gzip-compressed jsonl part files"
        back = read_jsonl(spark, path, schema=docs.schema)
        assert back.count() == docs.count()
        assert back.schema == docs.schema
        # value-level: same doc_id -> text mapping
        a = {r["doc_id"]: r["text"] for r in docs.collect()}
        b = {r["doc_id"]: r["text"] for r in back.collect()}
        assert a == b

    def test_read_jsonl_permissive_on_corrupt_lines(self, spark, tmp_path):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from garmin_data_pipeline_spark.sources.sinks import read_jsonl

        p = tmp_path / "corpus"
        p.mkdir()
        (p / "part-0.json").write_text(
            '{"doc_id": 1, "text": "ok"}\n'
            "this line is not json at all\n"
            '{"doc_id": 2, "text": "also ok"}\n'
        )
        schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )
        rows = read_jsonl(spark, str(p), schema=schema).collect()
        # corrupt line -> NULL row (PERMISSIVE), scan does not fail
        assert len(rows) == 3
        assert sorted(
            r["doc_id"] for r in rows if r["doc_id"] is not None
        ) == [1, 2]

    @staticmethod
    def _shard_bytes(path):
        import gzip

        out = {}
        for d in sorted(path.glob("shard=*")):
            files = sorted(d.glob("*.json.gz"))
            assert len(files) == 1, (
                f"{d}: a shard must land wholly in one file"
            )
            out[d.name] = gzip.decompress(files[0].read_bytes())
        return out

    def test_export_training_shards_deterministic_across_partitionings(
        self, spark, sf_dir, tmp_path
    ):
        import json as _json

        from garmin_data_pipeline_spark.sources.sinks import (
            export_training_shards,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

        def export(tag, n_input_partitions):
            path = tmp_path / tag
            export_training_shards(
                docs.repartition(n_input_partitions),
                str(path),
                n_shards=4,
                key_col="doc_id",
            )
            return self._shard_bytes(path)

        # shard membership and bytes must NOT depend on how the
        # input happened to be partitioned (laptop vs cluster)
        shards1 = export("run_p3", 3)
        shards2 = export("run_p11", 11)
        assert len(shards1) == 4
        assert shards1 == shards2
        # nothing lost or duplicated across the shard set
        back_ids = sorted(
            _json.loads(line)["doc_id"]
            for blob in shards1.values()
            for line in blob.splitlines()
        )
        assert back_ids == sorted(
            r["doc_id"] for r in docs.select("doc_id").collect()
        )
        # shuffled: shard 0 is not simply the first doc_ids in order
        first = _json.loads(
            shards1["shard=0"].splitlines()[0].decode()
        )
        assert first["doc_id"] != back_ids[0] or len(back_ids) == 1

    def test_export_salt_changes_order(self, spark, sf_dir, tmp_path):
        from garmin_data_pipeline_spark.sources.sinks import (
            export_training_shards,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = []
        for salt in ("epoch-1", "epoch-2"):
            path = tmp_path / salt
            export_training_shards(
                docs, str(path), n_shards=2, key_col="doc_id", salt=salt
            )
            out.append(
                b"".join(self._shard_bytes(path).values())
            )
        assert out[0] != out[1]  # a new salt is a new epoch order


@pytest.fixture()
def upsert_table(spark):
    name = "t_upsert_target"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(f"/tmp/spark-test-warehouse/{name}", ignore_errors=True)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(f"/tmp/spark-test-warehouse/{name}", ignore_errors=True)


def _base(spark):
    return spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0, 1),
            (2, "2024-01-01", 20.0, 1),
            (3, "2024-01-02", 30.0, 1),
            (4, "2024-01-03", 40.0, 1),
        ],
        ["k", "day", "v", "ver"],
    )


class TestMergeUpsert:
    def test_unpartitioned_upsert(self, spark, upsert_table, tmp_path):
        _base(spark).write.saveAsTable(upsert_table)
        updates = spark.createDataFrame(
            [(2, "2024-01-01", 99.0, 2), (5, "2024-01-04", 50.0, 1)],
            ["k", "day", "v", "ver"],
        )
        merge_upsert(
            spark,
            upsert_table,
            updates,
            keys=["k"],
            order_col="ver",
            staging_dir=str(tmp_path / "stage1"),
        )
        got = {r["k"]: r["v"] for r in spark.table(upsert_table).collect()}
        assert got == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0, 5: 50.0}

    def test_tie_prefers_update(self, spark, upsert_table, tmp_path):
        _base(spark).write.saveAsTable(upsert_table)
        updates = spark.createDataFrame(
            [(1, "2024-01-01", 77.0, 1)], ["k", "day", "v", "ver"]
        )
        merge_upsert(
            spark,
            upsert_table,
            updates,
            keys=["k"],
            order_col="ver",
            staging_dir=str(tmp_path / "stage2"),
        )
        got = {r["k"]: r["v"] for r in spark.table(upsert_table).collect()}
        assert got[1] == 77.0

    def test_map_typed_payload_column_merges(
        self, spark, upsert_table, tmp_path
    ):
        """Map-typed columns must not break the payload-hash tiebreak
        (ADVICE r8: xxhash64 raises AnalysisException on MapType;
        ADVICE r9: maps are now hashed via a canonicalized JSON form
        rather than excluded, so they participate in the tiebreak)."""
        base = spark.createDataFrame(
            [(1, {"a": 1}, 1), (2, {"b": 2}, 1)],
            "k int, props map<string,int>, ver int",
        )
        base.write.saveAsTable(upsert_table)
        updates = spark.createDataFrame(
            [(2, {"b": 9}, 2), (3, {"c": 3}, 1)],
            "k int, props map<string,int>, ver int",
        )
        merge_upsert(
            spark,
            upsert_table,
            updates,
            keys=["k"],
            order_col="ver",
            staging_dir=str(tmp_path / "stage_map"),
        )
        got = {
            r["k"]: dict(r["props"])
            for r in spark.table(upsert_table).collect()
        }
        assert got == {1: {"a": 1}, 2: {"b": 9}, 3: {"c": 3}}

    def test_map_only_difference_breaks_ties_deterministically(
        self, spark, upsert_table, tmp_path
    ):
        """ADVICE r9: two updates with equal (keys, order_col) that
        differ ONLY in a map column must resolve the same way on
        every replay — the canonicalized-JSON hash restores the
        tiebreak the r8 map EXCLUSION silently dropped. Also pins
        entry-order insensitivity: a map built in a different entry
        order is the SAME payload and must not affect the winner."""
        base = spark.createDataFrame(
            [(1, {"z": 0}, 1)], "k int, props map<string,int>, ver int"
        )
        base.write.saveAsTable(upsert_table)
        # same key, same ver, different map payloads — the winner
        # must be a pure function of the payloads
        dup = [(1, {"a": 1, "b": 2}, 2), (1, {"c": 3}, 2)]
        winners = set()
        for rep in range(3):
            updates = spark.createDataFrame(
                dup, "k int, props map<string,int>, ver int"
            )
            merge_upsert(
                spark,
                upsert_table,
                updates,
                keys=["k"],
                order_col="ver",
                staging_dir=str(tmp_path / f"stage_tie{rep}"),
            )
            row = spark.table(upsert_table).collect()[0]
            winners.add(tuple(sorted(row["props"].items())))
        assert len(winners) == 1, winners
        # entry-order insensitivity of the canonical form
        from garmin_data_pipeline_spark.sources.sinks import (
            tiebreak_hash,
        )

        df = spark.createDataFrame(
            [(1, {"a": 1, "b": 2}), (1, {"b": 2, "a": 1})],
            "k int, props map<string,int>",
        )
        hashes = [
            r["h"]
            for r in df.select(
                tiebreak_hash(df.schema).alias("h")
            ).collect()
        ]
        assert hashes[0] == hashes[1]

    def test_nested_map_payloads_merge(
        self, spark, upsert_table, tmp_path
    ):
        """array<map<...>> and struct-with-map payloads previously
        made xxhash64 raise straight through the r8 top-level-only
        exclusion (ADVICE r9); the recursive walk routes them through
        to_json."""
        schema = (
            "k int, tags array<map<string,int>>, "
            "meta struct<m: map<string,int>, n: int>, ver int"
        )
        base = spark.createDataFrame(
            [(1, [{"a": 1}], {"m": {"x": 1}, "n": 1}, 1)], schema
        )
        base.write.saveAsTable(upsert_table)
        updates = spark.createDataFrame(
            [(1, [{"a": 2}], {"m": {"x": 2}, "n": 2}, 2)], schema
        )
        merge_upsert(
            spark,
            upsert_table,
            updates,
            keys=["k"],
            order_col="ver",
            staging_dir=str(tmp_path / "stage_nested"),
        )
        row = spark.table(upsert_table).collect()[0]
        assert row["meta"]["n"] == 2 and row["tags"][0]["a"] == 2

    def test_partitioned_rewrites_only_touched_partitions(
        self, spark, upsert_table, tmp_path
    ):
        _base(spark).write.partitionBy("day").saveAsTable(upsert_table)
        # capture the untouched partition's files before the merge
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {upsert_table}")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        ).replace("file:", "")
        import os

        def files(day):
            d = f"{loc}/day={day}"
            return sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )

        before_untouched = files("2024-01-03")
        updates = spark.createDataFrame(
            [(2, "2024-01-01", 99.0, 2), (6, "2024-01-05", 60.0, 1)],
            ["k", "day", "v", "ver"],
        )
        merge_upsert(
            spark,
            upsert_table,
            updates,
            keys=["k"],
            order_col="ver",
            partition_col="day",
            staging_dir=str(tmp_path / "stage3"),
        )
        got = {r["k"]: r["v"] for r in spark.table(upsert_table).collect()}
        assert got == {
            1: 10.0,
            2: 99.0,
            3: 30.0,
            4: 40.0,
            6: 60.0,
        }
        # dynamic overwrite left the untouched day's files alone
        assert files("2024-01-03") == before_untouched


class TestStreamingUpsert:
    def test_replay_and_late_update_converge(self, spark, tmp_path):
        """st6: at-least-once file delivery + keyed upsert == exactly-
        once table contents. Run 1 ingests two days; run 2 delivers a
        REPLAYED row (same event_id, same ts) plus a corrected row
        (same event_id, newer ts) plus a brand-new day — the table
        must converge to one row per event_id with corrections
        applied, never duplicating replays."""
        import datetime as dt
        import shutil

        from garmin_data_pipeline_spark.streaming import (
            start_upsert_stream,
        )

        table = "t_stream_upsert"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )
        src = tmp_path / "in"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )

        def land_and_run(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q = start_upsert_stream(
                spark,
                str(src),
                table,
                ckpt,
                staging_dir=str(tmp_path / "stage"),
            )
            q.awaitTermination(120)

        d1 = dt.datetime(2024, 3, 1, 9, 0, 0)
        d2 = dt.datetime(2024, 3, 2, 9, 0, 0)
        d3 = dt.datetime(2024, 3, 3, 9, 0, 0)
        land_and_run(
            [
                (1, d1, 10, "click", 1.0, "{}"),
                (2, d1, 10, "click", 2.0, "{}"),
                (3, d2, 11, "buy", 3.0, "{}"),
            ]
        )
        land_and_run(
            [
                (2, d1, 10, "click", 2.0, "{}"),  # replay, unchanged
                (3, d2 + dt.timedelta(hours=1), 11, "buy", 99.0, "{}"),
                (4, d3, 12, "click", 4.0, "{}"),
            ]
        )

        got = {
            r["event_id"]: r["value"]
            for r in spark.table(table).collect()
        }
        assert got == {1: 1.0, 2: 2.0, 3: 99.0, 4: 4.0}
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )


class TestCrossFormatAndEvolution:
    def test_cross_format_union(self, spark, sf_dir, tmp_path):
        """One logical dataset served from three physical formats
        (parquet + csv + json shards — the shape of a corpus
        accumulated across pipeline generations) unions losslessly
        under an explicit schema: schema is DECLARED once, never
        inferred per format (csv would type everything string, json
        would sample)."""
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        p = {f: str(tmp_path / f) for f in ("pq", "csv", "js")}
        nation.write.parquet(p["pq"])
        nation.write.option("header", True).csv(p["csv"])
        nation.write.json(p["js"])

        schema = nation.schema
        back = (
            spark.read.schema(schema).parquet(p["pq"])
            .unionByName(
                spark.read.schema(schema)
                .option("header", True)
                .csv(p["csv"])
            )
            .unionByName(spark.read.schema(schema).json(p["js"]))
        )
        n = nation.count()
        assert back.count() == 3 * n
        assert back.distinct().count() == n
        assert back.schema == schema

    def test_merge_schema_evolution(self, spark, tmp_path):
        """A column added mid-history reads back across old+new shards
        with mergeSchema: old rows surface NULL, new rows carry the
        value — no rewrite of historical data."""
        path = str(tmp_path / "evolving")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], ["id", "v"]
        ).write.parquet(path + "/gen=1")
        spark.createDataFrame(
            [(3, "c", 9.5)], ["id", "v", "score"]
        ).write.parquet(path + "/gen=2")
        back = spark.read.option("mergeSchema", True).parquet(path)
        assert set(back.columns) == {"id", "v", "score", "gen"}
        rows = {r["id"]: r["score"] for r in back.collect()}
        assert rows == {1: None, 2: None, 3: 9.5}


class TestStreamingSessionWindow:
    def test_stream_matches_batch_sessionize(self, spark, sf_dir, tmp_path):
        """st7: the built-in session_window aggregate produces the
        SAME closed sessions in streaming (availableNow, watermark
        far past the data) as st2b's batch plan over the same
        events."""
        from garmin_data_pipeline_spark.plans.queries import (
            st2b_session_window,
        )
        from garmin_data_pipeline_spark.streaming import (
            sessionize_stream,
        )

        out_dir = str(tmp_path / "sessions_out")
        ckpt = str(tmp_path / "ckpt")
        src = str(tmp_path / "src")
        # copy a deterministic slice of events as the stream source
        # watermarks require TIMESTAMP (LTZ); the testdata ships NTZ.
        # The session runs UTC, so the cast preserves wall-clock times
        # and the batch (NTZ) plan stays comparable.
        ev = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(F.col("user_id") < 20)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        ev.write.parquet(src)

        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            (r["user_id"], r["session_start"], r["session_end"]): (
                r["events"],
                round(r["total_value"], 6),
            )
            for r in spark.read.parquet(out_dir).collect()
        }
        want_all = {
            (r["user_id"], r["session_start"], r["session_end"]): (
                r["events"],
                round(r["total_value"], 6),
            )
            for r in st2b_session_window(spark, sf_dir).collect()
            if r["user_id"] < 20
        }
        # append mode emits only sessions CLOSED by the final
        # watermark: every emitted session must match batch exactly,
        # and the only batch sessions allowed to be missing are the
        # ones still open at the stream's end (within 1h+gap of max
        # ts)
        assert got, "stream emitted no sessions"
        for k, v in got.items():
            assert want_all.get(k) == v, (k, v, want_all.get(k))
        import datetime as dt

        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        horizon = max_ts - dt.timedelta(hours=1)
        for k in set(want_all) - set(got):
            # k[2] is session_end = last event + gap
            assert k[2] >= horizon, (k, "closed session not emitted")


class TestStreamingUpsertChaos:
    """Chaos-style replay hardening (r6 verdict directive 8 + ADVICE):
    duplicated and out-of-order micro-batches — including duplicate
    keys INSIDE the table-creating first batch — must still yield
    exactly-once table contents."""

    def test_first_batch_intra_dup_and_unordered_replays(
        self, spark, tmp_path
    ):
        import datetime as dt
        import shutil

        from garmin_data_pipeline_spark.streaming import (
            start_upsert_stream,
        )

        table = "t_stream_upsert_chaos"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )
        src = tmp_path / "in"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )

        def land_and_run(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q = start_upsert_stream(
                spark,
                str(src),
                table,
                ckpt,
                staging_dir=str(tmp_path / "stage"),
            )
            q.awaitTermination(120)

        d1 = dt.datetime(2024, 3, 1, 9, 0, 0)
        d2 = dt.datetime(2024, 3, 2, 9, 0, 0)
        # FIRST batch (creation path): event 1 duplicated verbatim,
        # event 2 duplicated with two versions OUT OF ORDER (newer
        # row listed first) — at-least-once delivery inside one batch
        land_and_run(
            [
                (1, d1, 10, "click", 1.0, "{}"),
                (1, d1, 10, "click", 1.0, "{}"),
                (2, d1 + dt.timedelta(hours=2), 10, "buy", 22.0, "{}"),
                (2, d1, 10, "buy", 2.0, "{}"),
            ]
        )
        spark.sql(f"REFRESH TABLE {table}")
        assert {
            r["event_id"]: r["value"]
            for r in spark.table(table).collect()
        } == {1: 1.0, 2: 22.0}, "creation path persisted duplicates"
        # SECOND batch: replay batch 1's rows (stale versions), plus
        # a new event duplicated within the batch
        land_and_run(
            [
                (2, d1, 10, "buy", 2.0, "{}"),       # stale replay
                (1, d1, 10, "click", 1.0, "{}"),     # verbatim replay
                (3, d2, 11, "click", 3.0, "{}"),
                (3, d2, 11, "click", 3.0, "{}"),
            ]
        )
        # THIRD batch: everything again, shuffled order
        land_and_run(
            [
                (3, d2, 11, "click", 3.0, "{}"),
                (2, d1 + dt.timedelta(hours=2), 10, "buy", 22.0, "{}"),
                (1, d1, 10, "click", 1.0, "{}"),
            ]
        )
        spark.sql(f"REFRESH TABLE {table}")
        rows = spark.table(table).collect()
        assert len(rows) == 3, rows  # exactly once per key
        assert {r["event_id"]: r["value"] for r in rows} == {
            1: 1.0,
            2: 22.0,
            3: 3.0,
        }
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )

    def test_partition_migrating_key_is_rejected(self, spark, tmp_path):
        """r7 verdict item 7: the streaming upsert derives the `day`
        partition from the event ts, so a late correction that moves
        a key's ts across midnight MIGRATES its partition — the
        partition-pruned merge would leave the old-day row stale and
        the table would hold the key twice. With
        validate_partition_stability defaulting ON in
        start_upsert_stream, the batch must be explicitly REJECTED
        (streaming query fails), not silently half-applied."""
        import datetime as dt
        import shutil

        import pytest
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        from garmin_data_pipeline_spark.streaming import (
            start_upsert_stream,
        )

        table = "t_stream_upsert_migrate"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )
        src = tmp_path / "in"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )

        def land(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))

        def run():
            q = start_upsert_stream(
                spark,
                str(src),
                table,
                ckpt,
                staging_dir=str(tmp_path / "stage"),
            )
            q.awaitTermination(120)
            if q.exception() is not None:
                raise q.exception()

        d1 = dt.datetime(2024, 3, 1, 23, 30, 0)
        land([(1, d1, 10, "click", 1.0, "{}")])
        run()
        # correction shifts event 1 past midnight -> day changes
        land(
            [
                (
                    1,
                    d1 + dt.timedelta(hours=1),
                    10,
                    "click",
                    1.5,
                    "{}",
                )
            ]
        )
        with pytest.raises(
            (StreamingQueryException, ValueError),
            match="partition-stability|partition",
        ):
            run()
        # the rejected batch must not have half-applied: the original
        # row is intact, exactly once
        spark.sql(f"REFRESH TABLE {table}")
        rows = spark.table(table).collect()
        assert len(rows) == 1 and rows[0]["value"] == 1.0, rows
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )

    def test_equal_ts_creation_dups_resolve_deterministically(
        self, spark, tmp_path
    ):
        """ADVICE r7: first-batch duplicate event_ids with EQUAL ts
        but different payloads must resolve identically on every
        replay. The creation-path window now breaks the ts tie with a
        stable payload hash (sorted column order) — assert the kept
        row is the hash-minimal one, i.e. the choice is a pure
        function of the payloads, not of partition scan order."""
        import datetime as dt
        import shutil

        from pyspark.sql import functions as F

        from garmin_data_pipeline_spark.streaming import (
            start_upsert_stream,
        )

        table = "t_stream_upsert_eqts"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )
        src = tmp_path / "in"
        src.mkdir()
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        d1 = dt.datetime(2024, 3, 1, 9, 0, 0)
        rows = [
            (7, d1, 10, "click", 1.0, "{}"),
            (7, d1, 10, "click", 2.0, "{}"),
        ]
        batch = spark.createDataFrame(rows, schema)
        payload_cols = sorted(
            batch.withColumn("day", F.to_date("ts")).columns
        )
        expected = (
            batch.withColumn("day", F.to_date("ts"))
            .withColumn(
                "__h", F.xxhash64(*[F.col(c) for c in payload_cols])
            )
            .orderBy("__h")
            .first()["value"]
        )
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q = start_upsert_stream(
            spark,
            str(src),
            table,
            str(tmp_path / "ckpt"),
            staging_dir=str(tmp_path / "stage"),
        )
        q.awaitTermination(120)
        spark.sql(f"REFRESH TABLE {table}")
        got = spark.table(table).collect()
        assert len(got) == 1 and got[0]["value"] == expected, got
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )


class TestMergeUpsertNullPartition:
    """ADVICE r6: NULL partition values must merge null-safely — keys
    already stored in __HIVE_DEFAULT_PARTITION__ survive an update
    batch that touches that partition."""

    def test_null_partition_keys_survive(self, spark, tmp_path):
        from garmin_data_pipeline_spark.sources.sinks import (
            merge_upsert,
        )

        import shutil

        table = "t_merge_nullpart"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )
        base = spark.createDataFrame(
            [
                (1, None, 10.0, 1),
                (2, None, 20.0, 1),
                (3, "2024-01-02", 30.0, 1),
            ],
            "k long, day string, v double, ver long",
        )
        base.write.partitionBy("day").saveAsTable(table)
        updates = spark.createDataFrame(
            [(2, None, 21.0, 2)], "k long, day string, v double, ver long"
        )
        merge_upsert(
            spark,
            table,
            updates,
            keys=["k"],
            order_col="ver",
            partition_col="day",
            staging_dir=str(tmp_path / "stage"),
        )
        got = {r["k"]: (r["day"], r["v"]) for r in spark.table(table).collect()}
        # k=1 must NOT be deleted by the NULL-partition overwrite
        assert got == {
            1: (None, 10.0),
            2: (None, 21.0),
            3: ("2024-01-02", 30.0),
        }, got
        spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_partition_stability_validation(self, spark, tmp_path):
        import pytest

        from garmin_data_pipeline_spark.sources.sinks import (
            merge_upsert,
        )

        import shutil

        table = "t_merge_moved"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
        )
        spark.createDataFrame(
            [(1, "2024-01-01", 10.0, 1), (2, "2024-01-02", 20.0, 1)],
            ["k", "day", "v", "ver"],
        ).write.partitionBy("day").saveAsTable(table)
        moved = spark.createDataFrame(
            [(1, "2024-01-05", 11.0, 2)], ["k", "day", "v", "ver"]
        )
        with pytest.raises(ValueError, match="partition-stability"):
            merge_upsert(
                spark,
                table,
                moved,
                keys=["k"],
                order_col="ver",
                partition_col="day",
                staging_dir=str(tmp_path / "stage"),
                validate_partition_stability=True,
            )
        # target untouched by the refused merge
        assert spark.table(table).count() == 2
        spark.sql(f"DROP TABLE IF EXISTS {table}")
