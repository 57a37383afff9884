"""Streaming near-dup detection (new shards vs static corpus index):
batch-function correctness on planted dups, stream-vs-batch
equivalence, and replay idempotence."""

from __future__ import annotations

import sys
from pathlib import Path


sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from garmin_data_pipeline_spark.streaming import (  # noqa: E402
    build_minhash_band_index,
    neardup_candidates,
    start_neardup_stream,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "an entirely different sentence about spark and parquet"),
    (3, "a third document mentioning embeddings and vectors"),
]
NEW_BATCH_1 = [
    # near-dup of corpus doc 1 (suffix appended; est_jaccard ~0.94 —
    # a one-WORD substitution measured ~0.7 and does not reliably
    # share a full 4-row band at bands=8, which is correct LSH
    # behavior, not a bug: band recall at j=0.7 is ~0.89)
    (101, "the quick brown fox jumps over the lazy dog tonight again"),
    # unrelated
    (102, "completely novel text with no counterpart at all here"),
]
NEW_BATCH_2 = [
    # exact duplicate of corpus doc 2
    (103, "an entirely different sentence about spark and parquet"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNeardupBatch:
    def test_planted_dups_found_and_unrelated_not(self, spark):
        index = build_minhash_band_index(_mk(spark, CORPUS)).persist()
        try:
            got = neardup_candidates(
                _mk(spark, NEW_BATCH_1 + NEW_BATCH_2), index
            ).collect()
        finally:
            index.unpersist()
        pairs = {(r.new_doc, r.corpus_doc): r.est_jaccard for r in got}
        assert (101, 1) in pairs
        assert (103, 2) in pairs and pairs[(103, 2)] == 1.0
        assert not any(nd == 102 for nd, _ in pairs)

    def test_pair_scored_once_despite_multiple_shared_bands(
        self, spark
    ):
        """An exact duplicate shares ALL bands with its original —
        the pair must still appear exactly once."""
        index = build_minhash_band_index(_mk(spark, CORPUS))
        got = neardup_candidates(_mk(spark, NEW_BATCH_2), index)
        rows = got.collect()
        assert len(rows) == 1
        assert (rows[0].new_doc, rows[0].corpus_doc) == (103, 2)


class TestNeardupStream:
    def _run_stream(self, spark, tmp_path, index, land_batches):
        src = tmp_path / "in"
        src.mkdir(exist_ok=True)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        for rows in land_batches:
            _mk(spark, rows).coalesce(1).write.mode("append").parquet(
                str(src)
            )
            q = start_neardup_stream(
                spark, str(src), index, out, ckpt
            )
            q.awaitTermination(120)
        return out

    def test_stream_matches_batch(self, spark, tmp_path):
        index = build_minhash_band_index(_mk(spark, CORPUS)).persist()
        try:
            out = self._run_stream(
                spark, tmp_path, index, [NEW_BATCH_1, NEW_BATCH_2]
            )
            streamed = {
                (r.new_doc, r.corpus_doc, round(r.est_jaccard, 6))
                for r in spark.read.parquet(out).collect()
            }
            batch = {
                (r.new_doc, r.corpus_doc, round(r.est_jaccard, 6))
                for r in neardup_candidates(
                    _mk(spark, NEW_BATCH_1 + NEW_BATCH_2), index
                ).collect()
            }
        finally:
            index.unpersist()
        assert streamed == batch

    def test_replayed_shard_is_idempotent_for_keyed_consumer(
        self, spark, tmp_path
    ):
        """Replaying a shard re-emits the SAME pairs (no state, so
        output is append-at-least-once by design); a keyed dedup over
        the sink — the documented downstream contract — converges to
        the single-delivery result."""
        index = build_minhash_band_index(_mk(spark, CORPUS)).persist()
        try:
            src = tmp_path / "in"
            src.mkdir()
            out = str(tmp_path / "out")
            _mk(spark, NEW_BATCH_1).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            # two runs with SEPARATE checkpoints = a full replay
            for ck in ("ckpt_a", "ckpt_b"):
                q = start_neardup_stream(
                    spark, str(src), index, out, str(tmp_path / ck)
                )
                q.awaitTermination(120)
            sink = spark.read.parquet(out)
            assert sink.count() == 2 * sink.dropDuplicates(
                ["new_doc", "corpus_doc"]
            ).count()
            deduped = {
                (r.new_doc, r.corpus_doc)
                for r in sink.dropDuplicates(
                    ["new_doc", "corpus_doc"]
                ).collect()
            }
            batch = {
                (r.new_doc, r.corpus_doc)
                for r in neardup_candidates(
                    _mk(spark, NEW_BATCH_1), index
                ).collect()
            }
        finally:
            index.unpersist()
        assert deduped == batch


class TestBandIndexIO:
    def test_roundtrip_equals_in_memory(self, spark, tmp_path):
        from garmin_data_pipeline_spark.streaming.dedup import (
            read_band_index,
            write_band_index,
        )

        index = build_minhash_band_index(_mk(spark, CORPUS))
        path = str(tmp_path / "band_index")
        write_band_index(index, path, n_partitions=8)
        reopened = read_band_index(spark, path)
        assert sorted(reopened.columns) == sorted(index.columns)
        new = _mk(spark, NEW_BATCH_1 + NEW_BATCH_2)
        mem = {
            (r.new_doc, r.corpus_doc, round(r.est_jaccard, 6))
            for r in neardup_candidates(new, index).collect()
        }
        disk = {
            (r.new_doc, r.corpus_doc, round(r.est_jaccard, 6))
            for r in neardup_candidates(new, reopened).collect()
        }
        assert mem == disk and mem


class TestIndexIngestStream:
    """Incremental MinHash-index ingestion (r10 verdict stretch):
    signatures are per-document, so streaming shard appends must
    reproduce the batch-built index EXACTLY, and probing each batch
    against the index-so-far must equal the prefix-ordered batch
    composition."""

    SHARD_1 = CORPUS
    SHARD_2 = NEW_BATCH_1 + NEW_BATCH_2

    def _land_and_run(self, spark, tmp_path, shards, **kwargs):
        from garmin_data_pipeline_spark.streaming.dedup import (
            start_index_ingest_stream,
            write_band_index,
        )

        src = tmp_path / "in"
        src.mkdir()
        idx_path = str(tmp_path / "index")
        ckpt = str(tmp_path / "ckpt")
        # cold start: initialize the layout with an EMPTY corpus
        write_band_index(
            build_minhash_band_index(_mk(spark, [])),
            idx_path,
            n_partitions=8,
        )
        for rows in shards:
            _mk(spark, rows).coalesce(1).write.mode("append").parquet(
                str(src)
            )
            q = start_index_ingest_stream(
                spark,
                str(src),
                idx_path,
                ckpt,
                n_partitions=8,
                **kwargs,
            )
            q.awaitTermination(120)
        return idx_path

    def test_streamed_index_equals_batch_build(self, spark, tmp_path):
        from garmin_data_pipeline_spark.streaming.dedup import (
            read_band_index,
        )

        idx_path = self._land_and_run(
            spark, tmp_path, [self.SHARD_1, self.SHARD_2]
        )
        streamed = {
            (r.doc, r.band, r.bucket, tuple(r.signature))
            for r in read_band_index(spark, idx_path).collect()
        }
        batch = {
            (r.doc, r.band, r.bucket, tuple(r.signature))
            for r in build_minhash_band_index(
                _mk(spark, self.SHARD_1 + self.SHARD_2)
            ).collect()
        }
        assert streamed == batch and streamed

    def test_detection_at_ingest_equals_prefix_batches(
        self, spark, tmp_path
    ):
        """Pairs emitted while ingesting shard i must equal the batch
        probe of shard i against shards 1..i-1: shard 1 lands on an
        empty index (zero pairs), shard 2 must rediscover exactly the
        static-detector pairs vs shard 1."""
        pairs_path = str(tmp_path / "pairs")
        self._land_and_run(
            spark,
            tmp_path,
            [self.SHARD_1, self.SHARD_2],
            pairs_path=pairs_path,
        )
        streamed = {
            (r.new_doc, r.corpus_doc, round(r.est_jaccard, 6))
            for r in spark.read.parquet(pairs_path).collect()
        }
        batch = {
            (r.new_doc, r.corpus_doc, round(r.est_jaccard, 6))
            for r in neardup_candidates(
                _mk(spark, self.SHARD_2),
                build_minhash_band_index(_mk(spark, self.SHARD_1)),
            ).collect()
        }
        assert streamed == batch and streamed
