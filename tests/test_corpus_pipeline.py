"""The composed corpus-production pipeline (pipelines/corpus.py —
r13 verdict directive 7): stage-wiring differentials plus a DuckDB
replay of the back half (mixture → split → packing) over the
materialized mid-corpus, composing the registered stage oracles'
SQL shapes one level up (the e2e recipe)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.pipelines import corpus as C


@pytest.fixture(scope="module")
def stages(spark, sf_dir):
    return C.corpus_stages(spark, sf_dir)


class TestStageWiring:
    def test_survivors_match_certified_crawl_output(
        self, spark, sf_dir, stages
    ):
        """Stage 1 == the registered (hash-certified) e2e_crawl_mc
        relation, independently re-derived: canonical rows, fetch id
        → doc id (div 10), inner-joined to the source relation."""
        from garmin_data_pipeline_spark.plans import QUERIES

        crawl = {
            r["doc_id"] // 10: r["lang"]
            for r in QUERIES["e2e_crawl_mc"]
            .fn(spark, sf_dir)
            .collect()
            if r["is_canonical"] == 1
        }
        got = {
            r["doc_id"]: r["lang"]
            for r in stages["survivors"].collect()
        }
        assert got == crawl

    def test_monotone_filtering_chain(self, stages):
        """Each filtering stage only removes rows, never invents or
        mutates ids; excision preserves the id set exactly."""
        ids = {
            k: {r["doc_id"] for r in stages[k].select("doc_id").collect()}
            for k in (
                "survivors", "train", "deduped", "excised",
                "clean", "gated",
            )
        }
        assert ids["train"] <= ids["survivors"]
        assert all(i % 10 != 0 for i in ids["train"])
        assert ids["deduped"] <= ids["train"]
        assert ids["excised"] == ids["deduped"]
        assert ids["clean"] <= ids["excised"]
        assert ids["gated"] <= ids["clean"]

    def test_deduped_matches_independent_retention(self, stages):
        """Stage 2 == d7's retention machinery applied independently
        to the stage-1 output (catches wiring that would run the
        dedup against the wrong relation)."""
        want = {
            r["doc_id"]
            for r in C.near_dup_retention(stages["train"])
            .select("doc_id")
            .collect()
        }
        got = {r["doc_id"] for r in stages["deduped"].collect()}
        assert got == want

    def test_gated_docs_pass_trained_model(self, stages):
        from garmin_data_pipeline_spark.operators.quality_model import (
            trained_quality_score,
        )

        scored = trained_quality_score(
            stages["clean"], "doc_id", "text"
        )
        want = {
            r["doc_id"]
            for r in scored.filter(F.col("keep") == 1).collect()
        }
        got = {r["doc_id"] for r in stages["gated"].collect()}
        assert got == want

    def test_split_is_leak_safe_per_doc(self, stages):
        per_doc = (
            stages["final"]
            .groupBy("doc_id")
            .agg(F.countDistinct("split").alias("n"))
            .collect()
        )
        assert per_doc and all(r["n"] == 1 for r in per_doc)

    def test_copies_unique_and_indexed_from_one(self, stages):
        rows = stages["final"].select("doc_id", "copy_idx").collect()
        pairs = [(r["doc_id"], r["copy_idx"]) for r in rows]
        assert len(pairs) == len(set(pairs))
        by_doc: dict[int, list[int]] = {}
        for d, c in pairs:
            by_doc.setdefault(d, []).append(c)
        for d, cs in by_doc.items():
            assert sorted(cs) == list(range(1, len(cs) + 1)), d

    def test_packing_matches_pandas_replay(self, stages):
        """t6b's bin rule replayed in pure pandas: exclusive-prefix
        cumsum floor per (split, doc_id%64) shard in (doc_id,
        copy_idx) order, shard offsets by ascending shard string —
        an engine-independent differential on the final bin ids."""
        rows = sorted(
            (
                (r["split"], r["doc_id"] % C.PACK_SHARDS,
                 r["doc_id"], r["copy_idx"], r["n_tokens"],
                 r["bin_id"])
                for r in stages["final"].collect()
            ),
        )
        shards: dict[str, list] = {}
        for split, sh, d, c, n, b in rows:
            shards.setdefault(f"{split}#{sh}", []).append((d, c, n, b))
        offset, want = 0, {}
        for shard in sorted(shards):
            cum = 0
            max_local = 0
            for d, c, n, b in sorted(shards[shard]):
                local = cum // C.PACK_BUDGET
                max_local = max(max_local, local)
                want[(d, c)] = offset + local
                cum += n
            offset += max_local + 1
        got = {(d, c): b for _, _, d, c, n, b in rows}
        assert got == want


class TestBackHalfOracle:
    def test_mix_split_pack_matches_duckdb(self, spark, stages):
        """The back half (t24 mixture → t13 split → t6b packing)
        replayed in DuckDB over the materialized mid-corpus, using
        the SAME SQL shapes the three stage oracles certify — the
        composed-oracle differential one level up."""
        from garmin_data_pipeline_spark.operators.dedup_scale import (
            sql_base_hash32,
        )
        from garmin_data_pipeline_spark.operators.sampling import (
            _cutoff,
        )
        from garmin_data_pipeline_spark.operators.text import (
            sql_tokens,
        )

        gated = stages["gated"].select(
            "doc_id", "text", "source"
        ).toPandas()
        mix_hash = sql_base_hash32(
            "CAST(doc_id AS VARCHAR) || '#mix-v1'"
        )
        split_hash = sql_base_hash32(
            "CAST(doc_id AS VARCHAR) || '#split-v1'"
        )
        cuts = []
        cum = 0.0
        names = list(C.SPLITS)
        for name, frac in list(C.SPLITS.items())[:-1]:
            cum += frac
            cuts.append((name, _cutoff(cum, 10_000)))
        case = " ".join(
            f"WHEN h_split < {cut} THEN '{name}'"
            for name, cut in cuts
        )
        con = duckdb.connect()
        con.register("gated", gated)
        oracle = con.execute(
            f"""
            WITH d AS (
                SELECT doc_id, source AS bucket, text FROM gated
            ), stats AS (
                SELECT bucket, COUNT(*) AS c FROM d GROUP BY bucket
            ), s2 AS (
                SELECT bucket, c,
                       CAST(FLOOR(SQRT(c::DOUBLE) * 1000000)
                            AS HUGEINT) AS s_int
                FROM stats
            ), tot AS (
                SELECT SUM(c) AS total, SUM(s_int) AS denom FROM s2
            ), rates AS (
                SELECT bucket,
                       (s_int * total * 1000000)
                           // (denom * c::HUGEINT) AS r_ppm
                FROM s2, tot
            ), mixed AS (
                SELECT d.*, r.r_ppm,
                       {mix_hash} % 1000000 AS h_mix
                FROM d JOIN rates r USING (bucket)
            ), copies AS (
                SELECT doc_id, bucket AS source, text,
                       CAST(copy_idx AS BIGINT) AS copy_idx
                FROM mixed,
                     LATERAL (
                        SELECT unnest(range(1, CAST(
                            1 + r_ppm // 1000000
                              + CASE WHEN h_mix < r_ppm % 1000000
                                     THEN 1 ELSE 0 END
                            AS BIGINT))) AS copy_idx
                     )
            ), spl AS (
                SELECT *,
                       CASE {case} ELSE '{names[-1]}' END AS split
                FROM (
                    SELECT *, {split_hash} % 10000 AS h_split
                    FROM copies
                )
            ), sized AS (
                SELECT doc_id, source, copy_idx, split,
                       CAST(len({sql_tokens("text")}) AS BIGINT)
                           AS n_tokens,
                       split || '#' || CAST(doc_id % {C.PACK_SHARDS}
                           AS VARCHAR) AS shard
                FROM spl
            ), local AS (
                SELECT *,
                       CAST(floor(COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY shard
                           ORDER BY doc_id, copy_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING
                       ), 0) / {C.PACK_BUDGET}) AS BIGINT)
                           AS local_bin
                FROM sized
            ), counts AS (
                SELECT shard, MAX(local_bin) + 1 AS n_bins
                FROM local GROUP BY shard
            ), offsets AS (
                SELECT shard, CAST(COALESCE(SUM(n_bins) OVER (
                    ORDER BY shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS off
                FROM counts
            )
            SELECT l.doc_id, l.source, l.copy_idx, l.split,
                   l.n_tokens, CAST(l.local_bin + o.off AS BIGINT)
                       AS bin_id
            FROM local l JOIN offsets o USING (shard)
            """
        ).fetchall()
        want = {tuple(r) for r in oracle}
        got = {
            (
                r["doc_id"], r["source"], r["copy_idx"], r["split"],
                r["n_tokens"], r["bin_id"],
            )
            for r in stages["final"].collect()
        }
        assert got == want


class TestExport:
    def test_run_corpus_round_trip(self, spark, sf_dir, tmp_path):
        out = str(tmp_path / "corpus")
        counts = C.run_corpus(spark, sf_dir, out)
        back = spark.read.parquet(out)
        assert set(counts) <= set(C.SPLITS)
        assert sum(counts.values()) == back.count()
        assert {"doc_id", "split", "bin_id", "text"} <= set(
            back.columns
        )


class TestTrainedLangidSeat:
    def test_trained_langid_swap_changes_only_lang(
        self, spark, sf_dir, stages
    ):
        """use_trained_langid=True: same survivor ids/text/source,
        the lang column re-projected through the quantized t28
        model (the r13 verdict's optional directive-3 seat swap) —
        and the values agree with langid_model_score applied
        independently."""
        from garmin_data_pipeline_spark.operators.langid_model import (
            langid_model_score,
        )

        swapped = C.crawl_survivors(
            spark, sf_dir, use_trained_langid=True
        )
        base = {
            r["doc_id"]: (r["text"], r["source"])
            for r in stages["survivors"].collect()
        }
        got = {
            r["doc_id"]: (r["text"], r["source"], r["lang"])
            for r in swapped.collect()
        }
        assert set(got) == set(base)
        assert all(
            got[d][:2] == base[d] for d in base
        ), "ids/text/source must be untouched"
        want = {
            r["doc_id"]: r["lang"]
            for r in langid_model_score(
                stages["survivors"], "doc_id", "text"
            ).collect()
        }
        assert all(got[d][2] == want[d] for d in got)
