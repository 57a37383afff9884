"""The full corpus-production composition (r13 verdict directive 7):
every certified stage of the training-data pipeline chained into ONE
runner-level pass —

    crawl front-end (e2e_crawl_mc: WARC → URL canonicalize/dedup →
    main-content blocks → langID → Gopher gates → exact-dedup
    annotation)
      → near-dup retention (d7: Jaccard pairs → connected components
        → one representative per cluster)
      → substring excision (d10x spans, APPLIED to the token stream)
      → benchmark decontamination (c2: 8-gram inverted-index scan
        against the held-out eval docs, LEFT ANTI purge)
      → trained quality gate (t26b quantized model, keep = score>=0)
      → temperature mixture (t24, alpha=0.5 over sources)
      → train/val/test split (t13 salted-hash, leak-safe by doc)
      → sharded sequence packing (t6b two-level bin assignment)
      → sharded parquet export partitioned by split.

Every stage is the SAME operator its registered driver row
hash-certifies (this module adds wiring, not logic); the composition
is differential-tested in tests/test_corpus_pipeline.py two ways —
each intermediate equals the stage operator applied independently,
and the back half (gate → mixture → split → packing) replays against
a composed DuckDB oracle over the materialized mid-corpus.

Run it: ``python -m garmin_data_pipeline_spark corpus <sf_dir>
<out_dir>`` (CRAWL.md walks through the single command).

100 TB shape: the stages keep their certified shapes (bounded
per-doc aggregates, broadcast joins of small relations, partitioned
windows, one partial-aggregating shuffle per corpus-keyed groupBy);
the chain materializes nothing except the final export — it is one
lazy Catalyst plan per stage boundary, with the two relations that
feed multiple consumers (the crawl annotation, the span table)
carried by the same lazy-checkpoint device the e2e rows certify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The stage constants ARE the registered queries' constants — one
# source of truth, so the composition cannot drift from the
# certified rows.
EXCISION_K = 8
CONTAM_N = 8
CONTAM_MAX_DF = 50  # _C1_MAX_DF
CONTAM_MIN_SHARED = 3  # _C2_MIN_SHARED
JACCARD_N = 3
JACCARD_THRESHOLD = 0.5
JACCARD_MAX_DF = 50  # _D2_MAX_DF
PACK_BUDGET = 2048
PACK_SHARDS = 64
SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def crawl_survivors(
    spark: SparkSession,
    sf_dir: str,
    use_trained_langid: bool = False,
) -> DataFrame:
    """Stage 1 — the certified crawl front-end: e2e_crawl_mc's
    canonical survivors mapped back to source doc ids. Planted ids
    are doc_id*10 + class (0 base / 1 mirror); RE-CRAWL rows carry
    the BASE identity (recovered from the canonical URL path), so
    every text-hash group contains its base id (a mirror only
    exists alongside its same-text base) and canonical_id =
    min(group) always lands on residue 0 — the `div 10` below is
    exact. Integer div, NOT `/` (double division would round past
    2^53 — the scale-aliasing class ADVICE r13 closed; r14 review).
    Re-joined to the source relation for text/source metadata;
    returns (doc_id, text, lang, source).

    ``use_trained_langid=True`` swaps the crawl annotation's
    stopword-heuristic language into the TRAINED quantized t28
    model's prediction over the survivor text (the r13 verdict's
    optional directive-3 seat swap) — a zero-shuffle row-local
    re-projection, nothing upstream changes."""
    from garmin_data_pipeline_spark.plans.llm_queries import (
        e2e_crawl_mc,
    )
    from garmin_data_pipeline_spark.plans.registry import table

    crawl = e2e_crawl_mc(spark, sf_dir)
    surv = crawl.filter(F.col("is_canonical") == 1).select(
        F.expr("doc_id div 10").alias("doc_id"),
        F.col("lang").alias("crawl_lang"),
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # the survivor set is gate-filtered (a fraction of the corpus);
    # the join back for text is by the corpus key — sort-merge under
    # AQE, broadcast when the survivor relation is small enough
    out = docs.join(surv, "doc_id").select(
        "doc_id", "text", F.col("crawl_lang").alias("lang"), "source"
    )
    if use_trained_langid:
        from garmin_data_pipeline_spark.operators.langid_model import (
            langid_model_score,
        )

        model_lang = langid_model_score(
            out, "doc_id", "text"
        ).select("doc_id", F.col("lang").alias("model_lang"))
        out = (
            out.drop("lang")
            .join(model_lang, "doc_id")
            .withColumnRenamed("model_lang", "lang")
            .select("doc_id", "text", "lang", "source")
        )
    return out


def near_dup_retention(corpus: DataFrame) -> DataFrame:
    """Stage 2 — d7's retention: Jaccard pair graph → connected
    components → keep one representative per cluster (text_len DESC,
    doc_id), singletons keep themselves."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        ngram_jaccard_pairs,
    )
    from garmin_data_pipeline_spark.operators.graph import (
        duplicate_groups,
    )
    from garmin_data_pipeline_spark.plans.llm_queries import (
        _canonical_pick,
    )

    pairs = ngram_jaccard_pairs(
        corpus,
        "doc_id",
        "text",
        n=JACCARD_N,
        threshold=JACCARD_THRESHOLD,
        max_df=JACCARD_MAX_DF,
    )
    groups = duplicate_groups(pairs, "doc_a", "doc_b")
    kept = _canonical_pick(corpus, groups).select(
        F.col("kept_doc").alias("doc_id")
    )
    return corpus.join(kept, "doc_id")


def apply_substring_excision(corpus: DataFrame) -> DataFrame:
    """Stage 3 — the d10x ACTION: excise every non-canonical
    occurrence of a cross-doc-duplicated EXCISION_K-token window
    from the token stream. Docs with no spans keep their original
    text byte-for-byte; excised docs are rebuilt from the surviving
    tokens (space-joined — the excision operates on the token
    stream, Lee et al.'s granularity; stated, not fudged). Span
    lists are per-doc bounded, so the rebuild is a bounded array
    expression, never corpus-shaped."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        substring_excision_spans,
    )

    spans = substring_excision_spans(
        corpus, "doc_id", "text", k=EXCISION_K
    )
    span_sets = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("span_start", "span_end")
        ).alias("__spans")
    )
    rebuilt = F.expr(
        "array_join(filter(transform(__toks, (t, i) -> "
        "IF(exists(__spans, s -> i + 1 BETWEEN s.span_start AND "
        "s.span_end), NULL, t)), x -> x IS NOT NULL), ' ')"
    )
    from garmin_data_pipeline_spark.operators.text import tokens

    # NO broadcast hint: span_sets is one row per doc carrying any
    # duplicated window — corpus-fraction-sized on real web data
    # (Lee et al. excise whole percents of tokens), so forcing a
    # broadcast would OOM at exactly the scale this module targets
    # (r14 review finding). AQE picks broadcast when it truly fits.
    return (
        corpus.join(span_sets, "doc_id", "left")
        .withColumn("__toks", tokens(F.col("text")))
        .withColumn(
            "text",
            F.when(F.col("__spans").isNull(), F.col("text"))
            .otherwise(rebuilt),
        )
        .drop("__spans", "__toks")
    )


def decontaminate(
    corpus: DataFrame, eval_docs: DataFrame
) -> DataFrame:
    """Stage 4 — c2: drop every corpus doc sharing >=
    CONTAM_MIN_SHARED distinct CONTAM_N-gram fingerprints with the
    held-out eval set (inverted-index scan, never pair enumeration);
    the flagged set is small → broadcast LEFT ANTI."""
    from garmin_data_pipeline_spark.operators.contamination import (
        ngram_contamination,
    )

    flagged = ngram_contamination(
        corpus.select("doc_id", "text"),
        eval_docs.select("doc_id", "text"),
        n=CONTAM_N,
        max_df=CONTAM_MAX_DF,
    ).filter(F.col("shared_ngrams") >= CONTAM_MIN_SHARED)
    return corpus.join(
        F.broadcast(flagged.select("doc_id")), "doc_id", "left_anti"
    )


def quality_gate(corpus: DataFrame) -> DataFrame:
    """Stage 5 — t26b: the quantized TRAINED quality model; keep =
    score >= 0. Row-local integer expressions, weights are plan
    constants."""
    from garmin_data_pipeline_spark.operators.quality_model import (
        trained_quality_score,
    )

    scored = trained_quality_score(corpus, "doc_id", "text")
    return corpus.join(
        scored.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    )


def mix_split_pack(corpus: DataFrame) -> DataFrame:
    """Stages 6-8 — t24 temperature mixture over sources (emits
    copy_idx per retained copy), t13 salted-hash split KEYED BY
    doc_id (every copy of a doc lands in one split — leak-safe),
    and t6b two-level sharded packing per (split, shard) with the
    certified budget. Returns the manifest: doc_id, source, lang,
    split, copy_idx, n_tokens, bin_id, text."""
    from garmin_data_pipeline_spark.operators.sampling import (
        hash_split,
        pack_sequences_sharded,
        temperature_mixture,
    )
    from garmin_data_pipeline_spark.operators.text import token_count

    mixed = temperature_mixture(
        corpus, "doc_id", "source", alpha=0.5
    )
    split = hash_split(mixed, "doc_id", SPLITS)
    sized = split.withColumn(
        "n_tokens", token_count(F.col("text")).cast("long")
    ).withColumn(
        "__pack_shard",
        F.concat(
            F.col("split"),
            F.lit("#"),
            F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast(
                "string"
            ),
        ),
    )
    packed = pack_sequences_sharded(
        sized,
        "n_tokens",
        PACK_BUDGET,
        "__pack_shard",
        ["doc_id", "copy_idx"],
    )
    return packed.select(
        "doc_id",
        "source",
        "lang",
        "split",
        "copy_idx",
        "n_tokens",
        "bin_id",
        "text",
    )


def corpus_stages(
    spark: SparkSession,
    sf_dir: str,
    use_trained_langid: bool = False,
) -> dict[str, DataFrame]:
    """Every stage boundary as a DataFrame — the differential test's
    hook (and a debugging surface). ``final`` is the export-ready
    manifest."""
    from garmin_data_pipeline_spark.plans.registry import table

    surv = crawl_survivors(
        spark, sf_dir, use_trained_langid=use_trained_langid
    )
    # the held-out eval docs (the c1/c2 convention) are excluded
    # from the train corpus BEFORE decontamination scans against
    # them
    train = surv.filter(F.col("doc_id") % 10 != 0)
    eval_docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    deduped = near_dup_retention(train)
    excised = apply_substring_excision(deduped)
    clean = decontaminate(excised, eval_docs)
    gated = quality_gate(clean)
    final = mix_split_pack(gated)
    return {
        "survivors": surv,
        "train": train,
        "deduped": deduped,
        "excised": excised,
        "clean": clean,
        "gated": gated,
        "final": final,
    }


def build_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call composition: export-ready manifest DataFrame."""
    return corpus_stages(spark, sf_dir)["final"]


def run_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, int]:
    """Build and EXPORT: sharded parquet partitioned by split.
    Returns per-split row counts (the dataset-card numbers)."""
    final = build_corpus(spark, sf_dir)
    final.write.mode("overwrite").partitionBy("split").parquet(
        out_dir
    )
    out = spark.read.parquet(out_dir)
    return {
        r["split"]: r["n"]
        for r in out.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
