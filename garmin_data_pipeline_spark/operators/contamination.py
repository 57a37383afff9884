"""Cross-corpus contamination detection (train/test n-gram overlap) —
the decontamination step of an LLM training-data pipeline
(BASELINE.json north-star addition; no reference counterpart).

Benchmarks leak into web-scale training corpora, so before training
you scan the training set for documents sharing long word n-grams
with any evaluation document, and drop or flag them. The standard
config is 8-gram overlap (long enough that a shared shingle is
evidence of copying, not coincidence).

Scale design: this is the d2 inverted-index shape WITHOUT the
quadratic self-join risk — the index is built over the (small)
evaluation corpus and probed by the (huge) training corpus, so join
rows are O(shared shingles), never O(docs^2). The ``max_df`` cap
drops boilerplate shingles (licence headers, navigation chrome) that
would otherwise fan out: a shingle present in k eval docs and m train
docs emits k x m rows. Everything is explode / join / hash-aggregate
with map-side partials — no Python, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators.text import shingles


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_df: int | None = None,
) -> DataFrame:
    """Flag TRAIN documents sharing >= 1 distinct word ``n``-gram with
    any TEST (evaluation) document.

    Returns one row per contaminated train doc:
    ``(doc_id, shared_ngrams, test_docs, ngram_total, overlap_frac)``
    — distinct shared shingles, distinct eval docs hit, the train
    doc's own distinct-shingle count, and shared/total (the drop/keep
    score; 6-decimal rounded for cross-engine hashing). Clean train
    docs emit nothing (inner join — at scale the contaminated set is
    tiny and this is the set you act on).

    ``max_df`` caps a shingle's TEST-side document frequency before
    the join (stop-shingle guard — boilerplate appearing across the
    eval corpus would fan out against every train doc containing it).
    """
    # Lazy checkpoint: the exploded TRAIN shingles (the big side) feed
    # both the index join and the per-doc totals; one scan + tokenize
    # pass, not two. ``shingles()`` emits DISTINCT shingles per doc,
    # so counting tr rows IS the doc's distinct-n-gram total — docs
    # with zero shingles drop out of tr, but they also cannot appear
    # in ``hits`` (inner join), so the totals join never misses.
    tr = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(text_col, n)).alias("s"),
    ).localCheckpoint(eager=False)
    te = test.select(
        F.col(id_col).alias("test_id"),
        F.explode(shingles(text_col, n)).alias("s"),
    )
    if max_df is not None:
        keep = (
            te.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("s")
        )
        te = te.join(keep, "s")
    totals = tr.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ngram_total")
    )
    hits = (
        tr.join(te, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("shared_ngrams"),
            F.countDistinct("test_id").alias("test_docs"),
        )
    )
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id",
            "shared_ngrams",
            "test_docs",
            "ngram_total",
            F.round(
                F.col("shared_ngrams") / F.col("ngram_total"), 6
            ).alias("overlap_frac"),
        )
    )


def span_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """SPAN-level decontamination: per TRAIN document, the maximal
    token spans that verbatim-match any k-token window of the
    evaluation corpus — the exact-substring upgrade of
    :func:`ngram_contamination` (which reports per-doc overlap
    counts but not WHERE the leak sits), and the benchmark-
    decontamination procedure of the GPT-3/PaLM appendices (drop or
    excise training text containing an eval n-gram) made relational.

    Shape: the eval side collapses to its DISTINCT window-hash SET
    (positions don't matter on the reference side) — eval corpora
    are a few thousand documents against a 100 TB train side, so
    this relation broadcasts and the train scan is ONE pass: build
    positional windows (pure column expressions, the d10 kit),
    semi-join on hash against the broadcast eval set, merge adjacent
    hit positions into maximal spans with the pos - row_number
    island trick. No aggregate over the train side's hashes at all —
    unlike d10, the duplicated-window predicate here is membership
    in the (small) eval set, so the only wide operation is the final
    per-doc island aggregate.

    Output: (doc_id, span_start, span_end, span_len, n_windows) in
    1-based token coordinates — feed to an excision/drop policy.
    """
    from pyspark.sql import Window

    from garmin_data_pipeline_spark.operators.dedup_scale import (
        positional_windows,
    )

    eval_set = (
        test.select(
            F.explode(
                positional_windows(F.col(text_col), k)
            ).alias("win")
        )
        .select(F.md5("win").alias("h"))
        .distinct()
    )
    wins = train.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            positional_windows(F.col(text_col), k)
        ).alias("pos0", "win"),
    ).select(
        "doc",
        (F.col("pos0") + 1).alias("pos"),
        F.md5("win").alias("h"),
    )
    hits = wins.join(F.broadcast(eval_set), "h", "left_semi")
    grp = (
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc").orderBy("pos")
        )
    ).alias("grp")
    return (
        hits.select("doc", "pos", grp)
        .groupBy("doc", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_len"),
            "n_windows",
        )
    )
