"""Model-based document quality scoring — the industry step beyond
rule filters (VERDICT r11 stretch item 8).

Production pipelines (CCNet, LLaMA, GPT-3's WebText classifier)
distill heuristic quality signals into a TRAINED classifier and score
the corpus with the model. This module provides both halves:

1. **Exact-integer feature vector** (``quality_features_exact``):
   the engineered signals of the t19/t21 families as EXACT INTEGERS —
   ppm-scaled ratios via integer division, the t24 discipline — so a
   fixed-weight linear scorer over them is hash-stable cross-engine:

   * ``f_tokens``   — token count
   * ``f_mwl_ppm``  — mean word length (ppm)
   * ``f_stop_ppm`` — stopword ratio (ppm)
   * ``f_dist_ppm`` — distinct-token ratio (ppm)
   * ``f_dup2_ppm`` — duplicate-2-gram fraction (ppm)

2. **Fixed-weight linear scorer** (``linear_quality_score``): the
   deterministic closed-form-weights TWIN (the v9p grid-book recipe)
   — integer weights dotted with the integer features, plus one
   exact hinge term centering mean word length; ``keep = score >= 0``.
   This is what the ``t26_quality_linear_score`` driver row
   hash-certifies against a DuckDB oracle. The shipped weights are a
   hand-distillation of the t19 Gopher gates into one linear form.

3. **The trained path** (``train_quality_classifier``): pyspark.ml
   LogisticRegression over the same features (double-cast) against
   t19's rule verdicts as labels — classic filter distillation.
   Behind the repo's import-guard posture (similarity.py:307's
   pattern); the pytest pin asserts holdout agreement with the rule
   labels rather than bit-equality (LBFGS coefficients are
   float-path-dependent — stated, not fudged; the DETERMINISM burden
   stays on the fixed-weight twin).

100 TB shape: features and scoring are pure row-local column
expressions (zero shuffle, no UDF); training fits on a SAMPLE (the
model is tiny — one weight per feature) and scoring broadcasts
nothing at all since the weights are plan constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators.text import (
    shingles,
    stopword_hits,
    tokens,
)

PPM = 1_000_000

# Hand-distilled linear form of the t19 Gopher gates (integer ppm
# domain). Signs follow the rules: stopwords and lexical diversity
# are quality-positive, 2-gram repetition and mean-word-length
# distance from the English-prose center (MWL_CENTER below, ~4
# chars) are negative; the bias sets the keep threshold at
# score >= 0.
WEIGHTS = {
    "f_stop_ppm": 6,
    "f_dist_ppm": 2,
    "f_dup2_ppm": -4,
    "f_mwl_center_ppm": -1,  # applied to |f_mwl_ppm - MWL_CENTER|
    "bias": -1_200_000,
}
# English prose mean word length sits near 4 chars (stopwords pull
# it down); the hinge penalizes distance from that center
MWL_CENTER = 4_000_000


def quality_features_exact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-doc engineered quality features as exact integers
    (ppm-scaled via integer div — hash-stable cross-engine)."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    n_pairs = n - 1
    sum_len = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_distinct = F.size(F.array_distinct(t))
    sw = stopword_hits(t, "en")
    n_sh2 = F.size(shingles(F.col(text_col), 2))
    # ppm ratios via SQL `div` over guarded denominators (the t24
    # exact-integer discipline): numerators are zeroed when the
    # denominator is degenerate, so the greatest(…, 1) guard never
    # changes a real value — it only keeps `div` total
    return df.select(
        F.col(id_col),
        n.cast("long").alias("f_tokens"),
        # widen to long BEFORE the ppm multiply: int * 1e6 overflows
        # int32, and ANSI mode makes that a job-killing error
        F.when(n > 0, sum_len.cast("long") * PPM)
        .otherwise(F.lit(0).cast("long"))
        .alias("__mwl_num"),
        F.when(n > 0, sw.cast("long") * PPM)
        .otherwise(F.lit(0).cast("long"))
        .alias("__stop_num"),
        F.when(n > 0, n_distinct.cast("long") * PPM)
        .otherwise(F.lit(0).cast("long"))
        .alias("__dist_num"),
        F.when(
            n_pairs > 0, (n_pairs - n_sh2).cast("long") * PPM
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("__dup2_num"),
        F.greatest(n.cast("long"), F.lit(1)).alias("__n"),
        F.greatest(n_pairs.cast("long"), F.lit(1)).alias("__np"),
    ).select(
        id_col,
        "f_tokens",
        F.expr("__mwl_num div __n").alias("f_mwl_ppm"),
        F.expr("__stop_num div __n").alias("f_stop_ppm"),
        F.expr("__dist_num div __n").alias("f_dist_ppm"),
        F.expr("__dup2_num div __np").alias("f_dup2_ppm"),
    )


def linear_quality_score(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Score docs with the fixed-weight linear model (exact integer
    arithmetic end to end); ``keep = score >= 0``."""
    w = WEIGHTS
    feats = quality_features_exact(df, id_col, text_col)
    score = (
        F.lit(w["f_stop_ppm"]) * F.col("f_stop_ppm")
        + F.lit(w["f_dist_ppm"]) * F.col("f_dist_ppm")
        + F.lit(w["f_dup2_ppm"]) * F.col("f_dup2_ppm")
        + F.lit(w["f_mwl_center_ppm"])
        * F.abs(F.col("f_mwl_ppm") - F.lit(MWL_CENTER))
        + F.lit(w["bias"])
    ).cast("long")
    return feats.select(
        id_col,
        "f_tokens",
        "f_mwl_ppm",
        "f_stop_ppm",
        "f_dist_ppm",
        "f_dup2_ppm",
        score.alias("score"),
        (score >= 0).cast("int").alias("keep"),
    )


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
):
    """Distill rule labels into a LogisticRegression over the exact
    features (double-cast for the optimizer). Returns the fitted
    pyspark.ml model; raises NotImplementedError without pyspark.ml
    (the repo's import-guard posture). No seed parameter: LBFGS is
    deterministic given the data (no sampling step here), so a seed
    would only mislead callers about what they control (ADVICE r12).
    """
    try:
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import VectorAssembler
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "pyspark.ml unavailable; use linear_quality_score's "
            "fixed-weight twin instead"
        ) from exc

    feats = quality_features_exact(df, id_col, text_col).join(
        df.select(id_col, label_col), id_col
    )
    cols = [
        "f_tokens", "f_mwl_ppm", "f_stop_ppm", "f_dist_ppm",
        "f_dup2_ppm",
    ]
    assembled = VectorAssembler(
        inputCols=cols, outputCol="features"
    ).transform(
        feats.select(
            id_col,
            *[F.col(c).cast("double").alias(c) for c in cols],
            F.col(label_col).cast("double").alias("label"),
        )
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=50,
        regParam=0.01,
        standardization=True,
    )
    return lr.fit(assembled)
