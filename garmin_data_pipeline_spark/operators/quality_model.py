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
    shingles_from_tokens,
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

# --- The TRAINED model, quantized (r12 verdict directive 7) ----------
# The pyspark.ml LogisticRegression distillation was pytest-only
# because LBFGS floats can't be oracle-hashed. Quantizing the FITTED
# coefficients to integers at WEIGHT_SCALE makes the trained model a
# set of plan constants — scoring runs through the same exact-integer
# path as the hand-distilled twin, so a DuckDB oracle certifies the
# trained model end to end (t26b_quality_trained_score).
#
# Provenance (regenerate with fit_and_quantize below): fitted on
# /root/testdata/sf0.01 `documents` with labels =
# linear_quality_score keep (classic filter distillation),
# LogisticRegression(maxIter=50, regParam=0.01, standardization=True)
# under pyspark 4.1.2; a same-session refit reproduces the
# coefficients bit-identically (LBFGS is deterministic given the
# data). Float coefficients at fit time:
#   f_tokens  -3.231366526278317e-02
#   f_mwl_ppm -7.052048843533655e-06
#   f_stop_ppm 3.641647065816397e-05
#   f_dist_ppm 1.0121981636489719e-05
#   f_dup2_ppm -2.6433115532956834e-05
#   intercept  23.333144918932796
# Quantization error bound: |score_q - SCALE*score_f| <=
# 0.5*(sum|x|+1) ~ 6e6 against typical |score_q| ~ 1e13 — only
# razor-borderline docs can flip keep; the pytest pin measures the
# actual agreement.
WEIGHT_SCALE = 10**12
TRAINED_WEIGHTS = {
    "f_tokens": -32_313_665_263,
    "f_mwl_ppm": -7_052_049,
    "f_stop_ppm": 36_416_471,
    "f_dist_ppm": 10_121_982,
    "f_dup2_ppm": -26_433_116,
    "bias": 23_333_144_918_933,
}


def quality_features_exact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-doc engineered quality features as exact integers
    (ppm-scaled via integer div — hash-stable cross-engine).

    r14 optimization (guide §1.2 step 2): tokenize ONCE into a
    column and derive every feature from it. The feature subtrees
    sit inside when-branches (exempt from codegen subexpression
    elimination), so inlining ``tokens(text)`` re-ran the tokenizer
    regex per feature; the projection barrier survives because
    CollapseProject refuses to duplicate a non-cheap alias used more
    than once. Values are untouched — same trees over the same
    array."""
    df = df.withColumn("__toks", tokens(F.col(text_col)))
    t = F.col("__toks")
    n = F.size(t)
    n_pairs = n - 1
    sum_len = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_distinct = F.size(F.array_distinct(t))
    sw = stopword_hits(t, "en")
    n_sh2 = F.size(shingles_from_tokens(t, 2))
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


def quantize_lr_model(model) -> dict[str, int]:
    """Round a fitted LogisticRegression's coefficients (original
    feature space — Spark destandardizes) to WEIGHT_SCALE integers:
    the trained model as oracle-certifiable plan constants."""
    cols = [
        "f_tokens", "f_mwl_ppm", "f_stop_ppm", "f_dist_ppm",
        "f_dup2_ppm",
    ]
    out = {
        c: round(float(w) * WEIGHT_SCALE)
        for c, w in zip(cols, model.coefficients)
    }
    out["bias"] = round(float(model.intercept) * WEIGHT_SCALE)
    return out


def fit_and_quantize(
    df: DataFrame, id_col: str, text_col: str
) -> dict[str, int]:
    """Distill the rule labels into LR and quantize — the one call
    that regenerates TRAINED_WEIGHTS (run it on sf0.01 documents)."""
    labeled = df.join(
        linear_quality_score(df, id_col, text_col).select(
            id_col, F.col("keep").alias("__label")
        ),
        id_col,
    )
    model = train_quality_classifier(
        labeled, id_col, text_col, "__label"
    )
    return quantize_lr_model(model)


def trained_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Score docs with the quantized TRAINED model (default:
    :data:`TRAINED_WEIGHTS`) — exact integer arithmetic end to end,
    the same feature path as the fixed-weight twin; ``keep = score
    >= 0``. Magnitudes: ratio features are ppm (≤ 1e6) except
    f_mwl_ppm (1e6 × mean word length) and f_tokens; with |w| <
    4e10 the sum stays far inside BIGINT for any document whose mean
    word length is under ~1e5 chars and token count under ~1e7 —
    beyond either is not a document, and under ANSI both engines
    would error identically rather than wrap."""
    w = TRAINED_WEIGHTS if weights is None else weights
    feats = quality_features_exact(df, id_col, text_col)
    score = (
        F.lit(w["f_tokens"]) * F.col("f_tokens")
        + F.lit(w["f_mwl_ppm"]) * F.col("f_mwl_ppm")
        + F.lit(w["f_stop_ppm"]) * F.col("f_stop_ppm")
        + F.lit(w["f_dist_ppm"]) * F.col("f_dist_ppm")
        + F.lit(w["f_dup2_ppm"]) * F.col("f_dup2_ppm")
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
