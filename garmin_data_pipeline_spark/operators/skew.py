"""Skew-resilient aggregation via salting (SURVEY.md §4 scale notes).

A hash aggregation on a hot key concentrates one reducer; AQE's skew
handling covers joins but a pathological groupBy key still lands on a
single task. Classic fix: salt the key, aggregate twice.

Stage 1 groups on (key, salt) — the hot key's rows spread over
``buckets`` reducers; stage 2 combines the per-salt partials. Both
stages are algebraic (sum/count/min/max combine losslessly; avg is
derived as sum/count at the end), so the result is identical to the
direct aggregate.

The salt must be deterministic for reproducible runs: it's the hash of
a caller-named unique column, not ``rand()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# final-stage combiner per algebraic aggregate
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps column -> one of sum/count/min/max/avg. ``salt_col``
    is any well-distributed column (an id); its hash mod ``buckets``
    spreads each group across reducers in stage 1.

    Output column names are ``<agg>_<col>`` (e.g. ``sum_value``).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    salted = df.withColumn("__salt", salt)

    partial_exprs = []
    for col, how in aggs.items():
        if how == "avg":
            partial_exprs.append(F.sum(col).alias(f"__sum_{col}"))
            partial_exprs.append(F.count(col).alias(f"__cnt_{col}"))
        elif how == "count":
            partial_exprs.append(F.count(col).alias(f"__p_count_{col}"))
        elif how in _COMBINE:
            partial_exprs.append(
                getattr(F, how)(col).alias(f"__p_{how}_{col}")
            )
        else:
            raise ValueError(f"unsupported agg: {how}")
    stage1 = salted.groupBy(*keys, "__salt").agg(*partial_exprs)

    final_exprs = []
    for col, how in aggs.items():
        if how == "avg":
            final_exprs.append(
                (F.sum(f"__sum_{col}") / F.sum(f"__cnt_{col}")).alias(
                    f"avg_{col}"
                )
            )
        elif how == "count":
            final_exprs.append(
                F.sum(f"__p_count_{col}").alias(f"count_{col}")
            )
        else:
            final_exprs.append(
                _COMBINE[how](f"__p_{how}_{col}").alias(f"{how}_{col}")
            )
    return stage1.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_col: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join via salting, for when the small side
    is too big to broadcast and one hot key would pin a sort-merge
    task. The big side's rows get a deterministic salt (hash of
    ``salt_col``, a well-distributed column like a row id, mod
    ``buckets``); the small side is replicated once per salt value
    with ``explode(sequence(...))``; the join runs on
    ``(key, salt)`` so the hot key's rows spread over ``buckets``
    reducers. Row-identical to the unsalted join — salting only
    re-partitions the work.

    Scale notes: replication multiplies the small side by
    ``buckets`` — size it so small x buckets still fits the shuffle
    comfortably (this is precisely the regime where it can't be
    broadcast but can be duplicated 8-16x). AQE's skew-join split
    (`spark.sql.adaptive.skewJoin`) handles moderate skew at runtime;
    explicit salting is the static fix for pathological keys and for
    engines/plans AQE can't rewrite (e.g. a skewed LEFT join's build
    side). The ``merge`` hint pins sort-merge so the demo measures
    the salted-exchange path rather than being silently broadcast.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))),
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = salted_big.join(
        replicated.hint("merge"), [key, "__salt"], how
    )
    return joined.drop("__salt")


def merge_rollups(
    rollups: Sequence[DataFrame],
    keys: Sequence[str],
    aggs: dict[str, str],
) -> DataFrame:
    """Incremental-aggregation maintenance: combine already-aggregated
    rollups so that ``merge(rollup(A), rollup(B)) == rollup(A ∪ B)``
    without touching the raw rows of A again.

    The standing-pipeline use: a year-scale daily rollup table plus
    each new micro-batch's mini-rollup — merging costs O(|rollup|),
    not O(|raw|); the 100 TB history is never rescanned. Works for
    any ALGEBRAIC aggregate: ``aggs`` maps an existing (already
    aggregated) column to how its partials combine — 'sum' and
    'count' columns combine by summing, 'min'/'max' by min/max.
    AVG must be carried as a (sum, count) pair and derived at read
    time — a stored average is NOT algebraic, which is exactly why
    warehouse rollup tables store sums and counts.
    """
    merged = rollups[0]
    for r in rollups[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy(*keys).agg(
        *[
            _COMBINE[how](F.col(c)).alias(c)
            for c, how in aggs.items()
        ]
    )
