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
