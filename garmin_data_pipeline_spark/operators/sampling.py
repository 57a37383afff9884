"""Corpus sampling / mixing / packing for training-data pipelines
(BASELINE.json north-star additions).

- :func:`mod_sample` — deterministic systematic sampling by key
  residue. Unlike ``DataFrame.sample`` it is reproducible across runs,
  partitionings, and engines (the property a dataset card needs), and
  join-stable: the same key always lands in the same split.
- :func:`corpus_mix` — per-group sampling rates (the data-mixing step:
  e.g. downsample English to 50%, keep low-resource languages whole).
- :func:`pack_sequences` — assign documents to fixed-token-budget bins
  (context-window packing). Exact first-fit is sequential; this is the
  scalable deterministic variant: a global ordered cumulative token sum,
  bin = floor(prior_cumsum / budget) — every bin except the last per
  boundary is within budget slack of one document.

All pure DataFrame ops -> every one of these is SQL-mirrorable for the
correctness oracle (no RNG, no hash functions the oracle lacks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mod_sample(
    df: DataFrame, key_col: str, rate: float, modulus: int = 100
) -> DataFrame:
    """Keep rows where ``key % modulus < rate * modulus`` —
    deterministic, engine-portable sampling on an integral key."""
    return df.filter(
        F.pmod(F.col(key_col), F.lit(modulus)) < _cutoff(rate, modulus)
    )


def _cutoff(rate: float, modulus: int) -> int:
    """Residue threshold for a keep-rate. ``round`` (not truncation)
    so rates like 0.29 — 28.999... in binary float — map to 29/100."""
    return int(round(rate * modulus))


def corpus_mix(
    df: DataFrame,
    key_col: str,
    group_col: Column | str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    modulus: int = 100,
) -> DataFrame:
    """Per-group deterministic sampling (data mixing). ``rates`` maps a
    group value to its keep-rate; others keep ``default_rate``."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    threshold = F.lit(_cutoff(default_rate, modulus))
    for value, rate in rates.items():
        threshold = F.when(
            g == value, F.lit(_cutoff(rate, modulus))
        ).otherwise(threshold)
    return df.filter(F.pmod(F.col(key_col), F.lit(modulus)) < threshold)


def split_by_key(
    df: DataFrame, key_col: str, test_rate: float, modulus: int = 100
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, test) split on a key residue: disjoint,
    exhaustive, and stable across runs/engines — the property an ML
    data card needs (``randomSplit`` reshuffles on every evaluation).
    The same key always lands in the same side, so feature tables
    joined later can never leak across the split."""
    cutoff = _cutoff(test_rate, modulus)
    residue = F.pmod(F.col(key_col), F.lit(modulus))
    return df.filter(residue >= cutoff), df.filter(residue < cutoff)


def pack_sequences(
    df: DataFrame,
    size_col: Column | str,
    budget: int,
    order_by: Sequence[str],
    out_col: str = "bin_id",
) -> DataFrame:
    """Assign each row a ``bin_id`` so consecutive rows (in
    ``order_by`` order) accumulate ~``budget`` units per bin.

    bin = floor(cumsum_before_this_row / budget): deterministic, one
    global window. The single-task global window is the cost of exact
    global packing — at scale, pack per partition key (date, shard)
    instead, or accept per-partition bins.
    """
    s = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (
        Window.orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(s).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(prior / budget))
