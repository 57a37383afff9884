"""Dedup / greatest-per-group operators (SURVEY.md §2.4 A3/A4, §2.5 W3).

The reference's canonical pattern is ``groupby(key)[ts].idxmax()`` →
``.loc[idx]`` (keep the whole row with the max timestamp per group,
WRANGLE cell 80) and its sort-then-``drop_duplicates(keep='first')``
variant (transform_all_datasets.py:184-186). Spark has no row identity,
so the canonical rewrite is a row_number window — one shuffle on the
group key, no driver involvement, skew handled by AQE.

Determinism: pandas keep='first' depends on file order; we require an
explicit ordering and add tiebreakers so results are stable under any
partitioning (SURVEY.md §2.11, §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str] | str,
    order_by: Sequence[Column | str] | Column | str,
) -> DataFrame:
    """Keep the single row per ``keys`` ranked first by ``order_by``
    (descending columns: pass ``F.desc("ts")``).

    Reference: argmax-per-day dedup (WRANGLE cells 80,97,132;
    transform_all_datasets.py:184-186). One hash shuffle on the keys;
    the window sort is per-partition. At scale prefer this over
    ``dropDuplicates`` whenever an ordering matters.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = (
        [order_by]
        if isinstance(order_by, (str, Column))
        else list(order_by)
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedupe_latest(
    df: DataFrame,
    keys: Sequence[str] | str,
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the max-timestamp row per key with deterministic tiebreaks
    (the reference's sort-desc + keep='first', made order-independent)."""
    order = [F.desc(ts_col)] + [F.desc(t) for t in tiebreakers]
    return latest_per_group(df, keys, order)


def latest_per_group_agg(
    df: DataFrame,
    keys: Sequence[str] | str,
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Skew-hardened greatest-per-group: same result as
    :func:`dedupe_latest`, different physical shape.

    The row_number window ships EVERY row of a group to one task before
    sorting — a key holding 50% of the table serializes half the data
    through a single reducer, and AQE's skew handling does not split
    window partitions. This form instead aggregates
    ``max_by(struct(*cols), struct(ts, *tiebreakers))`` grouped by the
    keys: a hash aggregate with a map-side PARTIAL phase, so the hot
    key collapses to one candidate row per input partition *before*
    the shuffle — the reducer for the hot key receives one row per map
    task, not half the table.

    Ordering parity with ``dedupe_latest``: the lexicographic struct
    max equals orderBy(desc(ts), desc(*tiebreakers)) row 1 (struct
    fields null-first ascending == null-last descending). Tiebreakers
    must make the ordering unique for byte-identical results.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    others = [c for c in df.columns if c not in keys]
    ordering = F.struct(ts_col, *tiebreakers)
    picked = df.groupBy(*keys).agg(
        F.max_by(F.struct(*others), ordering).alias("__row")
    )
    return picked.select(*keys, "__row.*").select(*df.columns)


def dedupe_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal on a column subset — the unordered
    ``drop_duplicates(keep='first')`` sites (transform_all_datasets.py:213).
    Spark's dropDuplicates is a hash aggregate: map-side partial dedup,
    one shuffle, arbitrary survivor — only safe when survivors are
    interchangeable (full-row dups or don't-care attributes)."""
    return df.dropDuplicates(list(subset) if subset else None)
