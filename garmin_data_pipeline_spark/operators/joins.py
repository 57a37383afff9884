"""Join operators (SURVEY.md §2.3).

The reference's master-table build is a reduce of pairwise pandas full
outer merges on ``calendarDate`` (MERGE cell 18). Spark-first shape:
the same reduce over DataFrame.join — Catalyst + AQE pick broadcast vs
sort-merge per pair; because every join keys on the same column, the
shuffle partitioning is reused across the chain (one exchange, N-1
merge stages), which is exactly the plan you want at scale.

Pandas suffixes colliding columns (``_x``/``_y``); Spark errors on
duplicates instead, so we pre-alias non-key overlaps explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.durations import epoch_micros


def master_outer_join(
    dfs: Sequence[DataFrame] | dict[str, DataFrame],
    on: str | Sequence[str] = "calendarDate",
    how: str = "full_outer",
) -> DataFrame:
    """N-way outer join on a shared key (reference 7-way master-table
    merge, MERGE cell 18; identical MERGE3/MERGEF cell 18). ``on`` may
    be one key or several (e.g. ``["user_id", "calendarDate"]`` for a
    multi-tenant scale-up).

    When ``dfs`` is a dict, colliding non-key columns are renamed
    ``<name>_<col>`` (deterministic, unlike pandas' positional _x/_y).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if isinstance(dfs, dict):
        named = list(dfs.items())
        seen: dict[str, int] = {}
        for _, df in named:
            for c in df.columns:
                if c not in keys:
                    seen[c] = seen.get(c, 0) + 1
        renamed = []
        for name, df in named:
            cols = [
                F.col(c).alias(f"{name}_{c}")
                if c not in keys and seen[c] > 1
                else F.col(c)
                for c in df.columns
            ]
            renamed.append(df.select(*cols))
        frames = renamed
    else:
        frames = list(dfs)
    return reduce(lambda l, r: l.join(r, keys, how), frames)


def join_asof(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, attach ``value_cols``
    from the latest right row with ``right.time_col <= left.time_col``
    within the same ``by`` group (NULL when no prior right row).

    Spark has no ASOF JOIN; the naive rewrite (range join + argmax)
    explodes. This is the scalable composition: tag and union both
    inputs, one shuffle on ``by``, then ``last(..., ignorenulls)`` over
    (time, right-first) order forward-fills the right values onto the
    left rows. Wall-cost = one window over |left|+|right| rows — the
    same shape as every other ordered operator here.

    Ties: a right row at exactly the left row's time matches (the
    right side sorts before the left at equal timestamps), matching
    DuckDB's ASOF JOIN inclusive-backward semantics.
    """
    by = list(by)
    # ASOF semantics exclude right rows with no timestamp (they would
    # otherwise sort nulls-first and forward-fill into early left rows).
    right = right.filter(F.col(time_col).isNotNull())
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
    )
    rt = right.select(
        *by,
        F.col(time_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *left.columns, *[f"{c}{suffix}" for c in value_cols]
    )


def join_range(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bin_seconds: int = 86400,
) -> DataFrame:
    """Interval (range) join: left rows matched to right intervals with
    ``start <= ts <= end`` sharing the ``by`` keys.

    A naive theta join degenerates to a nested loop. Standard scale
    trick instead: bucket time into ``bin_seconds`` bins, explode each
    interval into the bins it covers, equi-join on (by, bin) — a hash
    join Catalyst/AQE can plan — then apply the exact BETWEEN filter.
    Join fan-out is bounded by interval length / bin width, not |right|.
    """
    by = list(by)
    binus = bin_seconds * 1_000_000
    lb = left.withColumn(
        "__bin",
        F.floor(
            epoch_micros(ts_col, left.schema[ts_col].dataType) / binus
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(
                    epoch_micros(
                        start_col, right.schema[start_col].dataType
                    )
                    / binus
                ),
                F.floor(
                    epoch_micros(
                        end_col, right.schema[end_col].dataType
                    )
                    / binus
                ),
            )
        ),
    )
    joined = lb.join(rb, by + ["__bin"]).filter(
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def join_interval_overlap(
    a: DataFrame,
    b: DataFrame,
    start_a: str,
    end_a: str,
    start_b: str,
    end_b: str,
    by: Sequence[str] = (),
    bin_seconds: int = 86400,
    overlap_col: str = "overlap_us",
) -> DataFrame:
    """Interval x interval OVERLAP join: pairs of (a, b) rows sharing
    the ``by`` keys whose [start, end] intervals intersect, with the
    exact overlap length in microseconds appended. The interval x
    point case is :func:`join_range`; this is its two-sided sibling
    (co-occurrence analysis, downtime x session attribution, SCD2 x
    SCD2 reconciliation).

    Scale shape — same bin-bucketing trick as :func:`join_range`,
    extended to two exploded sides: each interval explodes into the
    coarse time bins it covers, the equi-join runs on (by, bin) — a
    hash join Catalyst/AQE can plan and shuffle-partition evenly —
    and the exact predicate ``s1 <= e2 AND s2 <= e1`` filters the
    candidates. A pair overlapping several shared bins would match in
    each; it is kept ONLY in the bin containing the overlap start
    (``bin == floor(max(s1, s2) / bin_width)``) so every pair appears
    exactly once WITHOUT a distinct — dedup-by-construction instead
    of a second shuffle. Fan-out per row is interval length /
    bin width, never |other side|. Overlap arithmetic is integer
    epoch-micros throughout (cross-engine exact)."""
    by = list(by)
    binus = bin_seconds * 1_000_000

    def us(df, col):
        return epoch_micros(col, df.schema[col].dataType)

    ab = a.withColumn("__sa_us", us(a, start_a)).withColumn(
        "__ea_us", us(a, end_a)
    )
    bb = b.withColumn("__sb_us", us(b, start_b)).withColumn(
        "__eb_us", us(b, end_b)
    )
    ae = ab.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col("__sa_us") / binus),
                F.floor(F.col("__ea_us") / binus),
            )
        ),
    )
    be = bb.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col("__sb_us") / binus),
                F.floor(F.col("__eb_us") / binus),
            )
        ),
    )
    ov_start = F.greatest(F.col("__sa_us"), F.col("__sb_us"))
    ov_end = F.least(F.col("__ea_us"), F.col("__eb_us"))
    joined = (
        ae.join(be, by + ["__bin"])
        .filter(
            (F.col("__sa_us") <= F.col("__eb_us"))
            & (F.col("__sb_us") <= F.col("__ea_us"))
            & (F.col("__bin") == F.floor(ov_start / binus))
        )
        .withColumn(overlap_col, ov_end - ov_start)
    )
    return joined.drop("__bin", "__sa_us", "__ea_us", "__sb_us", "__eb_us")


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union-all by column name with missing-column tolerance
    (reference ``pd.concat(ignore_index=True)``, aggregate_json_files.py:91).
    No shuffle — a pure concatenation of partitions."""
    return reduce(
        lambda l, r: l.unionByName(r, allowMissingColumns=True), dfs
    )
