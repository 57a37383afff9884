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
    """Residue threshold for a keep-rate. Half-UP rounding (not
    truncation, not banker's): rates like 0.29 — 28.999... in binary
    float — map to 29/100, and exact .5 products round up (0.125 of
    100 -> 13), matching the "keep at least this rate" intuition.
    Python's ``round`` would round half-even (12.5 -> 12)."""
    return int(rate * modulus + 0.5)


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
    """TEST/PARITY HELPER — not registered in any plan. Assign each row
    a ``bin_id`` so consecutive rows (in ``order_by`` order) accumulate
    ~``budget`` units per bin.

    bin = floor(cumsum_before_this_row / budget): deterministic, one
    global window — which serializes the whole corpus through ONE task.
    Every production path (including the registered ``t6``) goes
    through :func:`pack_sequences_sharded`; with a single constant
    shard it reproduces this function's output bit-for-bit under a
    *partitioned* window, so this global form survives only as the
    differential-test baseline.
    """
    s = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (
        Window.orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(s).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(prior / budget))


def pack_sequences_sharded(
    df: DataFrame,
    size_col: Column | str,
    budget: int,
    shard_col: str,
    order_by: Sequence[str],
    out_col: str = "bin_id",
) -> DataFrame:
    """Scale-safe two-level sequence packing — the 100 TB default.

    Level 1: pack each shard independently (``Window.partitionBy(
    shard)`` — every executor packs its shards in parallel; no
    single-task global sort). Level 2: make bin ids globally unique by
    offsetting each shard's local bins with the exclusive prefix sum of
    per-shard bin counts — a #shards-row aggregate, broadcast back.

    Bins never span shards, so each bin still packs ~``budget`` units
    of *consecutive* (within-shard) rows; the only deviation from the
    global variant is that the last bin of each shard may run short.
    Deterministic, engine-portable (SQL-mirrorable), and the wall cost
    is one partitioned window + one tiny aggregate instead of one task
    holding the corpus.

    Contract: sizes must be NON-NEGATIVE (they are token/byte counts;
    NULL is allowed and contributes 0) and ``order_by`` must be a
    unique key per shard. Both are what make the per-shard bin-count
    derivation below (max local bin sits on the shard's last row)
    exact. NOTE the offsets are computed EAGERLY: building this
    DataFrame runs one aggregation job and snapshots the per-shard
    counts at build time — rebuild the plan if the input relation
    changes underneath it.
    """
    s = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(s).over(w), F.lit(0))
    local = df.withColumn("__local_bin", F.floor(prior / budget))
    # Per-shard bin counts WITHOUT materializing the windowed corpus:
    # exclusive cumulative sums are monotone in the packing order, so
    # the max local bin sits on the shard's LAST row and
    #   n_bins = floor((sum(s) - s_last) / budget) + 1,
    # s_last = max_by(s, packing order). One narrow map-side-partial
    # hash aggregate over the raw input — cheaper than persisting the
    # window output to read it twice (the cache write IS a full
    # materialization), and no cache lifecycle to manage. Correct
    # because order_by is a unique key per shard (the packing
    # determinism contract); NULL sizes contribute 0 on both paths
    # (sum skips them, coalesce covers an all-NULL / NULL-last shard).
    order_struct = F.struct(*[F.col(c) for c in order_by])
    counts = df.groupBy(shard_col).agg(
        (
            F.floor(
                (
                    F.coalesce(F.sum(s), F.lit(0))
                    - F.coalesce(F.max_by(s, order_struct), F.lit(0))
                )
                / budget
            )
            + 1
        ).alias("__n_bins")
    )
    # Exclusive prefix sum over shards, computed DRIVER-side: the
    # aggregate is #shards rows (thousands at most, by contract), so
    # collecting it costs one tiny job and keeps the physical plan free
    # of unpartitioned Window nodes — the engine-wide invariant every
    # registered plan is tested against (a corpus-sized global window
    # here would be the 100 TB serialization point; silencing the
    # WindowExec warning by construction beats explaining it away).
    # Shard order matches the window it replaces: ascending, NULL shard
    # first (Spark's default null ordering).
    shard_rows = sorted(
        counts.collect(),
        key=lambda r: (r[shard_col] is not None, r[shard_col]),
    )
    offset_rows, running = [], 0
    for r in shard_rows:
        offset_rows.append((r[shard_col], running))
        running += r["__n_bins"]
    from pyspark.sql.types import LongType, StructField, StructType

    shard_type = local.schema[shard_col].dataType
    offsets = df.sparkSession.createDataFrame(
        offset_rows,
        StructType(
            [
                StructField("__shard", shard_type, True),
                StructField("__offset", LongType(), False),
            ]
        ),
    )
    # Null-safe equi-join: rows with a NULL shard key would silently
    # vanish through a plain equi-join; eqNullSafe keeps every input
    # row (NULL shards form their own shard), matching pack_sequences.
    return (
        local.join(
            F.broadcast(offsets),
            F.col(shard_col).eqNullSafe(F.col("__shard")),
        )
        .withColumn(out_col, F.col("__local_bin") + F.col("__offset"))
        .drop("__shard", "__local_bin", "__offset")
    )


def _salted_hash(key_col: str, salt: str) -> Column:
    """Salted md5-derived 32-bit hash of a key column (cross-engine
    reproducible; DuckDB mirror =
    ``sql_base_hash32(CAST(key AS VARCHAR) || '#' || salt)``)."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        base_hash32,
    )

    return base_hash32(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#{salt}")),
        "md5",
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
    modulus: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Multi-way train/val/test assignment by SALTED key hash — the
    dataset-card split. Unlike :func:`split_by_key` (raw residue),
    hashing decorrelates the split from how ids were assigned
    (sequential ids, per-source id ranges), and the salt makes
    independent resplits possible without touching the data.

    ``weights`` maps split name -> fraction, in order, summing to ~1;
    cumulative thresholds use :func:`_cutoff` rounding and any residue
    past the last threshold (float-sum slack) falls into the LAST
    split. Pure column expression (one md5 per row, no shuffle, no
    window); same key + salt => same split on any engine, any
    partitioning — so feature tables joined later can never leak
    across the split.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    b = F.pmod(_salted_hash(key_col, salt), F.lit(modulus))
    names = list(weights)
    cum = 0.0
    expr = F.lit(names[-1])
    thresholds = []
    for name, frac in list(weights.items())[:-1]:
        cum += frac
        thresholds.append((name, _cutoff(cum, modulus)))
    for name, cut in reversed(thresholds):
        expr = F.when(b < cut, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def shuffle_order(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle-v1",
    out_col: str = "shuffle_key",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus shuffle for training order: attach a
    salted hash key and return the frame range-partitioned + sorted by
    it, ready for a partitioned write that preserves the order.

    Scale shape: ONE range exchange (sampled boundaries) + per-
    partition sort — no global window, no row_number, no single-task
    serialization point. A global rank column would force exactly the
    unpartitioned-window shape the engine-wide plan invariant bans;
    readers that need an ordinal get it from (file index, row
    position) after the ordered write, and anything that only needs
    the ORDER can sort by ``(shuffle_key, key)`` directly. Ties on the
    32-bit hash are broken by the key, so the order is total and
    reproducible across engines and partitionings.
    """
    out = df.withColumn(out_col, _salted_hash(key_col, salt))
    parts = [F.col(out_col), F.col(key_col)]
    if num_partitions:
        out = out.repartitionByRange(num_partitions, *parts)
    else:
        out = out.repartitionByRange(*parts)
    return out.sortWithinPartitions(*parts)


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    source_col: str,
    alpha: float = 0.5,
    salt: str = "mix-v1",
    unit: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source re-weighting — the multinomial data
    mixture of the XLM-R / LLaMA training recipes: a source with
    corpus share p_s is sampled with probability w_s ∝ p_s^alpha
    (alpha < 1 upsamples the tail sources), keeping the TOTAL token
    budget roughly at one corpus pass. Emits one row per retained
    COPY with ``copy_idx`` (1..n) — rare sources repeat (epochs > 1),
    dominant sources subsample (a salted-hash Bernoulli on the
    fractional part), both deterministic.

    Exact integer arithmetic end to end, so the output is
    hash-stable across engines: with alpha = 0.5,
    ``s = floor(sqrt(c_s) * unit)`` (IEEE sqrt is exactly rounded,
    floor is unambiguous), the per-source rate is the exact rational
    ``r_ppm = (s * total * unit) div (sum(s) * c_s)`` evaluated in
    DECIMAL(38,0) (the probe in tests shows bit-parity with DuckDB's
    HUGEINT), and a doc keeps ``r_ppm div unit`` copies plus one more
    iff ``salted_hash(key) % unit < r_ppm % unit``. Only alpha in
    {0.5, 1.0} is supported: ``pow`` is NOT correctly rounded across
    libms, so a general alpha could flip a ppm boundary between
    engines — state what we don't do rather than guess.

    Scale shape: one count aggregate over the corpus, a 1-row
    broadcast (total/denominator — the sanctioned t17/t21 pattern),
    a broadcast join of the #sources-row rate table, and one explode
    — no shuffle beyond the count's partial aggregate.

    Output schema: ALL input columns plus ``copy_idx`` (1..n per
    retained copy); rows whose source subsampled them away are
    absent. A NULL source is a real bucket, not a silent drop: the
    rate join is null-safe (``<=>``), so docs with a NULL
    ``source_col`` mix under their own share like any other source.
    """
    if alpha not in (0.5, 1.0):
        raise ValueError(
            "alpha must be 0.5 or 1.0: pow() is not correctly rounded "
            "across libms, so other temperatures are not hash-stable "
            "cross-engine"
        )
    docs = df.select(key_col, source_col)
    stats = docs.groupBy(source_col).agg(F.count("*").alias("c"))
    if alpha == 0.5:
        s_int = F.expr(f"FLOOR(SQRT(CAST(c AS DOUBLE)) * {unit})")
    else:
        s_int = F.expr(f"c * CAST({unit} AS BIGINT)")
    stats = stats.withColumn("s_int", s_int)
    totals = stats.agg(
        F.sum("c").alias("total"), F.sum("s_int").alias("denom")
    )
    rates = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            source_col,
            F.expr(
                f"(CAST(s_int AS DECIMAL(38,0)) * total * {unit}) div "
                "(CAST(denom AS DECIMAL(38,0)) * c)"
            ).alias("r_ppm"),
        )
    )
    h = _salted_hash(key_col, salt) % unit
    n_copies = (
        F.expr(f"r_ppm div {unit}")
        + F.when(h < F.col("r_ppm") % unit, F.lit(1)).otherwise(F.lit(0))
    ).alias("n_copies")
    # null-safe equality: groupBy above already counts NULL sources
    # as a group, so the join must match them back (a plain equi-join
    # would silently drop every NULL-source row from the mixture)
    rates = rates.withColumnRenamed(source_col, "__mix_source")
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__mix_source")),
        )
        .select(*df.columns, n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
            ),
        )
        .drop("n_copies")
    )
