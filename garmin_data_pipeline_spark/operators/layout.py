"""Multi-dimensional clustering layout: Z-order (Morton) codes.

A single-column sort clusters parquet row groups for ONE predicate
dimension; queries filtering on a second dimension still scan
everything. Interleaving the bits of two (or more) quantile-normalized
columns into a Morton code and sorting by it gives every dimension
locality at once — min/max row-group stats then prune scans for
predicates on ANY of the interleaved columns (the technique behind
Delta/Iceberg Z-ORDER clustering; implemented here as pure column
expressions, no engine extension needed).

Scale notes: the code is computed per-row with shift/mask arithmetic
(whole-stage codegen, no UDF) against broadcast-sized quantile
boundary arrays — there is NO global window and NO extra shuffle; a
global NTILE would funnel the table through one reducer, which is
exactly what a 100 TB layout write cannot do.
`load_table(sort_within_partitions=["__zorder"])` then clusters row
groups; the one approximate-quantile pass happens once per table
write and amortizes over every pruned read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton code: interleave the low ``bits`` bits of each (already
    non-negative, bounded) integer column. With k columns, output bit
    ``i*k + j`` is bit ``i`` of column ``j`` — columns share the high
    bits evenly, so a range predicate on any column maps to few
    contiguous code ranges per resolution level.

    ``bits * len(cols)`` must stay <= 63: bit 63 is the LONG sign
    bit, and a code landing there goes negative and sorts BEFORE all
    others — silently destroying the clustering order the Z-code
    exists to provide (8 cols at the default bits=8, or 4 cols at
    bits=16, would hit this). Raises instead.
    """
    k = len(cols)
    if bits * k > 63:
        raise ValueError(
            f"interleave_bits: bits*len(cols) = {bits * k} exceeds 63 "
            "— the top bit would land in the LONG sign bit and "
            "negative codes would sort before all others; lower "
            "`bits` or interleave fewer columns"
        )
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = c.cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return out


def bucketize(col: Column, boundaries: list[float]) -> Column:
    """0-based equal-population bucket of ``col`` given ascending
    quantile ``boundaries`` (len = n_buckets - 1): the count of
    boundaries <= value, as a codegen'd array scan over a literal
    array — no join, no window. NULLs land in bucket 0 (they sort
    first in parquet stats anyway)."""
    b = F.array(*[F.lit(float(x)) for x in boundaries])
    return F.coalesce(
        F.size(F.filter(b, lambda x: x <= col.cast("double"))),
        F.lit(0),
    ).cast("long")


def zorder_code(
    df: DataFrame,
    by: list[str],
    bits: int = 8,
    out_col: str = "__zorder",
) -> DataFrame:
    """Attach a quantile-normalized Morton code over the numeric
    ``by`` columns.

    Per dimension, ``approxQuantile`` (one eager pass, relative error
    1/2^(bits+2)) yields 2^bits - 1 boundaries; values map to their
    equal-population cell via a literal-array scan. Quantile (not
    min/max linear) normalization immunizes the code against skewed
    distributions that would otherwise collapse most rows into a few
    cells — the same choice Delta's Z-ORDER makes.

    Eager-action note: like ``similarity.infer_dim``, this runs a
    Spark job at plan-construction time (the quantile pass); it is a
    write-time layout helper, not a lazy query operator.

    Bound: ``bits * len(by) <= 63`` (LONG sign bit) — enforced by
    :func:`interleave_bits` before any job runs; at the default
    bits=8 that means at most 7 dimensions, which is already far past
    the 2-4 dims where Z-ordering stops paying.
    """
    if bits * len(by) > 63:
        raise ValueError(
            f"zorder_code: bits*len(by) = {bits * len(by)} exceeds 63 "
            "(LONG sign bit) — lower `bits` or drop dimensions"
        )
    n = 1 << bits
    code_inputs = []
    for c in by:
        qs = df.approxQuantile(
            c, [i / n for i in range(1, n)], 1.0 / (n * 4)
        )
        code_inputs.append(bucketize(F.col(c), qs))
    return df.withColumn(out_col, interleave_bits(code_inputs, bits))


# ---------------------------------------------------------------------------
# Oracle-exact Z-order variant (r10). zorder_code above normalizes by
# APPROXIMATE quantiles (the right production choice for skewed
# data), but an approximate pass can never carry a hash-matched
# DuckDB oracle row. The variant below rank-scales by exact min/max
# with engine-exact integer arithmetic instead — the w9/w10
# discipline: the (v - min) * (2^bits - 1) product widened to
# DECIMAL(38,0)/HUGEINT (a 16-bit scale of a microsecond epoch span
# overflows BIGINT), truncating `div` == flooring `//` on the
# non-negative operands — so the registered `b2_zorder_key` query
# certifies the complete interleave arithmetic bit-for-bit, and
# write_zordered gives the layout a one-exchange parquet writer.
# ---------------------------------------------------------------------------


def _scale_spark_sql(c: str, lo: str, hi: str, bits: int) -> str:
    """Spark-SQL text: rank-scale ``c`` into [0, 2^bits) with exact
    integer arithmetic; a degenerate column (max == min) maps to 0."""
    top = (1 << bits) - 1
    return (
        f"(CASE WHEN ({hi} - {lo}) > 0 THEN "
        f"(CAST(({c} - {lo}) AS DECIMAL(38,0)) * {top})"
        f" div ({hi} - {lo}) ELSE 0 END)"
    )


def zorder_oracle_scale_sql(
    c: str, lo: str, hi: str, bits: int = 16
) -> str:
    """DuckDB mirror of :func:`_scale_spark_sql` (HUGEINT product,
    flooring ``//`` — identical values for non-negative operands)."""
    top = (1 << bits) - 1
    return (
        f"(CASE WHEN ({hi} - {lo}) > 0 THEN "
        f"CAST((CAST(({c} - {lo}) AS HUGEINT) * {top})"
        f" // ({hi} - {lo}) AS BIGINT) ELSE 0 END)"
    )


def zorder_oracle_interleave_sql(
    sa: str, sb: str, bits: int = 16
) -> str:
    """DuckDB mirror of ``interleave_bits([sa, sb], bits)`` — the
    same bit placement (column j's bit i at position i*2 + j)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({sa} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({sb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    out: str = "z",
) -> DataFrame:
    """Append the exact-min/max (col_a, col_b) Morton code as
    column ``out``.

    One aggregate computes the two min/max pairs (4 scalars,
    broadcast back — the e2e/t17 1-row pattern, fully lazy unlike
    zorder_code's eager quantile pass); the scaled keys are
    materialized as intermediate columns so the interleave references
    them instead of re-inlining the scale arithmetic 2*bits times
    (the r6 expression-blowup trap); the interleave itself is
    :func:`interleave_bits`. ``col_a``/``col_b`` must be integral
    (cast timestamps to epoch micros first)."""
    stats = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    staged = (
        df.join(F.broadcast(stats))
        .withColumn(
            "__sa",
            F.expr(_scale_spark_sql(col_a, "__amin", "__amax", bits)),
        )
        .withColumn(
            "__sb",
            F.expr(_scale_spark_sql(col_b, "__bmin", "__bmax", bits)),
        )
    )
    return staged.withColumn(
        out, interleave_bits([F.col("__sa"), F.col("__sb")], bits)
    ).drop("__sa", "__sb", "__amin", "__amax", "__bmin", "__bmax")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the (col_a, col_b)
    Z-curve: ``repartitionByRange`` on the z-value splits the curve
    into ``n_files`` contiguous segments and the in-partition sort
    makes every row group's min/max tight on BOTH columns — one
    range exchange, paid once at write time and amortized over every
    pruned read. Readers need nothing special: plain parquet scans
    prune files/row groups via the stats the layout made selective
    (tests/test_layout_zorder.py measures the effect on both filter
    axes)."""
    (
        with_zorder_key(df, col_a, col_b, bits=bits, out="__z")
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
