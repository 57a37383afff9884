"""Cleaning / conversion expression kit (SURVEY.md §2.8 F11, F19-F28).

Sentinel handling, numeric-with-commas parsing, binning, dict maps,
conditional flags, unit conversions — every row-wise ``.apply`` in the
reference re-expressed as a native Column expression.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_commas_to_double(col: Column | str) -> Column:
    """``'1,234'`` -> 1234.0 (reference ANALYSIS cell 48:
    ``str.replace(',','')`` then float cast)."""
    return F.regexp_replace(_c(col).cast("string"), ",", "").try_cast(
        "double"
    )


def replace_sentinel(
    col: Column | str, sentinel: str = "--", value: float = 0.0
) -> Column:
    """``'--'`` -> constant, else numeric cast (reference MLPREP cell 175)."""
    c = _c(col)
    return F.when(c == sentinel, F.lit(value)).otherwise(
        c.try_cast("double")
    )


def sentinel_to_null(col: Column | str, sentinel: str = "--") -> Column:
    """``'--'`` -> NULL (pre-step for mean imputation, MLPREP cell 176)."""
    c = _c(col)
    return F.when(c == sentinel, F.lit(None)).otherwise(c).try_cast(
        "double"
    )


# The reference's six right-open mileage buckets
# (transform_all_datasets.py:60-69, transform_running_data.py:62-70).
DISTANCE_BINS: list[tuple[float, float, str, int]] = [
    (0.0, 3.0, "0-3 miles", 1),
    (3.0, 5.0, "3-5 miles", 2),
    (5.0, 7.0, "5-7 miles", 3),
    (7.0, 10.0, "7-10 miles", 4),
    (10.0, 13.0, "10-13 miles", 5),
    (13.0, float("inf"), "13+ miles", 6),
]


def bin_to_label(
    col: Column | str,
    bins: Sequence[tuple[float, float, str, int]] = DISTANCE_BINS,
) -> Column:
    """Right-open interval binning -> string label (``pd.cut`` parity,
    transform_all_datasets.py:60-62). NULL stays NULL."""
    c = _c(col)
    expr = F.lit(None).cast("string")
    for lo, hi, label, _ in reversed(bins):
        cond = (c >= lo) if hi == float("inf") else ((c >= lo) & (c < hi))
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return expr


def bin_to_id(
    col: Column | str,
    bins: Sequence[tuple[float, float, str, int]] = DISTANCE_BINS,
) -> Column:
    """Same binning -> integer id 1..n (the reference materializes the
    label/id pair, transform_all_datasets.py:65-69)."""
    c = _c(col)
    expr = F.lit(None).cast("int")
    for lo, hi, _, bid in reversed(bins):
        cond = (c >= lo) if hi == float("inf") else ((c >= lo) & (c < hi))
        expr = F.when(cond, F.lit(bid)).otherwise(expr)
    return expr


def map_via_dict(col: Column | str, mapping: dict, default=None) -> Column:
    """Literal dict lookup (reference Distance_Group -> id map,
    transform_all_datasets.py:65-69) via ``create_map``."""
    c = _c(col)
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    m = F.create_map(*pairs)
    looked = m[c]
    return looked if default is None else F.coalesce(looked, F.lit(default))


def flag_when(cond: Column) -> Column:
    """Boolean condition -> 1/0 int flag (reference IsRunDay / IsTrainingPlan,
    MERGE cell 31, WRANGLE cell 36)."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0))


def coalesce_rebuild_seconds(
    seconds_col: Column | str, hours_col: Column | str
) -> Column:
    """Rebuild a seconds duration from an hours column when null
    (reference row-wise apply, WRANGLE cell 53) — a plain coalesce."""
    return F.coalesce(
        _c(seconds_col).try_cast("long"),
        (_c(hours_col).try_cast("double") * 3600).cast("long"),
    )


# Unit conversions (reference transform_all_datasets.py:319-340,
# extract_json_data.py:67-88 — raw Garmin units are cm / ms / cm-per-ms).
def cm_to_km(col: Column | str) -> Column:
    return _c(col) / 100000.0


def m_to_km(col: Column | str) -> Column:
    return _c(col) / 1000.0


def ms_to_seconds(col: Column | str) -> Column:
    return _c(col) / 1000.0


def cm_per_ms_to_m_per_s(col: Column | str) -> Column:
    return _c(col) * 10.0


def cm_to_m(col: Column | str) -> Column:
    return _c(col) / 100.0
