"""Duration / pace / time-string expression kit (SURVEY.md §2.8 F1-F17).

The reference stores durations as pandas ``timedelta64`` and converts
them to ``HH:MM:SS`` strings before export (transform_all_datasets.py:15-29,
extract_json_data.py:168-205). Spark has no practical interval column
type for this, so the engine's convention is:

    duration == integral **seconds** in a LongType column,
    rendered with :func:`format_duration` at the presentation edge.

All of these are pure Column expressions — JVM-side, whole-stage
codegen'd, zero Python UDFs (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_duration(seconds: Column | str) -> Column:
    """Seconds -> ``H:MM:SS`` string (reference: extract_json_data.py:168-185,
    transform_all_datasets.py:15-29 drops the ``0 days`` prefix).

    Hours are unpadded (``7:03:09``), minutes/seconds zero-padded —
    matching the reference's ``f"{h}:{m:02d}:{s:02d}"``.
    """
    s = F.col(seconds) if isinstance(seconds, str) else seconds
    s = s.cast("long")
    return F.when(
        s.isNotNull(),
        F.concat_ws(
            ":",
            F.floor(s / 3600).cast("string"),
            F.lpad(F.floor((s % 3600) / 60).cast("string"), 2, "0"),
            F.lpad((s % 60).cast("string"), 2, "0"),
        ),
    )


def format_timedelta(seconds: Column | str, days_prefix: bool = False) -> Column:
    """Seconds -> ``HH:MM:SS`` with zero-padded hours, the way the
    reference renders pandas timedeltas (``str(td).split(' ')[-1]``,
    transform_all_datasets.py:15-29). With ``days_prefix`` the full
    pandas repr ``'D days HH:MM:SS'`` is produced (the golden sleep CSV
    keeps that form for ``sleepDuration``, WRANGLE cell 44)."""
    s = F.col(seconds) if isinstance(seconds, str) else seconds
    s = s.cast("long")
    hms = F.concat_ws(
        ":",
        F.lpad(F.floor((s % 86400) / 3600).cast("string"), 2, "0"),
        F.lpad(F.floor((s % 3600) / 60).cast("string"), 2, "0"),
        F.lpad((s % 60).cast("string"), 2, "0"),
    )
    if days_prefix:
        hms = F.concat(
            F.floor(s / 86400).cast("string"), F.lit(" days "), hms
        )
    return F.when(s.isNotNull(), hms)


def format_pace_min_per_km(speed_m_per_s: Column | str) -> Column:
    """m/s -> ``M:SS min/km`` string (reference: extract_json_data.py:187-205,
    ``pace_seconds = 1000/speed`` then minutes:seconds render)."""
    v = F.col(speed_m_per_s) if isinstance(speed_m_per_s, str) else speed_m_per_s
    pace_s = F.floor(1000.0 / v).cast("long")
    return F.when(
        v.isNotNull() & (v > 0),
        F.concat_ws(
            ":",
            F.floor(pace_s / 60).cast("string"),
            F.lpad((pace_s % 60).cast("string"), 2, "0"),
        ),
    )


def strip_fractional_seconds(time_str: Column | str) -> Column:
    """``'23:45.6'`` -> ``'23:45'`` (reference drop_milliseconds,
    transform_running_data.py:140-145 — split on '.' keep first)."""
    c = F.col(time_str) if isinstance(time_str, str) else time_str
    return F.split(c, r"\.").getItem(0)


def standardize_hms(time_str: Column | str) -> Column:
    """``'mm:ss'`` -> ``'0:mm:ss'``; ``h:mm:ss`` passes through
    (reference standardize_time_format, transform_running_data.py:156-164)."""
    c = F.col(time_str) if isinstance(time_str, str) else time_str
    return F.when(
        F.size(F.split(c, ":")) == 2, F.concat(F.lit("0:"), c)
    ).otherwise(c)


def parse_mmss_to_seconds(time_str: Column | str) -> Column:
    """``'mm:ss'`` (optionally with fractional seconds) -> integer seconds
    (reference convert_mmss_to_seconds, transform_running_data.py:147-154)."""
    c = F.col(time_str) if isinstance(time_str, str) else time_str
    c = strip_fractional_seconds(c)
    parts = F.split(c, ":")
    return (
        parts.getItem(0).try_cast("long") * 60
        + parts.getItem(1).try_cast("long")
    )


def parse_hms_to_seconds(time_str: Column | str) -> Column:
    """``'[h:]mm:ss[.f]'`` -> integer seconds. Handles the reference's
    mixed running-CSV `Time` column (transform_running_data.py:140-180):
    drop fractional seconds, left-pad to h:mm:ss, then hour/min/sec math."""
    c = F.col(time_str) if isinstance(time_str, str) else time_str
    c = standardize_hms(strip_fractional_seconds(c))
    parts = F.split(c, ":")
    return (
        parts.getItem(0).try_cast("long") * 3600
        + parts.getItem(1).try_cast("long") * 60
        + parts.getItem(2).try_cast("long")
    )


def pace_timedelta_seconds(pace: Column | str) -> Column:
    """F17: the reference's ``'00:' + pace`` MM:SS -> timedelta trick
    (ML_Master_Table_3.ipynb cell 29 / ..._More_Running_Features.ipynb
    cell 28 ``convert_to_timedelta``): prefix the missing hours field,
    parse as h:mm:ss, keep the engine's integral-seconds convention.
    Non-parseable / null paces yield NULL (the reference returns NaN)."""
    c = F.col(pace) if isinstance(pace, str) else pace
    parts = F.split(F.concat(F.lit("00:"), c), ":")
    return (
        parts.getItem(0).try_cast("long") * 3600
        + parts.getItem(1).try_cast("long") * 60
        + parts.getItem(2).try_cast("long")
    )


def round_binary(col: Column, ndigits: int = 1) -> Column:
    """numpy/pandas-compatible rounding of doubles: scale, ``rint``
    (round-half-even on the *binary* value), unscale. Spark's
    ``F.round`` re-renders the double as decimal first (4.55 -> 4.6
    where numpy gives 4.5), which breaks golden-file parity for the
    reference's ``round(x, 1)`` sites."""
    scale = float(10**ndigits)
    return F.rint(col * scale) / scale


def round_python(col: Column, ndigits: int = 1) -> Column:
    """Python ``round()``-exact rounding of doubles: half-even on the
    EXACT binary value. ``format_number`` is the one Spark builtin with
    these semantics (verified: 4.55->4.5, 0.35->0.3, 0.25->0.2,
    4.65->4.7 — all match CPython); strip its thousands separators and
    cast back. Needed because the reference's golden CSVs were produced
    with CPython ``round`` (e.g. WRANGLE cell 46)."""
    return F.regexp_replace(F.format_number(col, ndigits), ",", "").cast(
        "double"
    )


def seconds_to_hours(seconds: Column | str, ndigits: int = 1) -> Column:
    """Seconds -> hours rounded to ``ndigits`` (reference seconds_to_hours,
    transform_all_datasets.py:133-135; WRANGLE cell 46 — CPython
    ``round`` semantics, see :func:`round_python`)."""
    c = F.col(seconds) if isinstance(seconds, str) else seconds
    return round_python(c / 3600.0, ndigits)


def epoch_millis_to_timestamp(millis: Column | str) -> Column:
    """Epoch-milliseconds -> timestamp (reference pd.to_datetime(unit='ms'),
    transform_all_datasets.py:313-316)."""
    c = F.col(millis) if isinstance(millis, str) else millis
    return F.timestamp_millis(c.cast("long"))


def _ntz_wall_micros(c: Column) -> Column:
    """Wall-clock -> epoch micros by pure field arithmetic. Every
    primitive here (date cast, hour/minute/second, the SSSSSS
    fraction) reads the NTZ wall clock directly — no LTZ intermediary
    exists in any evaluation path, so the result cannot depend on the
    session or JVM time zone."""
    return (
        F.unix_date(c.cast("date")).cast("long") * 86_400_000_000
        + F.hour(c).cast("long") * 3_600_000_000
        + F.minute(c).cast("long") * 60_000_000
        + F.second(c).cast("long") * 1_000_000
        + F.date_format(c, "SSSSSS").cast("long")
    )


def epoch_micros(ts: Column | str, dtype=None) -> Column:
    """Timestamp -> epoch microseconds, tolerant of TIMESTAMP_NTZ
    (the type Spark 4 infers for parquet written with
    isAdjustedToUTC=false — pandas / DuckDB / Arrow writers), which
    ``unix_micros`` rejects outright.

    Pass ``dtype`` (``df.schema[col].dataType``) whenever the schema
    is in hand: NTZ inputs then use wall-clock field arithmetic
    (session-tz independent by construction — matching a naive-SQL
    oracle's ``epoch_us``), and instants use plain ``unix_micros``.

    Without ``dtype`` the expression falls back to
    ``unix_micros(to_utc_timestamp(ts, 'UTC'))``, which accepts both
    types but is NOT fully session-tz independent for NTZ: Spark's
    interpreted/constant-folded path first casts NTZ to TIMESTAMP
    with the session time zone (the codegen path reads the wall clock
    as UTC). Exact when the session/JVM zone is UTC; prefer passing
    ``dtype``. (Property-tested: tests/test_properties.py.)
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    if dtype is not None:
        from pyspark.sql.types import TimestampNTZType

        if isinstance(dtype, TimestampNTZType):
            return _ntz_wall_micros(c)
        return F.unix_micros(c)
    return F.unix_micros(F.to_utc_timestamp(c, "UTC"))


def timestamp_diff_seconds(
    end: Column | str,
    start: Column | str,
    end_dtype=None,
    start_dtype=None,
) -> Column:
    """end - start in whole seconds (reference sleep-duration calc,
    transform_all_datasets.py:105-112).

    Computed as a difference of per-side floored epoch seconds (the
    ``unix_timestamp`` contract the golden CSVs were produced under),
    via :func:`epoch_micros`. Pass ``end_dtype``/``start_dtype``
    (``df.schema[col].dataType``, or the known result type of an
    expression such as ``to_timestamp`` -> ``TimestampType()``)
    whenever the type is in hand: that routes TIMESTAMP_NTZ inputs
    through wall-clock field arithmetic instead of the
    plan-path-dependent ``to_utc_timestamp`` fallback (see
    :func:`epoch_micros` — ADVICE r4).
    """
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return (
        F.floor(epoch_micros(e, end_dtype) / 1_000_000)
        - F.floor(epoch_micros(s, start_dtype) / 1_000_000)
    ).cast("long")
