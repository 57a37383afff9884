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
        parts.getItem(0).cast("long") * 60 + parts.getItem(1).cast("long")
    )


def parse_hms_to_seconds(time_str: Column | str) -> Column:
    """``'[h:]mm:ss[.f]'`` -> integer seconds. Handles the reference's
    mixed running-CSV `Time` column (transform_running_data.py:140-180):
    drop fractional seconds, left-pad to h:mm:ss, then hour/min/sec math."""
    c = F.col(time_str) if isinstance(time_str, str) else time_str
    c = standardize_hms(strip_fractional_seconds(c))
    parts = F.split(c, ":")
    return (
        parts.getItem(0).cast("long") * 3600
        + parts.getItem(1).cast("long") * 60
        + parts.getItem(2).cast("long")
    )


def seconds_to_hours(seconds: Column | str, ndigits: int = 1) -> Column:
    """Seconds -> hours rounded to ``ndigits`` (reference seconds_to_hours,
    transform_all_datasets.py:133-135; WRANGLE cell 60)."""
    c = F.col(seconds) if isinstance(seconds, str) else seconds
    return F.round(c / 3600.0, ndigits)


def epoch_millis_to_timestamp(millis: Column | str) -> Column:
    """Epoch-milliseconds -> timestamp (reference pd.to_datetime(unit='ms'),
    transform_all_datasets.py:313-316)."""
    c = F.col(millis) if isinstance(millis, str) else millis
    return F.timestamp_millis(c.cast("long"))


def timestamp_diff_seconds(end: Column | str, start: Column | str) -> Column:
    """end - start in whole seconds (reference sleep-duration calc,
    transform_all_datasets.py:105-112)."""
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return (F.unix_timestamp(e) - F.unix_timestamp(s)).cast("long")
