"""GPX trackpoint source (SURVEY.md §2.1 S6, FIXTURES.md §9).

The reference parses run-route GPX files with ``gpxpy`` in a
per-file Python loop (GPX notebook cell 1: tracks -> segments ->
points flattened to (Date, Time, Latitude, Longitude) rows). Spark
shape: ``wholetext`` scan (one row per file, split across executors)
+ an Arrow-batched ``mapInPandas`` parser — the one place the
reference surface genuinely needs Python in the plan (SURVEY.md §2.9
reserves pandas UDFs for exactly this).

``gpxpy`` is not in this container, so the parser is a small regex
extractor over the ``<trkpt>`` elements — same output contract. A
trackpoint is ``<trkpt lat=".." lon=".."><time>..</time></trkpt>``;
nesting above it (trk/trkseg) only affects grouping, which the
flattened output discards anyway.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GPX_POINTS_SCHEMA = (
    "Date date, Time timestamp, Latitude double, Longitude double"
)

_TRKPT = re.compile(r"<trkpt\b([^>]*)>(.*?)</trkpt>", re.S)
_LAT = re.compile(r"\blat=\"([^\"]+)\"")
_LON = re.compile(r"\blon=\"([^\"]+)\"")
_TIME = re.compile(r"<time>([^<]+)</time>")


def _parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple] = []
        for text in pdf["value"]:
            for m in _TRKPT.finditer(text or ""):
                attrs, body = m.groups()
                mlat, mlon = _LAT.search(attrs), _LON.search(attrs)
                if not (mlat and mlon):
                    continue
                lat, lon = mlat.group(1), mlon.group(1)
                tm = _TIME.search(body)
                ts = (
                    pd.to_datetime(tm.group(1), utc=True).tz_localize(None)
                    if tm
                    else None
                )
                rows.append(
                    (
                        ts.date() if ts is not None else None,
                        ts,
                        float(lat),
                        float(lon),
                    )
                )
        yield pd.DataFrame(
            rows, columns=["Date", "Time", "Latitude", "Longitude"]
        )


def read_gpx_points(spark: SparkSession, path: str) -> DataFrame:
    """All trackpoints under ``path`` (glob ok) as
    (Date, Time, Latitude, Longitude) rows — the reference's
    ``run_data`` concat (GPX cell 1). One input file = one task input
    row; parsing is Arrow-batched; downstream ops are ordinary columns.
    """
    files = (
        spark.read.option("wholetext", "true")
        .option("pathGlobFilter", "*.gpx")
        .option("recursiveFileLookup", "true")
        .text(path)
    )
    return files.mapInPandas(_parse_files, GPX_POINTS_SCHEMA)
