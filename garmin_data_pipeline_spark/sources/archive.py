"""Zip-archive ingestion (SURVEY.md §2.1 S7).

The reference unzips the Garmin export once, driver-side, before any
processing (PBI Python Scripts/Zip Folder Extraction Script.ipynb
cell 0: ``zipfile.ZipFile(...).extractall``). Two forms here:

- :func:`extract_zip` — the same one-shot prep step (reference
  parity; fine for a single export archive).
- :func:`scan_zip_members` — the engine-native form: archives are
  read as ``binaryFile`` rows and their members decompressed
  *inside the executors* via an Arrow-batched kernel, yielding one
  row per member with its bytes. No extraction to disk, no driver
  bottleneck: a directory of 10k archives decompresses with
  #executor parallelism, and downstream parsing (JSON/CSV/GPX
  readers) starts from the member rows directly.

Scale notes: one input row per ARCHIVE (zip is not splittable), so
parallelism = #archives — repartition after the scan if members fan
out heavily. Member payloads stream through Arrow batches; peak
executor memory is one batch of decompressed members, so set
``maxPartitionBytes``/batch size to bound archive size x batch rows.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def extract_zip(zip_file: str, output_dir: str) -> list[str]:
    """Driver-side one-shot extraction (reference ZIP cell 0:
    ``zip_ref.extractall(output_dir)`` + ``os.listdir`` check).
    Returns the extracted member names like the notebook's listing."""
    with zipfile.ZipFile(zip_file, "r") as zf:
        zf.extractall(output_dir)
        return zf.namelist()


def scan_zip_members(
    spark: SparkSession,
    path: str,
    glob: str = "*.zip",
    member_glob: str | None = None,
) -> DataFrame:
    """Distributed zip scan: one row per (archive, member) with the
    decompressed bytes — the S7 prep step as an engine operator.

    ``member_glob`` filters member names (fnmatch) before
    decompression, so e.g. ``'*.json'`` skips images entirely —
    member listing reads only the zip central directory."""
    assets = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    schema = (
        "archive string, member string, n_bytes bigint, content binary"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fnmatch import fnmatch

        for pdf in batches:
            out = {"archive": [], "member": [], "n_bytes": [], "content": []}
            for apath, blob in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if member_glob and not fnmatch(
                            info.filename, member_glob
                        ):
                            continue
                        data = zf.read(info)
                        out["archive"].append(apath)
                        out["member"].append(info.filename)
                        out["n_bytes"].append(len(data))
                        out["content"].append(data)
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, schema=schema)


def read_zipped_text_members(
    spark: SparkSession,
    path: str,
    glob: str = "*.zip",
    member_glob: str = "*",
    encoding: str = "utf-8",
) -> DataFrame:
    """Convenience: zip members decoded to text rows (archive, member,
    text) — the bridge from S7 to the JSON/CSV parsers, replacing the
    reference's extract-to-disk-then-glob sequence."""
    from pyspark.sql import functions as F

    members = scan_zip_members(spark, path, glob, member_glob)
    return members.select(
        "archive",
        "member",
        F.decode(F.col("content"), encoding).alias("text"),
    )


def _exists(p: str) -> bool:  # small test/diagnostic helper
    return Path(p).exists()
