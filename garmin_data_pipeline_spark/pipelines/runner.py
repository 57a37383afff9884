"""Pipeline orchestration — the reference's two batch entry points
(SURVEY.md §3) as library functions.

Entry point 1, ``python etl_pipeline.py`` (etl_pipeline.py:148-196):
extract -> transform -> load -> verify per dataset, with a summary of
extracted/loaded counts. Here each dataset is ONE lazy read->transform
->write DAG — no intermediate materialization, Catalyst plans the
whole chain; the only actions are the write and the verification
count.

Entry point 2, ``python load_final_datasets.py`` (load_final_datasets.
py:82-133): golden CSV -> warehouse table, dropping the dependent view
first for the running table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..sources import read_dataset
from ..sources.sinks import drop_view, load_table, verify_row_count
from .garmin import TRANSFORMS


@dataclass
class DatasetResult:
    """Per-dataset outcome (mirrors the reference's results dict,
    etl_pipeline.py:131-136)."""

    dataset: str
    table: str
    status: str
    rows_loaded: int = 0
    error: str = ""
    validation_failures: int = 0


@dataclass
class PipelineSummary:
    results: list[DatasetResult] = field(default_factory=list)

    @property
    def succeeded(self) -> list[str]:
        return [r.dataset for r in self.results if r.status == "success"]

    @property
    def failed(self) -> list[str]:
        return [r.dataset for r in self.results if r.status == "failed"]


# dataset -> warehouse table (mirrors the tables: block of
# config.template.yaml)
DEFAULT_TABLES = {
    "atl_data": "garmin.atl_data",
    "maxmet_data": "garmin.maxmet_data",
    "race_predictions": "garmin.race_predictions",
    "training_history": "garmin.training_history",
    "sleep_data": "garmin.sleep_data",
    "uds_data": "garmin.uds_data",
    "summarized_activities": "garmin.summarized_activities_raw",
}


def run_full_pipeline(
    spark: SparkSession,
    base_dir: str,
    datasets: list[str] | None = None,
    tables: dict[str, str] | None = None,
    mode: str = "overwrite",
    validate: bool = True,
) -> PipelineSummary:
    """Process every configured dataset: read the JSON shards,
    transform, load into the catalog, verify the row count
    (etl_pipeline.py:53-146 process_dataset loop, :148-196 summary),
    and (beyond the reference) run the key-uniqueness data-quality
    check on the loaded table.

    Failures are isolated per dataset like the reference's
    try/except-per-dataset — one bad dataset doesn't kill the run.
    """
    from ..operators import validate as V

    tables = {**DEFAULT_TABLES, **(tables or {})}
    names = datasets or [n for n in TRANSFORMS if n in tables]
    spark.sql("CREATE DATABASE IF NOT EXISTS garmin")
    summary = PipelineSummary()
    for name in names:
        if name not in TRANSFORMS or name not in tables:
            summary.results.append(
                DatasetResult(
                    name, tables.get(name, ""), "failed",
                    error=f"unknown dataset: {name!r}",
                )
            )
            continue
        table = tables[name]
        try:
            out = TRANSFORMS[name](read_dataset(spark, name, base_dir))
            load_table(out, table, mode=mode)
            n = verify_row_count(spark, table)
            failures = 0
            if validate:
                loaded = spark.table(table)
                key = (
                    ["activityId"]
                    if name == "summarized_activities"
                    else ["calendarDate"]
                )
                if set(key) <= set(loaded.columns):
                    report = V.check_unique_key(loaded, key)
                    failures = (
                        report.filter(~report.passed).count()
                    )
            summary.results.append(
                DatasetResult(
                    name,
                    table,
                    "success",
                    rows_loaded=n,
                    validation_failures=failures,
                )
            )
        except Exception as exc:  # noqa: BLE001 — per-dataset isolation
            summary.results.append(
                DatasetResult(name, table, "failed", error=str(exc))
            )
    return summary


def load_final_datasets(
    spark: SparkSession,
    csv_to_table: dict[str, str],
    drop_views: dict[str, str] | None = None,
) -> PipelineSummary:
    """Golden CSV -> warehouse loader (load_final_datasets.py:82-133):
    for each (csv_path, table), optionally drop a dependent view first
    (the reference drops garmin.running_summary before reloading
    running_data, :62-67), then truncate-and-reload + verify."""
    spark.sql("CREATE DATABASE IF NOT EXISTS garmin")
    summary = PipelineSummary()
    for csv_path, table in csv_to_table.items():
        try:
            if drop_views and table in drop_views:
                drop_view(spark, drop_views[table])
            df = spark.read.option("header", "true").option(
                "inferSchema", "true"
            ).csv(csv_path)
            load_table(df, table)
            n = verify_row_count(spark, table)
            summary.results.append(
                DatasetResult(csv_path, table, "success", rows_loaded=n)
            )
        except Exception as exc:  # noqa: BLE001
            summary.results.append(
                DatasetResult(csv_path, table, "failed", error=str(exc))
            )
    return summary


def main(argv: list[str] | None = None) -> int:
    """CLI twin of the reference's ``python etl_pipeline.py``
    (etl_pipeline.py:226-311): run the full pipeline over an export
    directory and print the per-dataset summary."""
    import argparse

    from ..session import get_spark

    p = argparse.ArgumentParser(description="Garmin ETL on Spark")
    p.add_argument("base_dir", help="Garmin export root (raw JSON shards)")
    p.add_argument("--datasets", nargs="*", default=None)
    p.add_argument("--mode", default="overwrite", choices=["overwrite", "append"])
    args = p.parse_args(argv)

    spark = get_spark("garmin-etl")
    summary = run_full_pipeline(
        spark, args.base_dir, datasets=args.datasets, mode=args.mode
    )
    for r in summary.results:
        line = f"{r.dataset:<24} {r.status:<8} rows={r.rows_loaded}"
        if r.error:
            line += f" error={r.error[:120]}"
        print(line)
    return 1 if summary.failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
