"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 (plus the LLM-data-pipeline operators) implemented in
``garmin_data_pipeline_spark.plans``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from garmin_data_pipeline_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    a1 was demoted to the pytest oracle tier in r12 (seven green
    driver rows) — still the flagship here, resolved through the tier
    registry (demotion changes driver-slot visibility, not the API).
    """
    return plans.PYTEST_QUERIES["a1_pricing_summary"].fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return plans.oracle_sql()
