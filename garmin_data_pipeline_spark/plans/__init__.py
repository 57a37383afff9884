"""Driver-contract query plans over the synthetic testdata."""

from garmin_data_pipeline_spark.plans import llm_queries  # noqa: F401  (registers)
from garmin_data_pipeline_spark.plans.queries import (
    QUERIES,
    oracle_sql,
    queries,
)

__all__ = ["QUERIES", "oracle_sql", "queries"]
