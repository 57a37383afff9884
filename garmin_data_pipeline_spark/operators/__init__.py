"""Generic relational operator kit + LLM-data-pipeline operators."""

from garmin_data_pipeline_spark.operators.dedupe import (
    dedupe_exact,
    dedupe_latest,
    latest_per_group,
)
from garmin_data_pipeline_spark.operators.joins import (
    join_asof,
    join_range,
    master_outer_join,
    union_by_name,
)
from garmin_data_pipeline_spark.operators.nested import (
    flatten_all_structs,
    flatten_struct,
    pick_array_element,
    unwrap_envelope,
)
from garmin_data_pipeline_spark.operators.layout import (
    interleave_bits,
    zorder_code,
)
from garmin_data_pipeline_spark.operators.repair import (
    patch_null_dates_from_gaps,
)
from garmin_data_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from garmin_data_pipeline_spark.operators.spatial import (
    haversine_km,
    join_points_in_radius,
)
from garmin_data_pipeline_spark.operators.projections import (
    clean_header,
    clean_headers,
    drop_all_null_columns,
    drop_constant_columns,
    drop_last_columns,
    reorder_after,
)
from garmin_data_pipeline_spark.operators.stats import (
    correlation_matrix,
    distinct_counts,
    impute_mean,
    null_counts,
    value_counts,
)
from garmin_data_pipeline_spark.operators.windows import (
    cumulative_sum,
    densify_daily,
    densify_daily_ffill,
    forward_fill,
    lag_with_default,
)

__all__ = [
    "clean_header",
    "clean_headers",
    "correlation_matrix",
    "cumulative_sum",
    "dedupe_exact",
    "dedupe_latest",
    "densify_daily",
    "densify_daily_ffill",
    "distinct_counts",
    "drop_all_null_columns",
    "drop_constant_columns",
    "drop_last_columns",
    "flatten_all_structs",
    "flatten_struct",
    "forward_fill",
    "haversine_km",
    "impute_mean",
    "interleave_bits",
    "join_asof",
    "join_points_in_radius",
    "join_range",
    "lag_with_default",
    "latest_per_group",
    "master_outer_join",
    "null_counts",
    "patch_null_dates_from_gaps",
    "pick_array_element",
    "reorder_after",
    "salted_agg",
    "salted_join",
    "union_by_name",
    "value_counts",
    "zorder_code",
]
