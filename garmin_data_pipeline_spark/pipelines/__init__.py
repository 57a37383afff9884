"""The eight Garmin dataset pipelines + master table (SURVEY.md §7)."""

from .config import (  # noqa: F401
    PipelineConfig,
    load_config,
    run_from_config,
)
from .analysis import (  # noqa: F401
    correlations_with,
    count_over_threshold,
    group_means,
    total_run_time,
)
from .runner import (  # noqa: F401
    DEFAULT_TABLES,
    PipelineSummary,
    load_final_datasets,
    run_full_pipeline,
)
from .garmin import (  # noqa: F401
    TRANSFORMS,
    master_table,
    master_table_ml3,
    master_table_mlf,
    run_pipeline,
    running_activities,
    training_plan,
    transform_atl,
    transform_maxmet,
    transform_race_predictions,
    transform_running,
    transform_running_ml,
    transform_sleep,
    transform_sleep_ml,
    transform_summarized_activities,
    transform_training_history,
    transform_uds,
)
