"""Schema-declared sources and catalog sinks (SURVEY.md §2.1 S1-S12)."""

from .garmin import (  # noqa: F401
    ACTIVITY_SCHEMA,
    ATL_SCHEMA,
    DATASETS,
    MAXMET_SCHEMA,
    RACE_PREDICTIONS_SCHEMA,
    RUNNING_CSV_COLUMNS,
    SLEEP_SCHEMA,
    SUMMARIZED_ACTIVITIES_SCHEMA,
    TRAINING_HISTORY_SCHEMA,
    UDS_SCHEMA,
    read_dataset,
    read_running_csv,
    with_provenance,
)
from .archive import (  # noqa: F401
    extract_zip,
    read_zipped_text_members,
    scan_zip_members,
)
from .warc import (  # noqa: F401
    encode_warc,
    parse_warc,
    records_from_archives,
    scan_warc,
)
from .sinks import (  # noqa: F401
    export_training_shards,
    jdbc_reader_options,
    merge_upsert,
    read_jdbc,
    read_jsonl,
    read_orc,
    write_bucketed_table,
    write_jsonl,
    write_orc,
)
