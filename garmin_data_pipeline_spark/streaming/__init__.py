"""Structured Streaming ingest + stateful operators (SURVEY.md §2.10)."""

from .dedup import (  # noqa: F401
    build_minhash_band_index,
    neardup_candidates,
    read_band_index,
    start_index_ingest_stream,
    start_neardup_stream,
    write_band_index,
)
from .events import (  # noqa: F401
    EVENTS_SCHEMA,
    attribute_purchases,
    daily_event_summary,
    dedupe_stream,
    enrich_events,
    overlap_intervals,
    read_events_stream,
    sessionize,
    sessionize_stream,
    start_daily_summary_stream,
    start_upsert_stream,
)
