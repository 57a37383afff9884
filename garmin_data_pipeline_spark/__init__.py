"""garmin_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
pandas ETL pipeline (``ahearnzach3/garmin_data_pipeline``) as an
idiomatic PySpark DataFrame library, designed for 100 TB scale:

- ``sources``    — schema-declared readers for the Garmin datasets
                   (glob discovery, JSON/CSV/GPX scans, catalog sinks).
- ``functions``  — the scalar expression kit (duration/pace formatting,
                   mm:ss parsing, binning, unit conversions, sentinels).
- ``operators``  — the generic relational operator kit (dedupe-latest,
                   densify+ffill, cumulative windows, data-dependent
                   projections, struct flattening, master outer join)
                   plus LLM-data-pipeline operators (exact/MinHash/
                   SimHash dedup, ANN similarity search, text analysis,
                   multimodal column plumbing).
- ``pipelines``  — the eight Garmin dataset pipelines + master table,
                   mirroring the reference's TRANSFORM_FUNCTIONS
                   dispatch (transform_all_datasets.py:351-383).
- ``plans``      — driver-contract queries over the synthetic testdata
                   with DuckDB oracle SQL for every SQL-expressible op.
- ``streaming``  — Structured Streaming ingest of the events table
                   (watermark + tumbling daily windows).

Everything is stock DataFrame API — no custom Catalyst rules, no
row-at-a-time Python UDFs in any hot path (SURVEY.md §2.9/§4).
"""

__version__ = "0.1.0"
