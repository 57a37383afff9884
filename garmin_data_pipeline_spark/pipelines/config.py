"""Config-driven pipeline dispatch (the reference's ``config.yaml``,
``config.template.yaml`` + ``db_utils.py:31-43`` loader).

The reference wires database credentials, data paths, table names, and
ETL settings through one YAML file. The Spark engine keeps the same
shape minus the credential block (the session catalog needs none; a
JDBC sink takes its URL explicitly): ``data_paths``, ``tables``,
``etl_settings`` map 1:1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# load_strategy -> Spark save mode (db_utils.py:125: 'replace' is
# truncate-and-reload; 'upsert' was declared but never implemented in
# the reference — MERGE INTO territory, rejected the same way here).
_STRATEGY_TO_MODE = {"replace": "overwrite", "append": "append"}


@dataclass
class PipelineConfig:
    raw_data_dir: str
    output_data_dir: str = ""
    tables: dict[str, str] = field(default_factory=dict)
    load_strategy: str = "replace"
    batch_size: int = 1000
    datasets_to_process: list[str] | None = None

    @property
    def save_mode(self) -> str:
        if self.load_strategy not in _STRATEGY_TO_MODE:
            raise ValueError(
                f"unsupported load_strategy: {self.load_strategy!r} "
                "(the reference's 'upsert' was never implemented there "
                "either — use explicit MERGE INTO on a lakehouse format)"
            )
        return _STRATEGY_TO_MODE[self.load_strategy]


def load_config(path: str) -> PipelineConfig:
    """Parse a reference-shaped YAML config (db_utils.py:31-43)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    paths = raw.get("data_paths", {})
    etl = raw.get("etl_settings", {})
    schema = raw.get("database", {}).get("schema", "garmin")
    tables = {
        name: f"{schema}.{table}"
        for name, table in raw.get("tables", {}).items()
    }
    return PipelineConfig(
        raw_data_dir=paths.get("raw_data", "."),
        output_data_dir=paths.get("output_data", ""),
        tables=tables,
        load_strategy=etl.get("load_strategy", "replace"),
        batch_size=int(etl.get("batch_size", 1000)),
        datasets_to_process=raw.get("datasets_to_process"),
    )


def run_from_config(spark, config: PipelineConfig | str):
    """``run_full_pipeline`` driven by a config object or YAML path
    (the reference's main entry, etl_pipeline.py:226-311)."""
    from .runner import run_full_pipeline

    cfg = load_config(config) if isinstance(config, str) else config
    return run_full_pipeline(
        spark,
        cfg.raw_data_dir,
        datasets=cfg.datasets_to_process,
        tables=cfg.tables or None,
        mode=cfg.save_mode,
    )
