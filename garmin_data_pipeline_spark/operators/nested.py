"""Nested-data operators: struct flatten, envelope unwrap, semantic
list-element pick (SURVEY.md §2.8 F29-F31, §2.3 J2, §2.1 S3).

The reference expands dict columns with ``df.join(col.apply(pd.Series))``
(transform_all_datasets.py:100-102) and picks the TOTAL stress record
positionally ("drop last 2, keep 3rd-to-last", WRANGLE cells 146-148).
In Spark these are pure projections — no join, no positional fragility:
struct fields project directly, and the TOTAL element is selected by
its ``type`` field with ``filter()`` on the array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def flatten_struct(
    df: DataFrame, struct_col: str, prefix: str = "", drop: bool = True
) -> DataFrame:
    """Expand a struct column into top-level columns (reference
    sleepScores expansion, transform_all_datasets.py:100-102)."""
    field_names = [
        f.name
        for f in df.schema[struct_col].dataType.fields  # type: ignore[union-attr]
    ]
    exprs = [F.col(c) for c in df.columns if c != struct_col or not drop]
    exprs += [
        F.col(f"{struct_col}.{name}").alias(f"{prefix}{name}")
        for name in field_names
    ]
    return df.select(*exprs)


def unwrap_envelope(df: DataFrame, list_col: str, alias: str = "record") -> DataFrame:
    """Explode a list-of-records envelope into one row per record
    (reference summarizedActivitiesExport unwrap, extract_json_data.py:25-45,
    MLPREP cell 106)."""
    return df.select(F.explode(F.col(list_col)).alias(alias))


def pick_array_element(
    df: DataFrame,
    array_col: str,
    type_field: str,
    type_value: str,
    out_col: str,
) -> DataFrame:
    """Select the single array element whose ``type_field`` equals
    ``type_value`` as a struct column (reference keeps the
    aggregatorList element with type='TOTAL'; we replace its fragile
    positional pick — WRANGLE cell 148 — with the semantic filter).

    ``filter()`` + ``get`` is an array expression: vectorized, no
    explode/shuffle. ``F.get`` (not ``element_at``) because ANSI mode
    errors on out-of-bounds access — a row without a matching element
    must yield NULL, not kill the job.
    """
    picked = F.get(
        F.filter(
            F.col(array_col), lambda x: x[type_field] == F.lit(type_value)
        ),
        0,
    )
    return df.withColumn(out_col, picked)


def flatten_all_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten every struct column (helper for golden-file
    parity where the reference json_normalized whole documents)."""
    while any(
        isinstance(f.dataType, StructType) for f in df.schema.fields
    ):
        exprs = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                exprs += [
                    F.col(f"{f.name}.{sub.name}").alias(f"{f.name}{sep}{sub.name}")
                    for sub in f.dataType.fields
                ]
            else:
                exprs.append(F.col(f.name))
        df = df.select(*exprs)
    return df
