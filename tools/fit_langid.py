"""Regenerate operators/langid_model.py's TRAINED_LANGID_WEIGHTS /
TRAINED_LANGID_BIAS constants: fit the multinomial LR on the
deterministic in-repo corpus and print the quantized dicts to paste.

Usage: python tools/fit_langid.py
"""

from __future__ import annotations

import sys
from pathlib import Path
from pprint import pformat

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from garmin_data_pipeline_spark.operators.langid_model import (
        fit_and_quantize_langid,
    )

    weights, bias = fit_and_quantize_langid()
    print("TRAINED_LANGID_WEIGHTS =", pformat(weights, width=68))
    print("TRAINED_LANGID_BIAS =", pformat(bias, width=68))


if __name__ == "__main__":
    main()
