"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in the package; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mql5_economic_news_data_pipeline_2025_gcp__spark import plans as _plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: per-(user_id,event_type) R²/MSE/Samples
    over the cleaned event series with a lag-1 stub predictor — the
    reference pipeline's headline computation (SURVEY §7 minimum slice)."""
    return _plans.REGISTRY["evt_metrics_r2_mse"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extension
    operators). Each callable takes (spark, sf_dir) → DataFrame."""
    return _plans.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet tables. Non-SQL-expressible ops (Structured Streaming) are
    omitted → rows-only check."""
    return _plans.oracle_sql()
