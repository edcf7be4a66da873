"""Differential correctness: every registered query vs its DuckDB oracle
at sf0.01 — the same comparison the driver performs (CORRECTNESS gate).

Heavy lifting lives in scripts/diffcheck.py; this wrapper keeps the gate
inside `pytest tests/ -x -q`.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from diffcheck import TABLES, compare  # noqa: E402

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY  # noqa: E402

from conftest import ORACLE_SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {tab} AS "
            f"SELECT * FROM '{ORACLE_SF_DIR}/{tab}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY[name]
    sdf = spec.spark_fn(spark, ORACLE_SF_DIR).toPandas()
    if spec.oracle is None:
        assert len(sdf) > 0, f"{name}: rows-only query returned no rows"
        return
    odf = oracle_con.execute(spec.oracle).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"
