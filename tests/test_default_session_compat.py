"""Driver-environment compatibility: queries must survive a DEFAULT-config
SparkSession.

The correctness driver runs ``__spark_entry__.queries()`` on its own
PySpark 4.1.2 session with stock configs. Two stock defaults differ from
the repo's tuned ``session.get_spark``:

- ``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults **true** →
  the testdata's naive ``timestamp[us]`` columns arrive as
  ``TIMESTAMP_NTZ``, which ``F.unix_micros()`` rejects at analysis time
  (the round-4 driver break: 6 queries errored while the local suite,
  running under the tuned session, stayed green).
- ``spark.sql.legacy.parquet.nanosAsLong`` defaults **false** → any
  ns-timestamp parquet would fail with PARQUET_TYPE_ILLEGAL.

``sources/tables.load_table`` now forces both confs on whatever session
it is handed, so the repo is correct on ANY session. This test simulates
the driver's world by flipping the confs back to stock defaults before
every query and asserting the time-sensitive queries still run and
return TIMESTAMP (not NTZ) columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from mql5_economic_news_data_pipeline_2025_gcp__spark import plans as _plans
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import load_table

from conftest import SF_DIR  # noqa: E402

# The 6 round-4 driver casualties (3 sampled + 3 judge-confirmed latent),
# plus the flagship as a canary for the core path.
NTZ_SENSITIVE = [
    "evt_sessionize",
    "evt_interval_join",
    "evt_rolling_window_stats",
    "evt_max_concurrency",
    "evt_asof_nearest",
    "evt_time_to_convert",
    "evt_metrics_r2_mse",
]

_STOCK = {
    # PySpark 4.x stock defaults the driver session ships with.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
}


def _set_stock_defaults(spark):
    for k, v in _STOCK.items():
        spark.conf.set(k, v)


@pytest.fixture()
def stock_confs(spark):
    saved = {k: spark.conf.get(k) for k in _STOCK}
    _set_stock_defaults(spark)
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_load_table_forces_ntz_inference_off(stock_confs):
    spark = stock_confs
    ev = load_table(spark, SF_DIR, "events")
    assert not isinstance(ev.schema["ts"].dataType, TimestampNTZType)
    # unix_micros is the analysis-time canary that broke round 4
    assert ev.select(F.unix_micros("ts")).limit(1).count() == 1


@pytest.mark.parametrize("name", NTZ_SENSITIVE)
def test_query_runs_under_default_session_confs(stock_confs, name):
    spark = stock_confs
    # re-assert stock defaults per query: load_table flips them, and we
    # want EVERY query to prove it self-heals from the driver's state
    _set_stock_defaults(spark)
    df = _plans.REGISTRY[name].spark_fn(spark, SF_DIR)
    assert df.count() >= 0
    for f in df.schema.fields:
        assert not isinstance(f.dataType, TimestampNTZType), (
            f"{name}.{f.name} leaked TIMESTAMP_NTZ to the driver compare"
        )


# ---------------------------------------------------------------------------
# Whole-registry stock-session smoke (round-5 verdict task #7): the NTZ
# class of break — a stock-default conf changing what the driver's
# session hands our queries — would have been caught BEFORE any driver
# run by executing every registry entry under stock confs. Running all
# ~274 queries takes minutes even at sf0.001, so this is opt-in
# (SPARK_GRAFT_FULL_COMPAT=1 — the CI-cadence switch); the 7 pinned
# round-4 casualties above always run.
# ---------------------------------------------------------------------------

_FULL = pytest.mark.skipif(
    "SPARK_GRAFT_FULL_COMPAT" not in __import__("os").environ,
    reason="whole-registry compat smoke is CI-cadence; "
    "set SPARK_GRAFT_FULL_COMPAT=1 to run",
)


@_FULL
@pytest.mark.parametrize("name", sorted(_plans.REGISTRY))
def test_registry_query_runs_under_stock_confs(stock_confs, name):
    spark = stock_confs
    _set_stock_defaults(spark)
    df = _plans.REGISTRY[name].spark_fn(spark, SF_DIR)
    assert df.count() >= 0
    for f in df.schema.fields:
        assert not isinstance(f.dataType, TimestampNTZType), (
            f"{name}.{f.name} leaked TIMESTAMP_NTZ to the driver compare"
        )
