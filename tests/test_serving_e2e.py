"""End-to-end §2.11 smoke (round-5 verdict task #7): the runner's HTTP
rung drives /automate against REAL sf0.001 events through a live
ephemeral-port server, and the stage metric tables land as parquet
sink files — tying the serving endpoints to the sink layer instead of
leaving serving.py pytest-green but isolated.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark import runner
from mql5_economic_news_data_pipeline_2025_gcp__spark.serving import EngineAPI, serve
from mql5_economic_news_data_pipeline_2025_gcp__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sink_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("serving_sinks"))


@pytest.fixture(scope="module")
def live_server(spark, sink_dir):
    """Real server over real testdata: events mapped to the reference's
    series shape exactly as runner.run_direct does."""

    def events():
        return load_table(spark, SF, "events").select(
            F.col("ts").alias("event_ts"),
            F.col("user_id").cast("string").alias("Currency"),
            F.col("event_type").alias("Event"),
            "value",
            F.lit(1).alias("ImpactOrdinal"),
        )

    api = EngineAPI(spark, events_provider=events, sink_dir=sink_dir)
    httpd = serve(api)
    host, port = httpd.server_address
    yield f"http://{host}:{port}"
    httpd.shutdown()


def test_runner_automate_lands_metric_tables(spark, live_server, sink_dir):
    # the runner's own ready-poll + /automate path, not a re-implementation
    assert runner.wait_ready(live_server, attempts=5, delay=0.5)
    out = runner.run_over_http(live_server, params={"EPOCHS": 1})
    assert out["mode"] == "automate"
    assert set(out["stages"]) == {"train", "validate", "test"}

    for stage in ("train", "validate", "test"):
        mpath = os.path.join(sink_dir, f"{stage}_metrics")
        spath = os.path.join(sink_dir, f"{stage}_summary")
        metrics = spark.read.parquet(mpath)
        summary = spark.read.parquet(spath)
        assert metrics.count() > 0, f"{stage}_metrics sink is empty"
        assert summary.count() == 1, f"{stage}_summary must be one scalar row"
        # the durable table agrees with what the endpoint reported
        reported = out["stages"][stage]["summary"]
        landed = summary.first().asDict()
        for k in ("mean_R2", "total_samples"):
            assert k in landed and k in reported
            assert landed[k] == pytest.approx(reported[k]), (stage, k)


def test_second_automate_overwrites_sinks(spark, live_server, sink_dir):
    """save_conditional semantics through the serving tier: re-running
    /automate replaces the landed tables instead of appending."""
    before = spark.read.parquet(
        os.path.join(sink_dir, "test_metrics")
    ).count()
    out = runner.run_over_http(live_server, params={"EPOCHS": 1})
    assert out["mode"] == "automate"
    after = spark.read.parquet(os.path.join(sink_dir, "test_metrics")).count()
    assert after == before  # overwrite, not append-duplication
