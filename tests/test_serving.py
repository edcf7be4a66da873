"""HTTP serving surface tests: the reference's endpoint set
(/health, /, /train, /validate, /test, /automate — API:178-404) over a
real ephemeral-port server, driven with stdlib urllib."""

import datetime
import json
import urllib.error
import urllib.request

import pytest


def _post(base, path, body=None):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server(spark):
    from mql5_economic_news_data_pipeline_2025_gcp__spark.serving import (
        EngineAPI,
        serve,
    )

    rows = []
    base_ts = datetime.datetime(2025, 1, 1)
    for g, cur in enumerate(["USD", "EUR"]):
        for i in range(40):
            rows.append(
                (base_ts + datetime.timedelta(hours=i), cur, "CPI",
                 float(i % 7) + g, 1)
            )
    df = spark.createDataFrame(
        rows,
        "event_ts timestamp, Currency string, Event string, "
        "value double, ImpactOrdinal int",
    )
    api = EngineAPI(spark, events_provider=lambda: df)
    httpd = serve(api)
    host, port = httpd.server_address
    yield f"http://{host}:{port}"
    httpd.shutdown()


def test_health_and_root(server):
    status, body = _get(server, "/health")
    assert status == 200
    assert body["status"] == "healthy" and body["engine_ok"] is True
    assert body["model_trained"] is False
    status, body = _get(server, "/")
    assert status == 200 and "/automate" in body["endpoints"]


def test_validate_before_train_conflicts(server):
    status, body = _post(server, "/validate")
    assert status == 409 and "train" in body["error"]


def test_train_then_validate_then_test(server):
    status, body = _post(server, "/train", {"params": {"EPOCHS": 3}})
    assert status == 200
    # body params override defaults; defaults fill the rest (API:241-264)
    assert body["params"]["EPOCHS"] == 3
    assert body["params"]["HIDDEN_SIZE"] == 64
    assert body["summary"]["n_groups"] == 2
    assert len(body["metrics"]) == 2 and not body["metrics_truncated"]

    status, body = _get(server, "/health")
    assert body["model_trained"] is True

    status, body = _post(server, "/validate")
    assert status == 200 and body["summary"]["n_groups"] == 2

    status, body = _post(server, "/test")
    assert status == 200
    assert len(body["live_forecasts"]) == 2
    assert all(r["ForecastValue"] is not None for r in body["live_forecasts"])


def test_automate_and_errors(server):
    status, body = _post(server, "/automate", {"skip_training": False})
    assert status == 200 and set(body) == {"train", "validate", "test"}
    for stage in body.values():
        assert stage["summary"]["n_groups"] == 2

    status, body = _post(server, "/nope")
    assert status == 404
    req = urllib.request.Request(
        server + "/train", data=b"{not json", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 400


def test_runner_over_http(server):
    """AUTO:77-173 twin: ready-poll then /automate over the live server."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.runner import (
        run_over_http,
        wait_ready,
    )

    assert wait_ready(server, attempts=3, delay=0.1)
    out = run_over_http(server, {"EPOCHS": 2})
    assert out["mode"] == "automate"
    assert set(out["stages"]) == {"train", "validate", "test"}
    assert out["stages"]["test"]["summary"]["n_groups"] == 2


def test_runner_ready_poll_gives_up_fast():
    from mql5_economic_news_data_pipeline_2025_gcp__spark.runner import wait_ready

    # nothing listens on this port; bounded retries must return False
    assert wait_ready("http://127.0.0.1:9", attempts=2, delay=0.05) is False


def test_runner_direct_mode(spark):
    """No server anywhere: the in-process rung runs the real pipeline on
    the sf0.001 events table and emits per-stage summaries."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.runner import run_direct

    out = run_direct("/root/testdata/sf0.001", params={"EPOCHS": 1})
    assert out["mode"] == "direct"
    assert set(out["stages"]) == {"train", "validate", "test"}
    for stage in out["stages"].values():
        assert stage["summary"]["n_groups"] >= 1
