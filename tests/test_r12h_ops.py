"""Property gates for the round-12h batch: extremal-index replay with
the cluster-partition identity and an exact Teager–Kaiser replay."""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r12h import (
    _RUN_GAP,
)

SF = "/root/testdata/sf0.001"


def _daily():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    return (
        ev.groupby(["event_type", "day"])["value_c"]
        .sum()
        .reset_index(name="x")
        .sort_values(["event_type", "day"])
    )


def test_extremal_index_matches_replay(spark):
    rows = (
        REGISTRY["evt_extremal_index"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    d = _daily()
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        n = len(xs)
        ranked = sorted((x, t) for t, x in enumerate(xs, start=1))
        u = next(
            x for i, (x, _) in enumerate(ranked) if 10 * (i + 1) >= 9 * n
        )
        assert int(r["threshold_c"]) == u
        exceed_t = [t for t, x in enumerate(xs, start=1) if x >= u]
        n_clusters = sum(
            1
            for i, t in enumerate(exceed_t)
            if i == 0 or t - exceed_t[i - 1] > _RUN_GAP
        )
        assert int(r["n_exceed"]) == len(exceed_t)
        assert int(r["n_clusters"]) == n_clusters
        # estimator bounds: 1 <= clusters <= exceedances -> theta in (0,1]
        assert 1 <= n_clusters <= len(exceed_t)
        assert 0.0 < r["theta_hat"] <= 1.0
        # nearest-rank 90%: roughly a tenth of days exceed
        assert len(exceed_t) <= (n + 9) // 10 + 1


def test_teager_matches_replay(spark):
    rows = (
        REGISTRY["evt_teager_energy"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    d = _daily()
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        psi = [
            xs[t] * xs[t] - xs[t - 1] * xs[t + 1]
            for t in range(1, len(xs) - 1)
        ]
        assert int(r["n_psi"]) == len(psi)
        assert int(r["teager_sum"]) == sum(psi)
        assert int(r["n_negative"]) == sum(1 for p in psi if p < 0)
        assert int(r["psi_max"]) == max(psi)
