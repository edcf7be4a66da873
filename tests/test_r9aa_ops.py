"""Property gates for the round-9aa circular/inequality batch
(plans/queries_r9aa.py): brute-force resultant components from raw
parquet against an independent trig lattice, assemble the Rayleigh
statistic and the LAC, and pin their ranges.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_rayleigh_hours_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_rayleigh_hours"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet").copy()
    ev["h"] = ev["ts"].dt.hour
    cos_u = [round(math.cos(2 * math.pi * h / 24) * 1e6) for h in range(24)]
    sin_u = [round(math.sin(2 * math.pi * h / 24) * 1e6) for h in range(24)]
    assert set(got) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        cnt = Counter(int(h) for h in g["h"])
        n = sum(cnt.values())
        sc = sum(c * cos_u[h] for h, c in cnt.items())
        ss = sum(c * sin_u[h] for h, c in cnt.items())
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["sum_cos_u"]) == sc, et
        assert int(row["sum_sin_u"]) == ss, et
        assert int(row["peak_hour_count"]) == max(cnt.values())
        # assemble R-bar and the Rayleigh z; fixtures are ~uniform in
        # hour, so concentration must be small but the stat well-formed
        rbar = math.hypot(sc, ss) / (n * 1e6)
        assert 0.0 <= rbar <= 1.0
        z = n * rbar * rbar
        assert z >= 0.0 and math.isfinite(z)
        assert rbar < 0.5, (et, rbar)  # no strong hour concentration


def test_lorenz_asymmetry_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_lorenz_asymmetry"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    assert set(got) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        vs = [int(v) for v in g["v"]]
        n, sv = len(vs), sum(vs)
        n_below = sum(1 for v in vs if n * v < sv)
        sum_below = sum(v for v in vs if n * v < sv)
        n_at = sum(1 for v in vs if n * v == sv)
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["sum_v"]) == sv
        assert int(row["n_below"]) == n_below, et
        assert int(row["sum_below"]) == sum_below, et
        assert int(row["n_at_mean"]) == n_at
        # assemble LAC = F(mu) + L(mu); each term in [0, 1]
        f_mu = n_below / n
        l_mu = sum_below / sv
        lac = f_mu + l_mu
        assert 0.0 <= f_mu <= 1.0 and 0.0 <= l_mu <= 1.0
        assert 0.0 <= lac <= 2.0
        # below-mean values are below-average by definition
        if n_below:
            assert sum_below / n_below < sv / n
