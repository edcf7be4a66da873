"""Property gates for the round-10f batch (plans/queries_r10f.py):
replay conformal calibration + coverage in Python and the BG/NBD
triples per user.
"""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _daily(ev: pd.DataFrame) -> dict[str, list[int]]:
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["c"] = (ev["value"].astype(float) * 100).round().astype("int64")
    d = ev.groupby(["event_type", "day"])["c"].sum().reset_index()
    return {
        et: [int(v) for v in g.sort_values("day")["c"]]
        for et, g in d.groupby("event_type")
    }


def test_conformal_matches_replay_and_is_valid(spark):
    rows = (
        REGISTRY["evt_conformal_prediction"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["event_type"]: r for r in rows}
    series = _daily(pd.read_parquet(f"{SF}/events.parquet"))
    for et, xs in series.items():
        n = len(xs)
        # residual at position t (2-indexed in day order)
        res = [(t + 2, abs(xs[t + 1] - xs[t])) for t in range(n - 1)]
        train = sorted(
            (r for t, r in res if 10 * t <= 7 * n),
        )
        test = [r for t, r in res if 10 * t > 7 * n]
        n_train = len(train)
        k = min(n_train, math.ceil(900 * (n_train + 1) / 1000))
        q = train[k - 1]
        covered = sum(1 for r in test if r <= q)
        r = got[et]
        assert int(r["n_train"]) == n_train
        assert int(r["q_c"]) == q
        assert int(r["n_test"]) == len(test)
        assert int(r["n_covered"]) == covered
        # conformal marginal validity direction: with exchangeable data
        # coverage concentrates near 90%; structurally, coverage is a
        # fraction and the quantile covers >= ceil(.9(n+1))/(n+1) of
        # the TRAIN residuals by construction
        n_train_le_q = sum(1 for v in train if v <= q)
        assert 1000 * n_train_le_q >= 900 * (n_train + 1) - 1000
        if test:
            assert 0 <= covered <= len(test)


def test_bgnbd_triples_match_replay(spark):
    rows = (
        REGISTRY["evt_bgnbd_summary"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["x"]): r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    p = ev[ev["event_type"] == "purchase"].copy()
    p["day"] = p["ts"].dt.date
    end = p["day"].max()
    want: dict[int, list[int]] = {}
    for _, g in p.groupby("user_id"):
        days = g["day"]
        x = len(g) - 1
        t_x = (days.max() - days.min()).days
        big_t = (end - days.min()).days
        acc = want.setdefault(x, [0, 0, 0])
        acc[0] += 1
        acc[1] += t_x
        acc[2] += big_t
        # model identities
        assert t_x <= big_t
        if x == 0:
            assert t_x == 0
    assert set(got) == set(want)
    for x, (nu, stx, st) in want.items():
        r = got[x]
        assert int(r["n_users"]) == nu
        assert int(r["sum_tx_days"]) == stx
        assert int(r["sum_t_days"]) == st
