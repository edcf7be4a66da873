"""Property gates for the round-10j batch (plans/queries_r10j.py):
replay the purged-CV window accounting and the lead-time scorecard.
"""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_K, _H, _E = 5, 2, 3


def test_purged_cv_accounting_matches_replay(spark):
    rows = (
        REGISTRY["evt_purged_cv_folds"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(r["event_type"], int(r["fold"])): r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    for et, g in ev.groupby("event_type"):
        days = sorted(set(g["day"]))
        n = len(days)
        folds: dict[int, list[int]] = {}
        for r0, _ in enumerate(days):
            folds.setdefault((r0 * _K) // n, []).append(r0 + 1)
        assert len(folds) == _K
        for fid, ranks in folds.items():
            lo, hi = min(ranks), max(ranks)
            # contiguity of rank blocks
            assert ranks == list(range(lo, hi + 1))
            n_test = len(ranks)
            n_train = sum(
                1
                for r in range(1, n + 1)
                if r < lo - _H or r > hi + _E
            )
            rr = got[(et, fid)]
            assert int(rr["n_test"]) == n_test
            assert int(rr["n_train"]) == n_train
            assert int(rr["n_excluded"]) == n - n_test - n_train
            # the no-leak audit identity
            assert (
                int(rr["n_test"])
                + int(rr["n_train"])
                + int(rr["n_excluded"])
                == n
            )
            # purge/embargo really exclude something for interior folds
            if lo > _H and hi + _E <= n:
                assert int(rr["n_excluded"]) > 0


def test_leadtime_scorecard_matches_replay(spark):
    rows = (
        REGISTRY["rel_leadtime_reliability"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["nation"]: r for r in rows}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey", "l_shipdate"]
    ]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_orderdate"]
    ]
    sup = pd.read_parquet(f"{SF}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    nat = pd.read_parquet(f"{SF}/nation.parquet")[
        ["n_nationkey", "n_name"]
    ]
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    )
    j["lead"] = (
        pd.to_datetime(j["l_shipdate"]).dt.normalize()
        - pd.to_datetime(j["o_orderdate"]).dt.normalize()
    ).dt.days
    for name, g in j.groupby("n_name"):
        leads = [int(v) for v in g["lead"]]
        r = got[name]
        assert int(r["n_lines"]) == len(leads)
        assert int(r["n_on_time"]) == sum(1 for d in leads if d <= 30)
        assert int(r["sum_lead_d"]) == sum(leads)
        assert int(r["sum_lead_d2"]) == sum(d * d for d in leads)
        assert int(r["sum_late_d"]) == sum(
            max(d - 30, 0) for d in leads
        )
        # the reliability CV assembles
        n = len(leads)
        mean = sum(leads) / n
        var = sum(d * d for d in leads) / n - mean * mean
        assert var >= 0
        if mean > 0:
            cv = math.sqrt(var) / mean
            assert math.isfinite(cv)
