"""Property gates for the round-9ab robust-shape/MRP batch
(plans/queries_r9ab.py): brute-force octiles and the weekly balance
replay; assemble Bowley/Moors and pin their ranges.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
EPOCH = pd.Timestamp("1995-01-01").date()


def test_robust_shape_quantiles_and_bowley_moors(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_robust_shape_quantiles"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        vs = sorted(int(v) for v in g["v"])
        n = len(vs)
        row = got[et]
        assert int(row["n"]) == n
        es = []
        for i in range(1, 8):
            # nearest-rank: smallest v with 8*rank >= i*n
            want = next(
                v for r, v in enumerate(vs, start=1) if 8 * r >= i * n
            )
            assert int(row[f"e{i}"]) == want, (et, i)
            es.append(want)
        # octile monotonicity
        assert es == sorted(es)
        q1, q2, q3 = es[1], es[3], es[5]
        if q3 > q1:
            bowley = (q3 - 2 * q2 + q1) / (q3 - q1)
            assert -1.0 <= bowley <= 1.0
        if es[5] > es[1]:
            moors = ((es[6] - es[4]) + (es[2] - es[0])) / (es[5] - es[1])
            assert moors > 0.0
    assert set(got) == set(ev["event_type"].unique())


def test_mrp_projection_matches_replay(spark):
    got = {
        int(r["l_partkey"]): r
        for r in REGISTRY["rel_mrp_projection"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_orderdate"]
    ]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    events = defaultdict(lambda: defaultdict(int))
    for r in m.itertuples():
        q = int(round(r.l_quantity))
        od = r.o_orderdate.date()
        sd = r.l_shipdate.date()
        if od >= EPOCH:
            events[int(r.l_partkey)][(od - EPOCH).days // 7] -= q
        if sd >= EPOCH:
            events[int(r.l_partkey)][(sd - EPOCH).days // 7] += q
    assert set(got) == set(events)
    for pk, weekly in events.items():
        bal = 0
        min_bal = None
        first_short = -1
        end_bal = None
        for wk in sorted(weekly):
            bal += weekly[wk]
            min_bal = bal if min_bal is None else min(min_bal, bal)
            if bal < 0 and first_short == -1:
                first_short = wk
            end_bal = bal
        row = got[pk]
        assert int(row["n_weeks"]) == len(weekly)
        assert int(row["min_balance"]) == min_bal, pk
        assert int(row["first_short_week"]) == first_short, pk
        assert int(row["end_balance"]) == end_bal, pk
        # all quantity eventually ships: the ending balance is the net
        # of epoch-window clipping only (receipts == demand rows here),
        # so it equals total receipts - total demand
        assert end_bal == sum(weekly.values())
