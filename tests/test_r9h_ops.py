"""Property gates for the round-9h extremes/feature-diagnostics batch
(plans/queries_r9h.py): brute-force the daily tail co-exceedance and
the WOE quintile table from raw parquet rows; assemble IV against a
float reference.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_LN_U = 1000000


def test_tail_dependence_matches_bruteforce(spark):
    row = (
        REGISTRY["evt_tail_dependence"]
        .spark_fn(spark, SF)
        .toPandas()
        .iloc[0]
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    days = defaultdict(lambda: [0, 0])
    for r in ev.itertuples():
        d = pd.Timestamp(r.ts).date()
        c = int(round(float(r.value) * 100))
        if r.event_type == "purchase":
            days[d][0] += c
        elif r.event_type == "view":
            days[d][1] += c
    n = len(days)
    xs = sorted((x, d) for d, (x, _) in days.items())
    ys = sorted((y, d) for d, (_, y) in days.items())
    k = -((-9 * n) // 10)  # ceil(0.9 n): first rank with 10r >= 9n
    ux, uy = xs[k - 1][0], ys[k - 1][0]
    n_x = sum(1 for x, _ in days.values() if x >= ux)
    n_y = sum(1 for _, y in days.values() if y >= uy)
    n_b = sum(1 for x, y in days.values() if x >= ux and y >= uy)
    assert int(row["n_days"]) == n
    assert int(row["u_x"]) == ux and int(row["u_y"]) == uy
    assert int(row["n_x_hi"]) == n_x and int(row["n_y_hi"]) == n_y
    assert int(row["n_both_hi"]) == n_b
    assert int(row["lambda_u_bp"]) == n_b * 10000 // max(n_x, 1)
    # structure: both exceedance sets are ~10% and lambda is a valid
    # conditional probability
    assert n_b <= min(n_x, n_y)
    assert 0 <= int(row["lambda_u_bp"]) <= 10000


def test_information_value_matches_bruteforce(spark):
    got = {
        int(r["bin"]): r
        for r in REGISTRY["evt_information_value"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    epoch = pd.Timestamp("2024-01-01").date()
    score = defaultdict(int)
    y = defaultdict(int)
    for r in ev.itertuples():
        wk = (pd.Timestamp(r.ts).date() - epoch).days // 7
        key = (int(r.user_id), wk)
        score[key] += int(round(float(r.value) * 100))
        if r.event_type == "purchase":
            y[key] = 1
    order = sorted(score, key=lambda k: (-score[k], k[0], k[1]))
    nu = len(order)
    bins = defaultdict(lambda: [0, 0, 0])  # n, goods, bads
    for rn, key in enumerate(order, start=1):
        b = (5 * (rn - 1)) // nu + 1
        s = bins[b]
        s[0] += 1
        s[1] += y.get(key, 0)
        s[2] += 1 - y.get(key, 0)
    gt = sum(v[1] for v in bins.values())
    bt = sum(v[2] for v in bins.values())
    assert set(got) == set(bins) == {1, 2, 3, 4, 5}
    for b, (n, g, bad) in bins.items():
        row = got[b]
        assert (int(row["n"]), int(row["goods"]), int(row["bads"])) == (
            n, g, bad,
        )
        assert int(row["total_goods"]) == gt
        assert int(row["total_bads"]) == bt
        woe = (
            round(math.log((g * bt) / (bad * gt)) * _LN_U)
            if g > 0 and bad > 0
            else 0
        )
        assert int(row["woe_u"]) == woe
    if gt == 0 or bt == 0:
        # degenerate outcome column (tiny fixture: one class absent):
        # every WOE must carry the 0 sentinel, IV is undefined
        assert all(int(r["woe_u"]) == 0 for r in got.values())
        return
    iv = sum(
        (g / gt - bad / bt) * (int(got[b]["woe_u"]) / _LN_U)
        for b, (n, g, bad) in bins.items()
    )
    iv_direct = sum(
        (g / gt - bad / bt) * math.log((g / gt) / (bad / bt))
        for _, g, bad in bins.values()
        if g > 0 and bad > 0
    )
    # assembled IV matches the float reference within quantization and
    # is non-negative (each WOE term has the sign of its weight)
    assert abs(iv - iv_direct) < 1e-4
    assert iv >= -1e-9
