"""Property gates for the round-9r seasonal-trend/lead-lag batch
(plans/queries_r9r.py): tie-aware brute force of the seasonal MK
statistic, literal triple-counting for transfer entropy, and the
Jensen non-negativity of plug-in conditional MI.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
EPOCH = pd.Timestamp("2024-01-01").date()


def _daily_by_type():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    out = defaultdict(dict)
    for (et, day), g in ev.groupby(["event_type", "day"]):
        if day >= EPOCH:
            out[et][day] = int(g["v"].sum())
    return out


def test_seasonal_mann_kendall_matches_bruteforce(spark):
    df = (
        REGISTRY["evt_seasonal_mann_kendall"]
        .spark_fn(spark, SF)
        .toPandas()
    )
    got = {
        (r["event_type"], int(r["wd"])): r for r in df.to_dict("records")
    }
    daily = _daily_by_type()
    want_keys = set()
    for et, days in daily.items():
        seasons = defaultdict(list)
        for day in sorted(days):
            seasons[(day - EPOCH).days % 7].append(days[day])
        for wd, xs in seasons.items():
            want_keys.add((et, wd))
            n = len(xs)
            s = sum(
                (xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(n)
                for j in range(i + 1, n)
            )
            row = got[(et, wd)]
            assert int(row["n_wd"]) == n
            assert int(row["s_wd"]) == s, (et, wd)
            assert int(row["var_num18"]) == n * (n - 1) * (2 * n + 5)
    assert set(got) == want_keys
    # assemble Z per type over summed seasons; |S| bounded by pair count
    for et in daily:
        rows = [r for (e, _), r in got.items() if e == et]
        s_tot = sum(int(r["s_wd"]) for r in rows)
        var = sum(int(r["var_num18"]) for r in rows) / 18.0
        assert var > 0
        corr = -1 if s_tot > 0 else (1 if s_tot < 0 else 0)
        z = (s_tot + corr) / math.sqrt(var)
        assert math.isfinite(z)
        max_pairs = sum(
            int(r["n_wd"]) * (int(r["n_wd"]) - 1) // 2 for r in rows
        )
        assert abs(s_tot) <= max_pairs


def _te_from_counts(counts):
    n = sum(counts.values())
    p3 = {k: c / n for k, c in counts.items()}
    p_yp = Counter()
    p_y_yp = Counter()
    p_yp_xq = Counter()
    for (y, yp, xq), c in counts.items():
        p_yp[yp] += c / n
        p_y_yp[(y, yp)] += c / n
        p_yp_xq[(yp, xq)] += c / n
    te = 0.0
    for (y, yp, xq), p in p3.items():
        te += p * math.log(
            p * p_yp[yp] / (p_y_yp[(y, yp)] * p_yp_xq[(yp, xq)])
        )
    return te


def test_transfer_entropy_counts_and_nonnegativity(spark):
    df = (
        REGISTRY["evt_transfer_entropy"].spark_fn(spark, SF).toPandas()
    )
    got = defaultdict(dict)
    for r in df.to_dict("records"):
        got[r["direction"]][
            (int(r["y_t"]), int(r["y_prev"]), int(r["x_prev"]))
        ] = int(r["c"])
    daily = _daily_by_type()
    # rebuild the GLOBAL day frame (all days incl. pre-epoch none here)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    days = sorted(ev["day"].unique())
    xp, xv = [], []
    for day in days:
        g = ev[ev["day"] == day]
        xp.append(int(g.loc[g["event_type"] == "purchase", "v"].sum()))
        xv.append(int(g.loc[g["event_type"] == "view", "v"].sum()))
    up = [0] + [1 if xp[i] > xp[i - 1] else 0 for i in range(1, len(xp))]
    uv = [0] + [1 if xv[i] > xv[i - 1] else 0 for i in range(1, len(xv))]
    want = {"p2v": Counter(), "v2p": Counter()}
    for i in range(2, len(days)):
        want["p2v"][(uv[i], uv[i - 1], up[i - 1])] += 1
        want["v2p"][(up[i], up[i - 1], uv[i - 1])] += 1
    for direction in ("p2v", "v2p"):
        assert got[direction] == dict(want[direction]), direction
        te = _te_from_counts(got[direction])
        assert te >= -1e-12, (direction, te)  # Jensen
        # TE is bounded by the entropy of the target's next move
        assert te <= math.log(2.0) + 1e-12
