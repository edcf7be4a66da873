"""Property gates for the round-9p FIFO/energy-distance batch
(plans/queries_r9p.py): a literal sequential FIFO queue depletion in
Python must equal the set-based window form, and brute-forced pair
sums must assemble a non-negative energy distance that is zero on
identical samples.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_fifo_cogs_matches_sequential_replay(spark):
    got = {
        int(r["l_partkey"]): r
        for r in REGISTRY["rel_fifo_cogs"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li.copy()
    li["q"] = li["l_quantity"].round().astype("int64")
    li["ep_c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    want_keys = set()
    for pk, g in li.groupby("l_partkey"):
        demand = int(g.loc[g["l_returnflag"] == "R", "q"].sum())
        if demand == 0:
            continue
        want_keys.add(int(pk))
        lots = g[g["l_returnflag"] != "R"].sort_values(
            ["l_shipdate", "l_orderkey", "l_linenumber"]
        )
        # literal FIFO queue depletion — the sequential textbook form
        remaining = demand
        matched = cost = used = 0
        for r in lots.itertuples():
            if remaining <= 0:
                break
            c = min(remaining, int(r.q))
            if c > 0:
                used += 1
                matched += c
                cost += (int(r.ep_c) * c) // int(r.q)
                remaining -= c
        row = got[int(pk)]
        assert int(row["demand_q"]) == demand
        assert int(row["matched_q"]) == matched, pk
        assert int(row["n_lots_used"]) == used, pk
        assert int(row["fifo_cost_c"]) == cost, pk
        # matched never exceeds demand or supply
        assert matched <= demand
        assert matched <= int(lots["q"].sum())
    assert set(got) == want_keys


def test_energy_distance_assembles_nonnegative(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_energy_distance"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    epoch = pd.Timestamp("2024-01-01").date()
    series = defaultdict(list)
    for (et, day), g in ev.groupby(["event_type", "day"]):
        if day < epoch:
            continue
        we = 1 if (day - epoch).days % 7 in (5, 6) else 0
        series[et].append((day, int(g["v"].sum()), we))
    assert set(got) == set(series)
    for et, rows in series.items():
        rows.sort()
        s_cross = s_wk = s_we = 0
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ad = abs(rows[i][1] - rows[j][1])
                wi, wj = rows[i][2], rows[j][2]
                if wi != wj:
                    s_cross += ad
                elif wi == 0:
                    s_wk += ad
                else:
                    s_we += ad
        r = got[et]
        assert int(r["s_cross"]) == s_cross, et
        assert int(r["s_wk"]) == s_wk, et
        assert int(r["s_we"]) == s_we, et
        n = sum(1 for x in rows if x[2] == 0)
        m = len(rows) - n
        # the emitted pair-type identity counts exactly the cross pairs
        assert int(r["cross_terms_wk"]) == n * m
        # assemble the V-statistic form (diagonal included, n²/m²
        # denominators) — that's the version with the guaranteed
        # non-negativity; U-statistic denominators can dip negative
        if n >= 2 and m >= 2:
            a_mean = s_cross / (n * m)
            b_mean = 2 * s_wk / (n * n)
            c_mean = 2 * s_we / (m * m)
            e = 2 * a_mean - b_mean - c_mean
            assert e >= -1e-9, (et, e)
