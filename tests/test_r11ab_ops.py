"""Property gates for the round-11a/11b batches (rank-exact two-sample
tests and ordinal association): replay statistics in pandas/python and
assemble the textbook quantities the registry rows carry as exact
integer components.
"""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _pv(SF):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["event_type"].isin(["purchase", "view"])].copy()
    ev = ev[ev["value"].notna()]
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    return ev


def test_cramer_von_mises_matches_ecdf_replay(spark):
    rows = (
        REGISTRY["evt_cramer_von_mises"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    ev = _pv(SF)
    by_user = {int(u): g for u, g in ev.groupby("user_id")}
    for r in rows:
        g = by_user[int(r["user_id"])]
        # tie-broken pooled ordering, exactly the query's
        g = g.sort_values(["value_c", "event_id"]).reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        x = g[g["event_type"] == "purchase"]
        y = g[g["event_type"] == "view"]
        n, m = len(x), len(y)
        assert (int(r["n"]), int(r["m"])) == (n, m)
        u = n * sum(
            (rr - i) ** 2 for i, rr in enumerate(x["rank"], start=1)
        ) + m * sum(
            (rr - j) ** 2 for j, rr in enumerate(y["rank"], start=1)
        )
        assert int(r["u_stat"]) == u
        # the rational t_num/t_den equals the textbook criterion
        big_n = n + m
        t_direct = u / (n * m * big_n) - (4 * n * m - 1) / (6 * big_n)
        assert math.isclose(
            int(r["t_num"]) / int(r["t_den"]), t_direct, rel_tol=1e-12
        )
        # CvM criterion lower bound: T >= -(4nm-1)/(6N) by U >= 0, and
        # the *shifted* statistic T + (4nm-1)/(6N) = U/(nmN) >= 0
        assert int(r["t_num"]) >= -(n * m * (4 * n * m - 1))


def test_cucconi_assembles_and_is_nonnegative(spark):
    rows = (
        REGISTRY["evt_cucconi_test"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    ev = _pv(SF)
    by_user = {int(u): g for u, g in ev.groupby("user_id")}
    for r in rows:
        g = by_user[int(r["user_id"])]
        g = g.sort_values(["value_c", "event_id"]).reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        x = g[g["event_type"] == "purchase"]
        n, m = int(r["n"]), int(r["m"])
        big_n = n + m
        assert n == len(x) and m == len(g) - len(x)
        s1 = sum(int(v) ** 2 for v in x["rank"])
        s2 = sum((big_n + 1 - int(v)) ** 2 for v in x["rank"])
        assert (int(r["s1"]), int(r["s2"])) == (s1, s2)
        # standardized Cucconi assembly (the float seam lives HERE, in
        # the gate, not in the cross-engine row)
        mu = n * (big_n + 1) * (2 * big_n + 1) / 6
        var = (
            m
            * n
            * (big_n + 1)
            * (2 * big_n + 1)
            * (8 * big_n + 11)
            / 180
        )
        if var == 0:
            continue
        u_std = (s1 - mu) / math.sqrt(var)
        v_std = (s2 - mu) / math.sqrt(var)
        rho = (2 * (big_n * big_n - 4)) / (
            (2 * big_n + 1) * (8 * big_n + 11)
        ) - 1
        c_stat = (u_std**2 + v_std**2 - 2 * rho * u_std * v_std) / (
            2 * (1 - rho**2)
        )
        assert c_stat >= -1e-9


def test_hoeffding_d_matches_bruteforce_and_range(spark):
    rows = (
        REGISTRY["evt_hoeffding_d"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    daily = (
        ev.groupby(["event_type", "day"])
        .agg(tot_c=("value_c", "sum"), cnt=("value_c", "size"))
        .reset_index()
    )
    for r in rows:
        g = daily[daily["event_type"] == r["event_type"]].copy()
        n = len(g)
        assert int(r["n"]) == n
        g = g.sort_values(["tot_c", "day"]).reset_index(drop=True)
        g["rr"] = range(1, n + 1)
        g = g.sort_values(["cnt", "day"]).reset_index(drop=True)
        g["ss"] = range(1, n + 1)
        pts = list(zip(g["rr"], g["ss"]))
        q = {
            (rr, ss): sum(
                1 for r2, s2 in pts if r2 < rr and s2 < ss
            )
            for rr, ss in pts
        }
        a = sum(
            (rr - 1) * (rr - 2) * (ss - 1) * (ss - 2) for rr, ss in pts
        )
        b = sum((rr - 2) * (ss - 2) * q[(rr, ss)] for rr, ss in pts)
        c = sum(qi * (qi - 1) for qi in q.values())
        assert (int(r["a_sum"]), int(r["b_sum"]), int(r["c_sum"])) == (
            a,
            b,
            c,
        )
        if n >= 5:
            d_stat = (
                a - 2 * (n - 2) * b + (n - 2) * (n - 3) * c
            ) / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
            assert -0.5 - 1e-12 <= 30 * d_stat <= 1 + 1e-12


def test_gamma_pairs_bounded_by_total(spark):
    rows = (
        REGISTRY["rel_goodman_kruskal_gamma"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey"]]
    sizes = li.groupby("l_orderkey").size().clip(upper=7)
    orders = orders.set_index("o_orderkey")
    joined = pd.DataFrame(
        {
            "yr": pd.to_datetime(
                orders.loc[sizes.index, "o_orderdate"]
            ).dt.year,
            "x": orders.loc[sizes.index, "o_orderpriority"]
            .str[0]
            .astype(int),
            "y": sizes.values,
        }
    )
    for r in rows:
        g = joined[joined["yr"] == int(r["yr"])]
        grid = g.groupby(["x", "y"]).size()
        c = d = 0
        cells = list(grid.items())
        for (ax, ay), an in cells:
            for (bx, by), bn in cells:
                if bx > ax and by > ay:
                    c += an * bn
                elif bx > ax and by < ay:
                    d += an * bn
        assert (int(r["c_pairs"]), int(r["d_pairs"])) == (c, d)
        total_pairs = len(g) * (len(g) - 1) // 2
        assert c + d <= total_pairs
        if c + d:
            gamma = (c - d) / (c + d)
            assert -1 <= gamma <= 1


def test_somers_tie_decomposition_is_exact(spark):
    rows = (
        REGISTRY["evt_somers_d"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    for r in rows:
        n = int(r["n"])
        total = n * (n - 1) // 2
        parts = (
            int(r["c_pairs"])
            + int(r["d_pairs"])
            + int(r["t_x"])
            + int(r["t_y"])
            + int(r["t_xy"])
        )
        # the five pair classes PARTITION the pair set exactly
        assert parts == total, (r["event_type"], parts, total)
        den = int(r["c_pairs"]) + int(r["d_pairs"]) + int(r["t_y"])
        if den:
            d_yx = (int(r["c_pairs"]) - int(r["d_pairs"])) / den
            assert -1 <= d_yx <= 1
