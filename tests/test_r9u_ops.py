"""Property gates for the round-9u auction/copula batch
(plans/queries_r9u.py): a literal price-ordered sequential clearing in
Python must match the window form; copula margins must equal the
pinned decile-arithmetic prediction exactly.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_auction_clearing_matches_sequential_replay(spark):
    got = {
        int(r["l_partkey"]): r
        for r in REGISTRY["rel_auction_clearing"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet").copy()
    li["q"] = li["l_quantity"].round().astype("int64")
    li["u_c"] = (
        (li["l_extendedprice"] * 100).round().astype("int64") // li["q"]
    )
    assert set(got) == set(int(k) for k in li["l_partkey"].unique())
    for pk, g in li.groupby("l_partkey"):
        bids = sorted(
            zip(g["u_c"], g["l_orderkey"], g["l_linenumber"], g["q"]),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        tq = int(g["q"].sum())
        supply = tq // 2
        rem, winners, cleared, pab, clearing = supply, 0, 0, 0, None
        for u, _, _, q in bids:
            alloc = min(rem, int(q))
            if alloc > 0:
                winners += 1
                cleared += alloc
                pab += int(u) * alloc
                clearing = int(u)  # lowest accepted so far
                rem -= alloc
            if rem == 0:
                break
        row = got[int(pk)]
        assert int(row["n_bids"]) == len(bids)
        assert int(row["supply"]) == supply
        assert int(row["n_winners"]) == winners, pk
        assert int(row["cleared_q"]) == cleared == supply
        assert int(row["clearing_price_c"]) == clearing, pk
        assert int(row["payasbid_revenue_c"]) == pab, pk
        assert int(row["uniform_revenue_c"]) == supply * clearing
        # mechanism sanity: pay-as-bid never collects less than uniform
        assert pab >= supply * clearing


def test_empirical_copula_margins_and_mass(spark):
    rows = (
        REGISTRY["evt_empirical_copula"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    n = int(rows[0]["n"])
    grid = {
        (int(r["u_dec"]), int(r["v_dec"])): int(r["c"]) for r in rows
    }
    assert sum(grid.values()) == n
    # pinned decile arithmetic predicts the margin sizes exactly:
    # cell d holds ranks r with (10*(r-1)) DIV n == d
    want_margin = Counter((10 * (r - 1)) // n for r in range(1, n + 1))
    u_margin = defaultdict(int)
    v_margin = defaultdict(int)
    for (u, v), c in grid.items():
        assert 0 <= u <= 9 and 0 <= v <= 9
        u_margin[u] += c
        v_margin[v] += c
    assert dict(u_margin) == dict(want_margin)
    assert dict(v_margin) == dict(want_margin)
    # brute-force the joint cells from raw parquet
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    days = sorted(ev["day"].unique())
    xs, ys = [], []
    for day in days:
        g = ev[ev["day"] == day]
        xs.append(int(g.loc[g["event_type"] == "purchase", "v"].sum()))
        ys.append(int(g.loc[g["event_type"] == "view", "v"].sum()))
    order_x = sorted(range(len(days)), key=lambda i: (xs[i], days[i]))
    order_y = sorted(range(len(days)), key=lambda i: (ys[i], days[i]))
    rx = {i: k + 1 for k, i in enumerate(order_x)}
    ry = {i: k + 1 for k, i in enumerate(order_y)}
    want = Counter(
        ((10 * (rx[i] - 1)) // n, (10 * (ry[i] - 1)) // n)
        for i in range(len(days))
    )
    assert grid == dict(want)
