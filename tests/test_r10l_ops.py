"""Property gates for the round-10l batch (plans/queries_r10l.py):
brute-force the remainder histogram and the churn set algebra.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_digit_heaping_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_digit_heaping"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(r["event_type"], int(r["r"])): r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["c"] = (ev["value"].astype(float) * 100).round().astype("int64")
    ev["r"] = ev["c"].abs() % 100
    for et, g in ev.groupby("event_type"):
        want = Counter(int(v) for v in g["r"])
        n = len(g)
        for r0, c in want.items():
            row = got[(et, r0)]
            assert int(row["c"]) == c
            assert int(row["n"]) == n
        # only observed remainders appear; totals are consistent
        assert sum(
            int(v["c"]) for k, v in got.items() if k[0] == et
        ) == n
        # chi-square vs uniform assembles (100-cell, zero cells implied)
        chi2 = sum(
            (want.get(d, 0) - n / 100) ** 2 / (n / 100)
            for d in range(100)
        )
        assert chi2 >= 0
        # heap share of canonical cells is a valid fraction
        heap = sum(want.get(d, 0) for d in (0, 50, 99))
        assert 0 <= heap <= n


def test_assortment_churn_matches_set_algebra(spark):
    rows = (
        REGISTRY["rel_assortment_churn"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(int(r["month_key"]), r["nation"]): r for r in rows}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_suppkey", "l_partkey", "l_shipdate"]
    ]
    sup = pd.read_parquet(f"{SF}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    nat = pd.read_parquet(f"{SF}/nation.parquet")[
        ["n_nationkey", "n_name"]
    ]
    part = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_type"]]
    j = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(part, left_on="l_partkey", right_on="p_partkey")
    )
    ship = pd.to_datetime(j["l_shipdate"])
    j["mk"] = ship.dt.year * 12 + ship.dt.month
    pres: dict[tuple[int, str], set[str]] = {}
    for (mk, nn), g in j.groupby(["mk", "n_name"]):
        pres[(int(mk), nn)] = set(g["p_type"])
    months = sorted({mk for mk, _ in pres})
    nations = sorted({nn for _, nn in pres})
    expected_rows = 0
    for mk in months:
        if mk - 1 not in months:
            continue
        for nn in nations:
            cur = pres.get((mk, nn), set())
            prev = pres.get((mk - 1, nn), set())
            added, dropped, kept = (
                len(cur - prev),
                len(prev - cur),
                len(cur & prev),
            )
            if not cur and not prev:
                continue
            expected_rows += 1
            r = got[(mk, nn)]
            assert int(r["n_added"]) == added
            assert int(r["n_dropped"]) == dropped
            assert int(r["n_kept"]) == kept
            # set identity: kept + added = |cur|
            assert int(r["n_kept"]) + int(r["n_added"]) == len(cur)
    assert len(got) == expected_rows
