"""Property gates for the round-10e batch (plans/queries_r10e.py):
replay the nation portfolios as Python sets and the SampEn template
matching as a brute-force double loop.
"""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_R = 40000


def test_portfolio_overlap_matches_set_replay(spark):
    rows = (
        REGISTRY["rel_nation_portfolio_overlap"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(r["nation_a"], r["nation_b"]): r for r in rows}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_suppkey", "l_partkey"]
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
    ports: dict[str, set[str]] = {}
    for n, g in j.groupby("n_name"):
        ports[n] = set(g["p_type"])
    nations = sorted(ports)
    want = {}
    for i, a in enumerate(nations):
        for b in nations[i + 1 :]:
            c = len(ports[a] & ports[b])
            if c:
                want[(a, b)] = c
    assert set(got) == set(want)
    for (a, b), c in want.items():
        r = got[(a, b)]
        assert int(r["n_common"]) == c
        assert int(r["n_types_a"]) == len(ports[a])
        assert int(r["n_types_b"]) == len(ports[b])
        # Jaccard assembles and is a valid overlap coefficient
        jac = c / (len(ports[a]) + len(ports[b]) - c)
        assert 0 < jac <= 1


def test_sample_entropy_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_sample_entropy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["event_type"]: r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["c"] = (ev["value"].astype(float) * 100).round().astype("int64")
    d = ev.groupby(["event_type", "day"])["c"].sum().reset_index()
    for et, g in d.groupby("event_type"):
        xs = [int(v) for v in g.sort_values("day")["c"]]
        n = len(xs)
        b_m2 = a_m3 = pairs = 0
        for i in range(n - 1):
            for jj in range(i + 1, n - 1):
                pairs += 1
                if (
                    abs(xs[i] - xs[jj]) <= _R
                    and abs(xs[i + 1] - xs[jj + 1]) <= _R
                ):
                    b_m2 += 1
                    if (
                        i + 2 < n
                        and jj + 2 < n
                        and abs(xs[i + 2] - xs[jj + 2]) <= _R
                    ):
                        a_m3 += 1
        r = got[et]
        assert int(r["n_pairs"]) == pairs
        assert int(r["b_m2"]) == b_m2
        assert int(r["a_m3"]) == a_m3
        # SampEn assembles; tolerance chosen so both counts populate
        assert 0 < a_m3 <= b_m2
        sampen = -math.log(a_m3 / b_m2)
        assert sampen >= 0 and math.isfinite(sampen)
