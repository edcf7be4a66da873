"""Property gates for the round-11h batch: Ruzicka weighted-Jaccard
identities and Kendall's W assembly.
"""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_ruzicka_matches_vector_replay(spark):
    rows = (
        REGISTRY["rel_ruzicka_similarity"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"]
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
    import numpy as np

    # HALF_UP like Spark's F.round / DuckDB round — pandas .round() is
    # half-to-even and diverges on exact half-cents
    j["rev_c"] = np.floor(
        j["l_extendedprice"] * (1 - j["l_discount"]) * 100 + 0.5
    ).astype("int64")
    vecs: dict[str, dict[str, int]] = {}
    for (n, p), g in j.groupby(["n_name", "p_type"]):
        vecs.setdefault(n, {})[p] = int(g["rev_c"].sum())
    for r in rows:
        a, b = vecs[r["nation_a"]], vecs[r["nation_b"]]
        keys = set(a) | set(b)
        mins = sum(min(a.get(k, 0), b.get(k, 0)) for k in keys)
        maxs = sum(max(a.get(k, 0), b.get(k, 0)) for k in keys)
        assert int(r["min_sum_c"]) == mins
        assert int(r["max_sum_c"]) == maxs
        # Ruzicka similarity assembles and is a valid [0, 1] measure,
        # bounded above by the SET Jaccard trivially at 1
        assert 0 <= mins <= maxs
        if maxs:
            assert 0 <= mins / maxs <= 1


def test_kendall_w_assembles_in_unit_interval(spark):
    row = (
        REGISTRY["evt_kendall_w"].spark_fn(spark, SF).toPandas().iloc[0]
    )
    n, k = int(row["n"]), int(row["k"])
    sum_r, sum_r2 = int(row["sum_r"]), int(row["sum_r2"])
    assert n >= 3 and k >= 2
    # each full day receives one rank from each judge; total rank mass
    # is k * n(n+1)/2 exactly
    assert sum_r == k * n * (n + 1) // 2
    s_stat = sum_r2 - sum_r * sum_r / n
    w = 12 * s_stat / (k * k * n * (n * n - 1))
    assert -1e-12 <= w <= 1 + 1e-12
    # replay in pandas
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    d = (
        ev.groupby(["event_type", "day"])["value_c"]
        .sum()
        .reset_index(name="x")
    )
    n_types = d["event_type"].nunique()
    full = d.groupby("day").size()
    full_days = set(full[full == n_types].index)
    d = d[d["day"].isin(full_days)]
    d = d.sort_values(["event_type", "x", "day"])
    d["r"] = d.groupby("event_type").cumcount() + 1
    rsum = d.groupby("day")["r"].sum()
    assert n == len(rsum) and k == n_types
    assert sum_r2 == int((rsum**2).sum())
