"""Property gates for the round-6h operators (plans/queries_r6h.py)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
    t,
)

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


# ------------------------------------------------- standardized rates


def test_standardized_rates_match_bruteforce(spark):
    df = _run(spark, "evt_standardized_rates").set_index("event_type")
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_type", F.hour("ts").alias("h"), "value_c")
        .toPandas()
    )
    rows["band"] = rows["h"] // 6
    rows["hi"] = (rows["value_c"] >= 5000).astype(int)
    gN = len(rows)
    gn = rows.groupby("band").size()
    gx = rows.groupby("band")["hi"].sum()
    for et, g in rows.groupby("event_type"):
        n = len(g)
        obs = int(g["hi"].sum())
        assert int(df.loc[et, "n"]) == n
        assert int(df.loc[et, "observed"]) == obs
        assert int(df.loc[et, "crude_bp"]) == obs * 10000 // n
        direct = sum(
            (g[g["band"] == b]["hi"].sum() / max(len(g[g["band"] == b]), 1))
            * (gn[b] / gN)
            for b in range(4)
        )
        expected = sum(
            len(g[g["band"] == b]) * gx[b] / gn[b] for b in range(4)
        )
        assert float(df.loc[et, "direct_rate"]) == pytest.approx(
            direct, rel=1e-9
        )
        assert float(df.loc[et, "expected"]) == pytest.approx(
            expected, rel=1e-9
        )
        assert float(df.loc[et, "smr"]) == pytest.approx(
            obs / expected, rel=1e-9
        )
    # indirect standardization conserves: sum of expected == total observed
    assert df["expected"].sum() == pytest.approx(
        int(rows["hi"].sum()), rel=1e-9
    )


# ------------------------------------------------- gains table


def test_gains_table_matches_bruteforce(spark):
    df = _run(spark, "evt_gains_table").set_index("decile").sort_index()
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_type", "value_c")
        .toPandas()
    )
    per = rows.groupby("user_id").agg(
        score=("value_c", "sum"),
    )
    per["buyer"] = (
        rows[rows["event_type"] == "purchase"].groupby("user_id").size()
        .reindex(per.index, fill_value=0)
        > 0
    ).astype(int)
    order = sorted(per.index, key=lambda u: (-per.loc[u, "score"], u))
    n = len(order)
    # pinned integer deciles: rank rn -> (10*(rn-1))//n + 1, so the
    # decile boundaries sit at ceil(d*n/10) (extras spread, not
    # front-loaded like ntile — the convention is OURS, not an engine's)
    bounds = [-((-d * n) // 10) for d in range(11)]
    sizes = [bounds[d] - bounds[d - 1] for d in range(1, 11)]
    total_buyers = int(per["buyer"].sum())
    idx, cum = 0, 0
    for d in range(1, 11):
        chunk = order[idx: idx + sizes[d - 1]]
        idx += sizes[d - 1]
        buyers = int(per.loc[chunk, "buyer"].sum())
        cum += buyers
        assert int(df.loc[d, "n_users"]) == sizes[d - 1]
        assert int(df.loc[d, "buyers"]) == buyers
        assert int(df.loc[d, "cum_buyers"]) == cum
        assert int(df.loc[d, "capture_bp"]) == cum * 10000 // total_buyers
        assert (
            int(df.loc[d, "lift_bp"])
            == buyers * n * 10000 // (sizes[d - 1] * total_buyers)
        )
    assert cum == total_buyers
    assert int(df.loc[10, "capture_bp"]) == 10000
    # lift is (weakly) decreasing only if score orders buyers well;
    # top decile must beat global rate for a sane score
    assert int(df.loc[1, "lift_bp"]) >= 10000


# ------------------------------------------------- ABC-XYZ


def test_abc_xyz_matches_bruteforce(spark):
    df = _run(spark, "rel_abc_xyz")
    li = t(spark, SF, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"
    ).toPandas()
    li["rev_c"] = (li["l_extendedprice"] * 100).round().astype(int)
    li["qty"] = li["l_quantity"].round().astype(int)
    li["wk"] = li["l_shipdate"].dt.isocalendar().week
    li["yr"] = li["l_shipdate"].dt.year
    rev = li.groupby("l_partkey")["rev_c"].sum()
    tot = int(rev.sum())
    order = sorted(rev.index, key=lambda p: (-rev[p], p))
    abc = {}
    cum = 0
    for p in order:
        cum += int(rev[p])
        abc[p] = "A" if cum * 100 <= tot * 80 else (
            "B" if cum * 100 <= tot * 95 else "C"
        )
    wdem = li.groupby(["l_partkey", "yr", "wk"])["qty"].sum()
    xyz = {}
    for p in rev.index:
        w = wdem.loc[p].tolist()
        nw, s, q = len(w), sum(w), sum(x * x for x in w)
        vn = nw * q - s * s
        xyz[p] = "X" if 4 * vn <= s * s else ("Y" if vn <= s * s else "Z")
    want = Counter((abc[p], xyz[p]) for p in rev.index)
    got = {
        (r["abc"], r["xyz"]): int(r["n_parts"]) for _, r in df.iterrows()
    }
    assert got == dict(want)
    assert int(df["n_parts"].sum()) == len(rev)
    assert int(df["revenue_c"].sum()) == tot
