"""Property gates for the round-6g operators (plans/queries_r6g.py).

Each statistic recomputed from raw rows in plain Python (midranks by
sorting, 2x2 tables by dict) — pinning the algorithm.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"
TYPES = ["click", "error", "purchase", "signup", "view"]


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


def _events(spark):
    return (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_type", "value_c", F.dayofmonth("ts").alias("dom"))
        .toPandas()
    )


# ------------------------------------------------- Tukey


def test_tukey_pairs_match_anova_and_bruteforce(spark):
    df = _run(spark, "evt_tukey_pairs")
    assert len(df) == 10
    rows = _events(spark)
    groups = {
        et: g["value_c"].astype(float).tolist()
        for et, g in rows.groupby("event_type")
    }
    n = len(rows)
    k = len(groups)
    ssw = sum(
        sum(x**2 for x in v) - sum(v) ** 2 / len(v) for v in groups.values()
    )
    msw = ssw / (n - k)
    for _, r in df.iterrows():
        a, b = r["type_a"], r["type_b"]
        va, vb = groups[a], groups[b]
        diff = sum(va) / len(va) - sum(vb) / len(vb)
        q = abs(diff) / math.sqrt(msw / 2 * (1 / len(va) + 1 / len(vb)))
        assert int(r["n_a"]) == len(va) and int(r["n_b"]) == len(vb)
        assert float(r["mean_diff_c"]) == pytest.approx(diff, rel=1e-9)
        assert float(r["q_stat"]) == pytest.approx(q, rel=1e-9)
    # all 10 unordered pairs present exactly once
    assert len({tuple(sorted((r["type_a"], r["type_b"]))) for _, r in df.iterrows()}) == 10


# ------------------------------------------------- Wilcoxon


def test_wilcoxon_matches_bruteforce(spark):
    df = _run(spark, "evt_wilcoxon_signed_rank")
    r = df.iloc[0]
    rows = _events(spark)
    diffs = []
    for uid, g in rows.groupby("user_id"):
        d = int(g.loc[g["dom"] <= 15, "value_c"].sum()) - int(
            g.loc[g["dom"] > 15, "value_c"].sum()
        )
        if d != 0:
            diffs.append(d)
    n = len(diffs)
    cnt = Counter(abs(d) for d in diffs)
    below, mid = 0, {}
    for v in sorted(cnt):
        mid[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    w_plus = sum(mid[abs(d)] for d in diffs if d > 0)
    w_minus = sum(mid[abs(d)] for d in diffs if d < 0)
    ties = sum(c**3 - c for c in cnt.values())
    assert int(r["n"]) == n
    assert int(r["w_plus2"]) == int(2 * w_plus)
    assert int(r["w_minus2"]) == int(2 * w_minus)
    # rank-sum identity
    assert int(r["w_plus2"]) + int(r["w_minus2"]) == n * (n + 1)
    assert int(r["tie_cubes"]) == ties
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    )
    assert float(r["z"]) == pytest.approx(z, rel=1e-9)


# ------------------------------------------------- McNemar


def test_mcnemar_matches_bruteforce(spark):
    df = _run(spark, "evt_mcnemar_test")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .select("user_id", "event_type", F.dayofmonth("ts").alias("dom"))
        .toPandas()
    )
    b = c = yy = nn = 0
    for uid, g in rows.groupby("user_id"):
        p = g[g["event_type"] == "purchase"]
        p1 = (p["dom"] <= 15).any()
        p2 = (p["dom"] > 15).any()
        yy += p1 and p2
        b += p1 and not p2
        c += p2 and not p1
        nn += not p1 and not p2
    assert int(r["both_yes"]) == yy
    assert int(r["only_first"]) == b
    assert int(r["only_second"]) == c
    assert int(r["both_no"]) == nn
    if b + c:
        assert float(r["chi2"]) == pytest.approx((b - c) ** 2 / (b + c), rel=1e-12)
        assert float(r["chi2_cc"]) == pytest.approx(
            (abs(b - c) - 1) ** 2 / (b + c), rel=1e-12
        )


# ------------------------------------------------- kappa


def test_kappa_matches_bruteforce(spark):
    df = _run(spark, "evt_cohens_kappa")
    r = df.iloc[0]
    rows = _events(spark)
    per = rows.groupby("user_id").agg(
        total=("value_c", "sum"), n=("value_c", "size")
    )
    n = len(per)
    half = n // 2
    # deterministic tie-break (metric desc, user_id asc)
    order_val = sorted(per.index, key=lambda u: (-per.loc[u, "total"], u))
    order_cnt = sorted(per.index, key=lambda u: (-per.loc[u, "n"], u))
    by_val = set(order_val[:half])
    by_cnt = set(order_cnt[:half])
    yy = len(by_val & by_cnt)
    yn = len(by_val - by_cnt)
    ny = len(by_cnt - by_val)
    nn = n - yy - yn - ny
    assert (int(r["yy"]), int(r["yn"]), int(r["ny"]), int(r["nn"])) == (
        yy, yn, ny, nn,
    )
    po = (yy + nn) / n
    pe = ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / n**2
    kappa = (po - pe) / (1 - pe)
    assert float(r["kappa"]) == pytest.approx(kappa, rel=1e-9)
    assert -1.0 <= float(r["kappa"]) <= 1.0
