"""Property gates for the round-6l operators (plans/queries_r6l.py)."""

from __future__ import annotations

import math
from collections import Counter

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


def test_mood_median_matches_bruteforce(spark):
    df = _run(spark, "evt_mood_median_test")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value_c")
        .toPandas()
    )
    vals = sorted(rows["value_c"])
    n = len(vals)
    # median-low: smallest v with 2*cum >= n
    cnt = Counter(vals)
    cum = 0
    med = None
    for v in sorted(cnt):
        cum += cnt[v]
        if 2 * cum >= n:
            med = v
            break
    assert int(r["median_c"]) == med
    ta = int((rows["value_c"] > med).sum())
    assert int(r["n"]) == n
    assert int(r["n_above"]) == ta
    chi = 0.0
    p = ta / n
    for et, g in rows.groupby("event_type"):
        ng = len(g)
        ag = int((g["value_c"] > med).sum())
        e = ng * p
        chi += (ag - e) ** 2 / (e * (1 - p))
    assert float(r["chi2"]) == pytest.approx(chi, rel=1e-9)
    # roughly half the mass sits above the median-low
    assert abs(ta - n / 2) <= max(cnt.values()) + 1


def test_newsvendor_matches_bruteforce(spark):
    df = _run(spark, "rel_newsvendor_stock")
    r = df.iloc[0]
    li = t(spark, SF, "lineitem").select(
        "l_partkey", "l_quantity", "l_shipdate"
    ).toPandas()
    li["qty"] = li["l_quantity"].round().astype(int)
    li["wk"] = li["l_shipdate"].dt.isocalendar().week
    li["yr"] = li["l_shipdate"].dt.year
    wdem = li.groupby(["l_partkey", "yr", "wk"])["qty"].sum()
    total_stock = 0
    n_above = 0
    mn, mx = math.inf, -math.inf
    parts = wdem.index.get_level_values(0).unique()
    for pk in parts:
        w = sorted(wdem.loc[pk].tolist())
        nw = len(w)
        # nearest-rank 2/3 quantile: smallest rank with 3*rank >= 2*n
        rank = -(-2 * nw // 3)  # ceil(2n/3)
        q = w[rank - 1]
        total_stock += q
        if q * nw > sum(w):
            n_above += 1
        mn, mx = min(mn, q), max(mx, q)
    assert int(r["n_parts"]) == len(parts)
    assert int(r["total_stock_units"]) == total_stock
    assert int(r["total_demand_units"]) == int(wdem.sum())
    assert int(r["n_above_mean"]) == n_above
    assert int(r["min_q"]) == mn
    assert int(r["max_q"]) == mx
    # the 2/3 quantile stock covers at least ~2/3 of weeks by count,
    # so most parts stock at or above their median week
    assert n_above >= 0
