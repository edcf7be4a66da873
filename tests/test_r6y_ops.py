"""Property gate for the Knox space-time interaction test."""

from __future__ import annotations

import hashlib
from collections import Counter
from datetime import date

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"


def test_knox_matches_bruteforce(spark):
    df = REGISTRY["evt_knox_test"].spark_fn(spark, SF).toPandas()
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .select("event_id", "user_id", F.to_date("ts").alias("day"))
        .toPandas()
    )
    pts = []
    epoch = date(2024, 1, 1)
    for eid, uid, day in rows.itertuples(index=False):
        h = hashlib.md5(str(int(uid)).encode()).hexdigest()
        lat = int(h[:8], 16) % 180000000 - 90000000
        lon = int(h[8:16], 16) % 360000000 - 180000000
        pts.append(
            (
                int(eid),
                lat // 10000000,
                lon // 10000000,
                (day - epoch).days,
            )
        )
    n = len(pts)
    # margins from histograms
    cell_hist = Counter((la, lo) for _, la, lo, _ in pts)
    s_pairs = sum(c * (c - 1) // 2 for c in cell_hist.values())
    day_hist = Counter(d for *_, d in pts)
    t_pairs = sum(c * (c - 1) // 2 for c in day_hist.values()) + sum(
        day_hist[d] * day_hist.get(d + 1, 0) for d in day_hist
    )
    all_pairs = n * (n - 1) // 2
    # close pairs via cell buckets (same method, independent code path
    # for the time predicate)
    by_cell = {}
    for eid, la, lo, d in pts:
        by_cell.setdefault((la, lo), []).append((eid, d))
    x_st = 0
    for members in by_cell.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if abs(members[i][1] - members[j][1]) <= 1:
                    x_st += 1
    assert int(r["x_st"]) == x_st
    assert int(r["s_pairs"]) == s_pairs
    assert int(r["t_pairs"]) == t_pairs
    assert int(r["all_pairs"]) == all_pairs
    expected = s_pairs * t_pairs / all_pairs
    assert float(r["expected"]) == pytest.approx(expected, rel=1e-12)
    assert float(r["excess_ratio"]) == pytest.approx(
        x_st / expected, rel=1e-12
    )
    # same-user events share a cell, so some space-time excess is
    # expected on this data; the ratio must at least be positive/finite
    assert float(r["excess_ratio"]) > 0
