"""Property gate for the Kendall tau-b matrix operator."""

from __future__ import annotations

from itertools import combinations

import math

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"
TYPES = ["click", "error", "purchase", "signup", "view"]


def test_kendall_matches_bruteforce(spark):
    df = (
        REGISTRY["evt_kendall_tau_matrix"].spark_fn(spark, SF).toPandas()
    )
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "value_c")
        .toPandas()
    )
    pivot = rows.pivot_table(
        index="day",
        columns="event_type",
        values="value_c",
        aggfunc="sum",
        fill_value=0,
    ).reindex(columns=TYPES, fill_value=0).sort_index()
    n = len(pivot)
    n_pairs = n * (n - 1) // 2
    series = {et: pivot[et].astype(int).tolist() for et in TYPES}
    ties = {
        et: sum(
            1
            for t in range(n)
            for u in range(t + 1, n)
            if series[et][t] == series[et][u]
        )
        for et in TYPES
    }
    got = {(r["type_a"], r["type_b"]): r for _, r in df.iterrows()}
    assert len(got) == 10
    for a, b in combinations(TYPES, 2):
        s = 0
        for t in range(n):
            for u in range(t + 1, n):
                p = (series[a][t] - series[a][u]) * (
                    series[b][t] - series[b][u]
                )
                s += (p > 0) - (p < 0)
        r = got[(a, b)]
        assert int(r["n_pairs"]) == n_pairs
        assert int(r["s_stat"]) == s, (a, b)
        assert int(r["ties_a"]) == ties[a]
        assert int(r["ties_b"]) == ties[b]
        tau = s / math.sqrt((n_pairs - ties[a]) * (n_pairs - ties[b]))
        assert float(r["tau_b"]) == pytest.approx(tau, rel=1e-12)
        assert -1.0 <= float(r["tau_b"]) <= 1.0
