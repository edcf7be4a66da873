"""Property gates for the round-11k batch: RQA replay in pandas and
the EOQ assembly with its convexity property.
"""

from __future__ import annotations

import math

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r11k import (
    _RQA_EPS,
)

SF = "/root/testdata/sf0.001"


def test_rqa_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_recurrence_quantification"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    d = (
        ev.groupby(["event_type", "day"])["value_c"]
        .sum()
        .reset_index(name="x")
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        xs = list(d[d["event_type"] == r["event_type"]]["x"])
        n = len(xs)
        assert int(r["n"]) == n
        rec = {
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if abs(xs[i] - xs[j]) <= _RQA_EPS
        }
        det = sum(
            1
            for (i, j) in rec
            if (i - 1, j - 1) in rec or (i + 1, j + 1) in rec
        )
        assert int(r["rec_n"]) == len(rec)
        assert int(r["det_n"]) == det
        # RQA laws: 0 <= DET-points <= recurrences <= all pairs
        assert 0 <= det <= len(rec) <= n * (n - 1) // 2
        rr = len(rec) / (n * (n - 1) / 2)
        assert 0 <= rr <= 1


def test_eoq_assembles_and_is_convex(spark):
    rows = (
        REGISTRY["rel_eoq_components"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    order_cost_c = 50_000  # literal S
    holding_rate = 0.2  # h = 20% of avg unit price per year
    for r in rows:
        d_units = int(r["demand_units"])
        avg_price_c = int(r["price_sum_c"]) / int(r["n_lines"])
        h = holding_rate * avg_price_c
        assert d_units > 0 and h > 0
        eoq = math.sqrt(2 * d_units * order_cost_c / h)
        assert eoq > 0

        def total_cost(q: float) -> float:
            return d_units / q * order_cost_c + q / 2 * h

        # convexity at the optimum: cost at EOQ below cost at 0.5x/2x
        assert total_cost(eoq) <= total_cost(eoq / 2) + 1e-9
        assert total_cost(eoq) <= total_cost(eoq * 2) + 1e-9
