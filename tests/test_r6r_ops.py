"""Property gate for the Ljung-Box diagnostics operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"


def test_ljung_box_matches_bruteforce(spark):
    df = REGISTRY["evt_ljung_box"].spark_fn(spark, SF).toPandas()
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select(F.to_date("ts").alias("day"), "value_c")
        .toPandas()
    )
    x = (
        rows.groupby("day")["value_c"].sum().sort_index().astype(float)
        .tolist()
    )
    n = len(x)
    mean = sum(x) / n
    den = sum((v - mean) ** 2 for v in x)
    rk = {}
    for k in (1, 2, 3):
        rk[k] = (
            sum((x[t] - mean) * (x[t + k] - mean) for t in range(n - k))
            / den
        )
    assert int(r["n_days"]) == n
    for k in (1, 2, 3):
        assert float(r[f"r{k}"]) == pytest.approx(rk[k], rel=1e-9), k
        assert -1.0 <= float(r[f"r{k}"]) <= 1.0
    pacf2 = (rk[2] - rk[1] ** 2) / (1 - rk[1] ** 2)
    assert float(r["pacf2"]) == pytest.approx(pacf2, rel=1e-9)
    q = n * (n + 2) * sum(rk[k] ** 2 / (n - k) for k in (1, 2, 3))
    assert float(r["q_lb"]) == pytest.approx(q, rel=1e-9)
    assert float(r["q_lb"]) >= 0
