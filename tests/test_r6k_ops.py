"""Property gates for the round-6k operators (plans/queries_r6k.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


def test_odds_ratio_mh_matches_bruteforce(spark):
    df = _run(spark, "evt_odds_ratio_mh")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .select(
            F.expr("CAST(hour(ts) AS INT) DIV 6").alias("band"),
            F.dayofweek("ts").isin(1, 7).alias("exposed"),
            (F.col("event_type") == "purchase").alias("hit"),
        )
        .toPandas()
    )
    num = den = 0.0
    tot = [0, 0, 0, 0]
    for b in range(4):
        g = rows[rows["band"] == b]
        n = len(g)
        a = int((g["exposed"] & g["hit"]).sum())
        bb = int((g["exposed"] & ~g["hit"]).sum())
        cc = int((~g["exposed"] & g["hit"]).sum())
        d = n - a - bb - cc
        tot[0] += a
        tot[1] += bb
        tot[2] += cc
        tot[3] += d
        num += a * d / n
        den += bb * cc / n
    assert [
        int(r["a_total"]), int(r["b_total"]),
        int(r["c_total"]), int(r["d_total"]),
    ] == tot
    assert float(r["mh_num"]) == pytest.approx(num, rel=1e-9)
    assert float(r["mh_den"]) == pytest.approx(den, rel=1e-9)
    assert float(r["or_mh"]) == pytest.approx(num / den, rel=1e-9)
    assert float(r["or_mh"]) > 0


def test_gumbel_matches_bruteforce(spark):
    df = _run(spark, "evt_extreme_value_gumbel")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select(F.to_date("ts").alias("day"), "value_c")
        .toPandas()
    )
    maxima = rows.groupby("day")["value_c"].max().astype(float)
    n = len(maxima)
    mean = maxima.mean()
    sd = maxima.std(ddof=1)
    beta = sd * math.sqrt(6) / math.pi
    gamma = 0.5772156649015329
    mu = mean - gamma * beta
    rl = mu - beta * math.log(-math.log(0.99))
    assert int(r["n_blocks"]) == n
    assert int(r["observed_max"]) == int(maxima.max())
    assert float(r["mean_max"]) == pytest.approx(mean, rel=1e-12)
    assert float(r["sd_max"]) == pytest.approx(sd, rel=1e-9)
    assert float(r["beta"]) == pytest.approx(beta, rel=1e-9)
    assert float(r["mu"]) == pytest.approx(mu, rel=1e-9)
    assert float(r["return_level_100"]) == pytest.approx(rl, rel=1e-9)
    # the 100-block return level exceeds the mean block max, and the
    # Gumbel median (mu - beta*ln(ln 2)) sits below the mean
    assert rl > mean
    assert mu < mean
