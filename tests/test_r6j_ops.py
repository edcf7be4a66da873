"""Property gates for the round-6j operators (plans/queries_r6j.py)."""

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


def test_capture_recapture_matches_bruteforce(spark):
    df = _run(spark, "evt_capture_recapture")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .select("user_id", F.dayofmonth("ts").alias("dom"))
        .toPandas()
    )
    w1 = set(rows.loc[rows["dom"] <= 7, "user_id"])
    w2 = set(rows.loc[(rows["dom"] >= 8) & (rows["dom"] <= 14), "user_id"])
    n1, n2, m = len(w1), len(w2), len(w1 & w2)
    n_seen = rows["user_id"].nunique()
    assert (int(r["n1"]), int(r["n2"]), int(r["m"])) == (n1, n2, m)
    assert int(r["n_seen"]) == n_seen
    assert int(r["lincoln_petersen"]) == n1 * n2 // m
    chapman = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    assert int(r["chapman"]) == chapman
    assert int(r["est_unseen"]) == chapman - n_seen
    # estimators at least cover the union of the two samples
    assert int(r["lincoln_petersen"]) >= len(w1 | w2)
    # on this synthetic data every user is active every week, so the
    # estimate should be close to the seen population
    assert chapman <= 2 * n_seen


def test_jackknife_matches_bruteforce(spark):
    df = _run(spark, "evt_jackknife_ratio")
    r = df.iloc[0]
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select(F.to_date("ts").alias("day"), "value_c")
        .toPandas()
    )
    per = rows.groupby("day")["value_c"].agg(["sum", "size"])
    sy, sx, n = int(per["sum"].sum()), int(per["size"].sum()), len(per)
    r_full = sy / sx
    loo = [
        (sy - int(row["sum"])) / (sx - int(row["size"]))
        for _, row in per.iterrows()
    ]
    mean_loo = sum(loo) / n
    var = (n - 1) / n * sum((v - mean_loo) ** 2 for v in loo)
    assert int(r["n_days"]) == n
    assert float(r["r_full"]) == pytest.approx(r_full, rel=1e-12)
    assert float(r["mean_loo"]) == pytest.approx(mean_loo, rel=1e-12)
    assert float(r["jack_var"]) == pytest.approx(var, rel=1e-9)
    assert float(r["jack_se"]) == pytest.approx(math.sqrt(var), rel=1e-9)
    # pseudo-value mean should hug the full-sample ratio
    assert abs(mean_loo - r_full) < 10 * math.sqrt(var) + 1e-9
