"""Property gates for the round-6i operators (plans/queries_r6i.py)."""

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


def test_cmh_matches_bruteforce(spark):
    df = _run(spark, "evt_cmh_test")
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
    a_tot, e_tot, v_tot, n_tot = 0, 0.0, 0.0, 0
    for b in range(4):
        g = rows[rows["band"] == b]
        n = len(g)
        r1 = int(g["exposed"].sum())
        c1 = int(g["hit"].sum())
        a = int((g["exposed"] & g["hit"]).sum())
        a_tot += a
        n_tot += n
        e_tot += r1 * c1 / n
        v_tot += r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1))
    assert int(r["n"]) == n_tot
    assert int(r["a_total"]) == a_tot
    assert float(r["e_total"]) == pytest.approx(e_tot, rel=1e-9)
    assert float(r["v_total"]) == pytest.approx(v_tot, rel=1e-9)
    chi2 = (abs(a_tot - e_tot) - 0.5) ** 2 / v_tot
    assert float(r["cmh_chi2"]) == pytest.approx(chi2, rel=1e-9)


def test_p_chart_matches_bruteforce(spark):
    df = _run(spark, "evt_p_chart").set_index("day")
    rows = (
        keyed_events(spark, SF)
        .select(
            F.to_date("ts").alias("day"),
            (F.col("event_type") == "error").alias("err"),
        )
        .toPandas()
    )
    per = rows.groupby("day").agg(n=("err", "size"), d=("err", "sum"))
    pbar = per["d"].sum() / per["n"].sum()
    assert len(df) == len(per)
    n_ooc = 0
    for day, row in per.iterrows():
        got = df.loc[day]
        assert int(got["n"]) == row["n"]
        assert int(got["defects"]) == row["d"]
        sig = math.sqrt(pbar * (1 - pbar) / row["n"])
        assert float(got["pbar"]) == pytest.approx(pbar, rel=1e-12)
        assert float(got["ucl"]) == pytest.approx(pbar + 3 * sig, rel=1e-12)
        assert float(got["lcl"]) == pytest.approx(
            max(pbar - 3 * sig, 0.0), rel=1e-12
        )
        p = row["d"] / row["n"]
        ooc = p > pbar + 3 * sig or p < max(pbar - 3 * sig, 0.0)
        assert bool(got["out_of_control"]) == ooc
        n_ooc += ooc
    # a stable synthetic process: the chart should not scream everywhere
    assert n_ooc <= len(per) // 2
