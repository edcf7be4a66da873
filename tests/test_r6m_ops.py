"""Property gates for the round-6m operators (plans/queries_r6m.py)."""

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


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


def test_pot_gpd_matches_bruteforce(spark):
    df = _run(spark, "evt_pot_gpd_tail")
    r = df.iloc[0]
    vals = sorted(
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("value_c")
        .toPandas()["value_c"]
        .tolist()
    )
    n = len(vals)
    # nearest-rank P90: smallest v with 10*cum >= 9*n
    cnt = Counter(vals)
    cum, u = 0, None
    for v in sorted(cnt):
        cum += cnt[v]
        if 10 * cum >= 9 * n:
            u = v
            break
    assert int(r["threshold_c"]) == u
    exc = [v - u for v in vals if v > u]
    ne = len(exc)
    m = sum(exc) / ne
    s2 = (ne * sum(y * y for y in exc) - sum(exc) ** 2) / (ne * (ne - 1))
    assert int(r["n_exceed"]) == ne
    # ~10% of mass sits above the nearest-rank P90
    assert ne <= n // 10 + max(cnt.values())
    assert float(r["mean_excess"]) == pytest.approx(m, rel=1e-12)
    assert float(r["var_excess"]) == pytest.approx(s2, rel=1e-9)
    xi = 0.5 * (1 - m * m / s2)
    sigma = 0.5 * m * (m * m / s2 + 1)
    assert float(r["xi"]) == pytest.approx(xi, rel=1e-9)
    assert float(r["sigma"]) == pytest.approx(sigma, rel=1e-9)
    assert float(r["sigma"]) > 0
    assert float(r["xi"]) < 0.5  # MOM identity: xi = (1 - m^2/s^2)/2 < 1/2


def test_sax_words_match_bruteforce(spark):
    df = _run(spark, "evt_sax_words").set_index("event_type")
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "value_c")
        .toPandas()
    )
    daily = (
        rows.groupby(["event_type", "day"])["value_c"].sum().reset_index()
    )
    breaks = (-0.6744897501960817, 0.0, 0.6744897501960817)
    for et, g in daily.groupby("event_type"):
        s = g.sort_values("day")["value_c"].astype(int).tolist()
        n = len(s)
        mu = sum(s) / n
        sd = math.sqrt(
            (n * sum(x * x for x in s) - sum(s) ** 2) / (n * (n - 1))
        )
        word = ""
        for seg in range((n + 4) // 5):
            chunk = s[5 * seg: 5 * seg + 5]
            z = (sum(chunk) / 5.0 - mu) / sd
            word += (
                "a" if z < breaks[0]
                else "b" if z < breaks[1]
                else "c" if z < breaks[2]
                else "d"
            )
        assert df.loc[et, "sax_word"] == word, et
        assert int(df.loc[et, "n_segments"]) == len(word)
    # words use only the 4-letter alphabet
    assert all(set(w) <= set("abcd") for w in df["sax_word"])
