"""Property gates for the exact Shapley attribution operator."""

from __future__ import annotations

from itertools import permutations

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"
CH = ["click", "view", "signup", "error"]


def _run(spark, name, sf=SF):
    return REGISTRY[name].spark_fn(spark, sf).toPandas()


def _journeys(spark):
    rows = (
        keyed_events(spark, SF)
        .select("user_id", "event_type")
        .toPandas()
    )
    out = []
    for uid, g in rows.groupby("user_id"):
        types = set(g["event_type"])
        mask = sum(1 << i for i, c in enumerate(CH) if c in types)
        out.append((mask, int("purchase" in types)))
    return out


def _v(journeys, coalition_mask):
    return sum(
        conv for mask, conv in journeys if mask & coalition_mask == mask
    )


def test_shapley_matches_permutation_definition(spark):
    """phi_i == the average over all 4! channel orderings of i's
    marginal contribution — the DEFINITION of the Shapley value."""
    df = _run(spark, "evt_shapley_attribution").set_index("channel")
    journeys = _journeys(spark)
    for i, c in enumerate(CH):
        total = 0
        for perm in permutations(range(4)):
            before = 0
            for j in perm:
                if j == i:
                    break
                before |= 1 << j
            total += _v(journeys, before | (1 << i)) - _v(journeys, before)
        # total is phi_i * 24 exactly
        assert int(df.loc[c, "shapley_24"]) == total, c
        assert float(df.loc[c, "shapley"]) == pytest.approx(
            total / 24, rel=1e-12
        )


def test_shapley_efficiency_axiom_exact(spark):
    df = _run(spark, "evt_shapley_attribution")
    journeys = _journeys(spark)
    v_full = _v(journeys, 0b1111)
    v_empty = _v(journeys, 0)
    assert int(df["shapley_24"].sum()) == 24 * (v_full - v_empty)
    assert len(df) == 4
