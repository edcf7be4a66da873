"""Property gate for the price-index operator."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import t

SF = "/root/testdata/sf0.001"


def test_price_index_matches_bruteforce(spark):
    df = REGISTRY["rel_price_index"].spark_fn(spark, SF).toPandas()
    r = df.iloc[0]
    li = t(spark, SF, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    ).toPandas()
    li["yr"] = li["l_shipdate"].dt.year
    li = li[li["yr"].isin([1995, 1996])]
    li["q"] = li["l_quantity"].round().astype(int)
    li["rc"] = (li["l_extendedprice"] * 100).round().astype(int)
    per = li.groupby(["l_partkey", "yr"])[["q", "rc"]].sum().unstack(
        fill_value=0
    )
    both = per[(per[("q", 1995)] > 0) & (per[("q", 1996)] > 0)]
    n = len(both)
    v00 = int(both[("rc", 1995)].sum())
    v11 = int(both[("rc", 1996)].sum())
    p1q0 = sum(
        row[("rc", 1996)] / row[("q", 1996)] * row[("q", 1995)]
        for _, row in both.iterrows()
    )
    p0q1 = sum(
        row[("rc", 1995)] / row[("q", 1995)] * row[("q", 1996)]
        for _, row in both.iterrows()
    )
    las = p1q0 / v00
    paa = v11 / p0q1
    assert int(r["n_parts"]) == n
    assert int(r["base_value_c"]) == v00
    assert int(r["curr_value_c"]) == v11
    assert float(r["laspeyres"]) == pytest.approx(las, rel=1e-9)
    assert float(r["paasche"]) == pytest.approx(paa, rel=1e-9)
    assert float(r["fisher"]) == pytest.approx(
        math.sqrt(las * paa), rel=1e-9
    )
    # Fisher sits between (or equals) Laspeyres and Paasche
    lo, hi = sorted([las, paa])
    assert lo - 1e-12 <= float(r["fisher"]) <= hi + 1e-12
