"""Property gate for the round-9aj price-dispersion batch
(plans/queries_r9aj.py): brute-force per-part unit-price order
statistics and pin the dispersion identities.
"""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_MIN = 3


def test_price_dispersion_matches_bruteforce(spark):
    got = {
        int(r["l_partkey"]): r
        for r in REGISTRY["rel_price_dispersion"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet").copy()
    li["u"] = (
        (li["l_extendedprice"] * 100).round().astype("int64")
        // li["l_quantity"].round().astype("int64")
    )
    want_keys = set()
    for pk, g in li.groupby("l_partkey"):
        us = sorted(int(u) for u in g["u"])
        n = len(us)
        if n < _MIN:
            continue
        want_keys.add(int(pk))
        med = us[(n + 1) // 2 - 1]  # lower median, 1-based (n+1)//2
        row = got[int(pk)]
        assert int(row["n_lines"]) == n
        assert int(row["p_min"]) == us[0]
        assert int(row["p_med"]) == med, pk
        assert int(row["p_max"]) == us[-1]
        assert int(row["spread_c"]) == us[-1] - us[0]
        assert int(row["spread_bp_of_med"]) == (
            (us[-1] - us[0]) * 10000
        ) // med
        # order-statistic sanity
        assert us[0] <= med <= us[-1]
    assert set(got) == want_keys
