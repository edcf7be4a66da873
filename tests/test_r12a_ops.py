"""Property gates for the round-12a batch: Kuiper replay in pandas and
the Benjamini–Yekutieli step-up replay with the BY ⊆ BH dominance
property."""

from __future__ import annotations

from fractions import Fraction
from math import comb

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r12a import (
    _HARMONIC,
    _SIGN_P_4096,
)

SF = "/root/testdata/sf0.001"


def test_kuiper_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_kuiper_test"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["late"] = (ev["ts"].dt.day >= 16).astype(int)
    for r in rows:
        g = ev[ev["event_type"] == r["event_type"]]
        a = sorted(g[g["late"] == 0]["value_c"])
        b = sorted(g[g["late"] == 1]["value_c"])
        n1, n2 = len(a), len(b)
        assert (r["n1"], r["n2"]) == (n1, n2)
        dplus = dminus = 0
        for v in sorted(set(a) | set(b)):
            f1 = sum(1 for x in a if x <= v)
            f2 = sum(1 for x in b if x <= v)
            dplus = max(dplus, f1 * n2 - f2 * n1)
            dminus = max(dminus, f2 * n1 - f1 * n2)
        assert int(r["dplus_num"]) == dplus
        assert int(r["dminus_num"]) == dminus
        assert int(r["kuiper_num"]) == dplus + dminus
        # Kuiper dominates each one-sided KS supremum by construction
        assert r["kuiper_num"] >= max(dplus, dminus)


def test_sign_p_table_is_exact_binomial():
    for j, p_num in _SIGN_P_4096.items():
        exact = min(4096, 2 * sum(comb(12, i) for i in range(j + 1)))
        assert p_num == exact, (j, p_num, exact)
    for m, (num, den) in _HARMONIC.items():
        assert Fraction(num, den) == sum(
            Fraction(1, i) for i in range(1, m + 1)
        )


def test_by_matches_stepup_replay_and_is_subset_of_bh(spark):
    rows = (
        REGISTRY["evt_benjamini_yekutieli"].spark_fn(spark, SF).toPandas()
        .sort_values("rnk")
        .to_dict("records")
    )
    assert rows
    m = int(rows[0]["m"])
    assert m == len(rows)
    c = Fraction(*_HARMONIC[m])
    alpha = Fraction(1, 4)
    # exact-rational step-up replay
    k_bh = max(
        (
            int(r["rnk"])
            for r in rows
            if Fraction(int(r["p_num"]), 4096)
            <= Fraction(int(r["rnk"])) * alpha / m
        ),
        default=0,
    )
    k_by = max(
        (
            int(r["rnk"])
            for r in rows
            if Fraction(int(r["p_num"]), 4096)
            <= Fraction(int(r["rnk"])) * alpha / (m * c)
        ),
        default=0,
    )
    for r in rows:
        assert int(r["bh_reject"]) == int(int(r["rnk"]) <= k_bh)
        assert int(r["by_reject"]) == int(int(r["rnk"]) <= k_by)
        # the harmonic penalty only ever removes rejections
        assert int(r["by_reject"]) <= int(r["bh_reject"])
    # sign-test p is consistent with its k_up
    for r in rows:
        j = min(int(r["k_up"]), 12 - int(r["k_up"]))
        assert int(r["p_num"]) == _SIGN_P_4096[j]
