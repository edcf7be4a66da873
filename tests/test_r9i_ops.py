"""Property gates for the round-9i shape/tail batch
(plans/queries_r9i.py): brute-force the raw moments and the top-k Hill
sum from raw parquet rows with Python bigints; assemble skewness,
kurtosis, Jarque-Bera, and the tail index against float references.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_LN_U = 1000000
_HALF = 1048576
_S17 = 131072
_K = 100


def _cents_by_type():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    out = defaultdict(list)
    for r in ev.itertuples():
        out[r.event_type].append(int(round(float(r.value) * 100)))
    return out


def test_moments_skew_kurtosis_and_jb(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_moment_skew_kurtosis"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    groups = _cents_by_type()
    assert set(got) == set(groups)
    for et, vals in groups.items():
        n = len(vals)
        s1 = sum(vals)
        s2 = sum(v * v for v in vals)
        s3 = sum(v ** 3 for v in vals)
        q4 = sum(v ** 4 for v in vals)
        row = got[et]
        assert (int(row["n"]), int(row["s1"]), int(row["s2"])) == (n, s1, s2)
        assert int(row["s3_hi"]) * _HALF + int(row["s3_lo"]) == s3
        got_q4 = (
            int(row["q40"]) * _S17 * _S17
            + int(row["q21"]) * _S17
            + int(row["q00"])
        )
        assert got_q4 == q4
        # central moments from raw (python bigints -> float at the end)
        m2 = (s2 - s1 * s1 / n) / n
        m3 = (s3 - 3 * s1 * s2 / n + 2 * s1 ** 3 / n / n) / n
        m4 = (
            q4 - 4 * s1 * s3 / n + 6 * s1 * s1 * s2 / n / n
            - 3 * s1 ** 4 / n ** 3
        ) / n
        g1 = m3 / m2 ** 1.5
        g2 = m4 / (m2 * m2) - 3.0
        mu = s1 / n
        m2d = sum((v - mu) ** 2 for v in vals) / n
        m3d = sum((v - mu) ** 3 for v in vals) / n
        m4d = sum((v - mu) ** 4 for v in vals) / n
        assert abs(g1 - m3d / m2d ** 1.5) < 1e-9 * max(1.0, abs(g1))
        assert abs(g2 - (m4d / m2d ** 2 - 3.0)) < 1e-9 * max(1.0, abs(g2))
        jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
        assert jb >= 0.0
        assert m4 / (m2 * m2) >= 1.0  # kurtosis lower bound (Pearson)


def test_hill_tail_index_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_hill_tail_index"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    groups = _cents_by_type()
    assert set(got) == set(groups)
    for et, vals in groups.items():
        top = sorted(vals, reverse=True)
        xk1 = top[_K]  # (k+1)-th order statistic from the top
        lnx = round(math.log(xk1) * _LN_U)
        num = sum(
            round(math.log(v) * _LN_U) - lnx for v in top[:_K]
        )
        row = got[et]
        assert int(row["n"]) == len(vals)
        assert int(row["k"]) == _K
        assert int(row["x_k1"]) == xk1
        assert int(row["hill_num_u"]) == num, et
        # assembled index vs float reference; Pareto-consistent alpha
        h = num / (_K * _LN_U)
        h_direct = sum(math.log(v / xk1) for v in top[:_K]) / _K
        assert abs(h - h_direct) < 1e-4
        assert h > 0
        alpha = 1.0 / h
        assert alpha > 0
