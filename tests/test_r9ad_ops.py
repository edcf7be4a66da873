"""Property gates for the round-9ad change-point/partial-correlation
batch (plans/queries_r9ad.py): brute-force the Pettitt double sum and
the moment matrix; assemble the approximate p-value and the partial r.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_S20 = 1048576


def _daily_by_type():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    return ev


def test_pettitt_matches_double_sum(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_pettitt_test"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = _daily_by_type()
    for et, g in ev.groupby("event_type"):
        xs = [int(x) for x in g.groupby("day")["v"].sum().sort_index()]
        n = len(xs)

        def sign(v):
            return (v > 0) - (v < 0)

        us = []
        for t in range(1, n):  # boundaries 1..n-1 (1-based)
            u = sum(
                sign(xs[j] - xs[i])
                for i in range(t)
                for j in range(t, n)
            )
            us.append((t, u))
        k = max(abs(u) for _, u in us)
        t_star = min(t for t, u in us if abs(u) == k)
        u_star = min(u for t, u in us if abs(u) == k)
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["k_stat"]) == k, et
        assert int(row["t_star"]) == t_star, et
        assert int(row["u_at_star"]) == u_star, et
        # approximate significance is well-formed
        p = 2.0 * math.exp(-6.0 * k * k / (n ** 3 + n ** 2))
        assert 0.0 <= p <= 2.0
        assert k <= n * n  # |U| bounded by pair count
    assert set(got) == set(ev["event_type"].unique())


def test_partial_correlation_moments_and_range(spark):
    row = (
        REGISTRY["evt_partial_correlation"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")[0]
    )
    ev = _daily_by_type()
    days = sorted(ev["day"].unique())
    series = {c: [] for c in ("a", "b", "c")}
    for day in days:
        g = ev[ev["day"] == day]
        for tname, c in zip(("purchase", "view", "click"), "abc"):
            series[c].append(
                int(g.loc[g["event_type"] == tname, "v"].sum())
            )
    n = len(days)
    assert int(row["n"]) == n
    sums = {c: sum(series[c]) for c in "abc"}
    assert (int(row["sa"]), int(row["sb"]), int(row["sc"])) == (
        sums["a"],
        sums["b"],
        sums["c"],
    )
    moms = {}
    for (u, v), name in (
        (("a", "a"), "saa"),
        (("b", "b"), "sbb"),
        (("c", "c"), "scc"),
        (("a", "b"), "sab"),
        (("a", "c"), "sac"),
        (("b", "c"), "sbc"),
    ):
        want = sum(x * y for x, y in zip(series[u], series[v]))
        got = int(row[f"{name}_h"]) * _S20 + int(row[f"{name}_l"])
        assert got == want, name
        moms[name] = want

    def r(pq, pp, qq, sp, sq):
        cov = n * moms[pq] - sp * sq
        vp = n * moms[pp] - sp * sp
        vq = n * moms[qq] - sq * sq
        return cov / math.sqrt(vp * vq)

    r_ab = r("sab", "saa", "sbb", sums["a"], sums["b"])
    r_ac = r("sac", "saa", "scc", sums["a"], sums["c"])
    r_bc = r("sbc", "sbb", "scc", sums["b"], sums["c"])
    for v in (r_ab, r_ac, r_bc):
        assert -1.0 - 1e-12 <= v <= 1.0 + 1e-12
    den = math.sqrt((1 - r_ac ** 2) * (1 - r_bc ** 2))
    assert den > 0
    r_ab_c = (r_ab - r_ac * r_bc) / den
    assert -1.0 - 1e-9 <= r_ab_c <= 1.0 + 1e-9
