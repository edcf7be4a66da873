"""Property gates for the round-9z run-rules/ordered-trend batch
(plans/queries_r9z.py): replay the Nelson run rules sequentially in
Python, brute-force the JT pair counts, assemble the tie-corrected z.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
EPOCH = pd.Timestamp("2024-01-01").date()


def _daily():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    out = {}
    for et, g in ev.groupby("event_type"):
        s = g.groupby("day")["v"].sum().sort_index()
        out[et] = (list(s.index), [int(x) for x in s])
    return out


def test_nelson_rules_match_sequential_replay(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_nelson_rules"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    daily = _daily()
    assert set(got) == set(daily)
    for et, (days, xs) in daily.items():
        n = len(xs)
        # nearest-rank lower median: smallest x with 2*rank >= n
        srt = sorted(xs)
        med = next(v for r, v in enumerate(srt, start=1) if 2 * r >= n)
        side = [1 if x > med else (-1 if x < med else 0) for x in xs]
        dirs = [0] + [
            1 if b > a else (-1 if b < a else 0)
            for a, b in zip(xs, xs[1:])
        ]
        n_side = sum(
            1
            for i in range(8, n)
            if len(set(side[i - 8 : i + 1])) == 1 and side[i] != 0
        )
        n_trend = sum(
            1
            for i in range(5, n)
            if len(set(dirs[i - 5 : i + 1])) == 1 and dirs[i] != 0
        )
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["med"]) == med, et
        assert int(row["n_rule_side"]) == n_side, et
        assert int(row["n_rule_trend"]) == n_trend, et


def test_jonckheere_terpstra_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_jonckheere_terpstra"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    daily = _daily()
    assert set(got) == set(daily)
    for et, (days, xs) in daily.items():
        groups = defaultdict(list)
        for day, x in zip(days, xs):
            if day >= EPOCH:
                groups[(day - EPOCH).days % 7].append(x)
        wds = sorted(groups)
        lt = ties = 0
        for i, wa in enumerate(wds):
            for wb in wds[i + 1 :]:
                for xa in groups[wa]:
                    for xb in groups[wb]:
                        lt += xa < xb
                        ties += xa == xb
        n = sum(len(v) for v in groups.values())
        sum_ng2 = sum(len(v) ** 2 for v in groups.values())
        mu4 = n * n - sum_ng2
        var72 = n * n * (2 * n + 3) - sum(
            len(v) ** 2 * (2 * len(v) + 3) for v in groups.values()
        )
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["jt_lt"]) == lt, et
        assert int(row["jt_ties"]) == ties, et
        assert int(row["mu_num4"]) == mu4
        assert int(row["var_num72"]) == var72
        # assemble the (midrank-tie) z and pin finiteness + JT range
        jt = lt + ties / 2.0
        mu = mu4 / 4.0
        sd = math.sqrt(var72 / 72.0)
        z = (jt - mu) / sd
        assert math.isfinite(z)
        max_pairs = (n * n - sum_ng2) // 2
        assert 0 <= lt + ties <= max_pairs
