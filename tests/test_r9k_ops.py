"""Property gates for the round-9k burst/structural-break batch
(plans/queries_r9k.py): replay the hysteresis state machine and the
two-segment OLS from raw parquet rows in Python, then assemble the
Chow F-statistic against a float reference.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_S20 = 1048576


def _daily(with_nulls):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    if not with_nulls:
        ev = ev[ev["value"].notna()].copy()
    ev = ev.copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (
        (ev["value"].fillna(0.0).astype(float) * 100).round().astype("int64")
    )
    out = {}
    for et, g in ev.groupby("event_type"):
        s = g.groupby("day").agg(c=("v", "size"), v=("v", "sum"))
        s = s.sort_index()
        out[et] = list(
            zip([int(x) for x in s["c"]], [int(x) for x in s["v"]])
        )
    return out


def test_burst_hysteresis_matches_replay(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_burst_hysteresis"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = _daily(with_nulls=True)
    assert set(got) == set(series)
    for et, days in series.items():
        total = sum(c for c, _ in days)
        n = len(days)
        state = 0
        burst_days = bursts = longest = cur = burst_value = 0
        for c, v in days:
            if 2 * c * n >= 3 * total:
                sig = 1
            elif c * n <= total:
                sig = 0
            else:
                sig = state  # hysteresis: carry
            if sig == 1 and state == 0:
                bursts += 1
            if sig == 1:
                burst_days += 1
                burst_value += v
                cur += 1
                longest = max(longest, cur)
            else:
                cur = 0
            state = sig
        row = got[et]
        assert int(row["n_days"]) == n
        assert int(row["burst_days"]) == burst_days, et
        assert int(row["n_bursts"]) == bursts, et
        assert int(row["longest_burst"]) == longest, et
        assert int(row["burst_value"]) == burst_value, et
        # structural sanity: episodes can't exceed days in burst
        assert bursts <= burst_days or burst_days == 0


def test_chow_test_stats_and_f(spark):
    rows = (
        REGISTRY["evt_chow_test"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = defaultdict(dict)
    for r in rows:
        got[r["event_type"]][int(r["seg"])] = r
    series = _daily(with_nulls=False)
    assert set(got) == set(series)

    def sse(stats):
        n, st, stt, sy, sty, syy = stats
        # OLS residual SSE via normal equations (exact ints -> float)
        den = n * stt - st * st
        if den == 0:
            return 0.0
        b_num = n * sty - st * sy
        # SSE = Syy_c - b * Sty_c with centered moments
        syy_c = syy - sy * sy / n
        sty_c = sty - st * sy / n
        return syy_c - (b_num / den) * sty_c

    for et, days in series.items():
        ys = [v for _, v in days]
        n = len(ys)
        half = {1: [], 2: []}
        for t, y in enumerate(ys, start=1):
            half[1 if 2 * t <= n else 2].append((t, y))
        agg = {}
        for s, pts in half.items():
            stats = (
                len(pts),
                sum(t for t, _ in pts),
                sum(t * t for t, _ in pts),
                sum(y for _, y in pts),
                sum(t * y for t, y in pts),
                sum(y * y for _, y in pts),
            )
            agg[s] = stats
            row = got[et][s]
            assert int(row["n"]) == stats[0]
            assert int(row["st"]) == stats[1]
            assert int(row["stt"]) == stats[2]
            assert int(row["sy"]) == stats[3]
            assert int(row["sty"]) == stats[4]
            syy = (
                int(row["syy2"]) * _S20 * _S20
                + int(row["syy1"]) * _S20
                + int(row["syy0"])
            )
            assert syy == stats[5], (et, s)
        pooled = tuple(
            a + b for a, b in zip(agg[1], agg[2])
        )
        sse1, sse2, ssep = sse(agg[1]), sse(agg[2]), sse(pooled)
        # decomposition invariant: pooled SSE >= split SSEs (fit can
        # only improve with more parameters), up to float slack
        assert ssep >= sse1 + sse2 - 1e-6 * max(1.0, ssep)
        k, dof = 2, pooled[0] - 4
        if dof > 0 and (sse1 + sse2) > 0:
            f = ((ssep - sse1 - sse2) / k) / ((sse1 + sse2) / dof)
            assert f >= -1e-9
