"""Property gates for the round-9l stationarity/adstock batch
(plans/queries_r9l.py): brute-force the partial sums and replay the
adstock recursion in Python bigints; assemble the KPSS statistic and
pin the telescoping and pack-safety invariants.
"""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _daily(col):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    if col == "v":
        ev = ev[ev["value"].notna()].copy()
        ev["x"] = (ev["value"].astype(float) * 100).round().astype("int64")
    else:
        ev = ev.copy()
        ev["x"] = 1
    ev["day"] = ev["ts"].dt.date
    out = {}
    for et, g in ev.groupby("event_type"):
        s = g.groupby("day")["x"].sum().sort_index()
        out[et] = [int(v) for v in s]
    return out


def test_kpss_partial_sums_and_statistic(spark):
    df = (
        REGISTRY["evt_kpss_partial_sums"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values(["event_type", "t"])
    )
    series = _daily("v")
    assert set(df["event_type"]) == set(series)
    for et, ys in series.items():
        g = df[df["event_type"] == et]
        n, sy = len(ys), sum(ys)
        assert list(g["t"]) == list(range(1, n + 1))
        assert set(g["n"]) == {n} and set(g["sy"]) == {sy}
        run = 0
        want = []
        for y in ys:
            run += n * y - sy
            want.append(run)
        assert [int(v) for v in g["s_t"]] == want, et
        assert want[-1] == 0  # telescoping: S_n == 0 exactly
        # assemble eta = sum(S_t^2)/n^2 / sum((n*y - sy)^2)/n^2
        num = sum(s * s for s in want)
        den = sum((n * y - sy) ** 2 for y in ys)
        assert den > 0
        eta = num / den / n  # KPSS with lag-0 long-run variance
        assert 0.0 < eta  # positive by construction on non-constant series


def test_adstock_carryover_matches_replay(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_adstock_carryover"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = _daily("c")
    assert set(got) == set(series)
    for et, cs in series.items():
        # pack-safety bound: level < 2^19 requires counts < 2^18 here
        assert max(cs) < 2 ** 18, "pack base too small for this fixture"
        a = cs[0]
        peak, total = a, a
        for c in cs[1:]:
            a = a // 2 + c
            peak = max(peak, a)
            total += a
        row = got[et]
        assert int(row["n_days"]) == len(cs)
        assert int(row["final_adstock"]) == a, et
        assert int(row["peak_adstock"]) == peak, et
        assert int(row["total_exposure"]) == total, et
        # carryover bounds: adstock level is always >= the day's count
        # and total exposure at most doubles the raw count total
        # (geometric sum bound: sum a_t <= 2 * sum c_t)
        assert total >= sum(cs)
        assert total <= 2 * sum(cs)
        assert peak >= max(cs)
