"""Property gates for the round-12g batch: Bowker transition replay
(with the total-transitions identity) and streak replay with the
zero-breaks rule exercised."""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bowker_matches_replay(spark):
    rows = (
        REGISTRY["evt_bowker_symmetry"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans: dict[tuple, int] = {}
    n_trans = 0
    for _, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
            n_trans += 1
    for r in rows:
        i, j = r["type_i"], r["type_j"]
        assert i < j
        assert int(r["n_ij"]) == trans.get((i, j), 0)
        assert int(r["n_ji"]) == trans.get((j, i), 0)
        d = int(r["n_ij"]) - int(r["n_ji"])
        assert int(r["chi_num"]) == d * d
        assert int(r["chi_den"]) == int(r["n_ij"]) + int(r["n_ji"])
    # every off-diagonal transition is accounted for exactly once
    off_diag = sum(n for (a, b), n in trans.items() if a != b)
    assert sum(int(r["n_ij"]) + int(r["n_ji"]) for r in rows) == off_diag


def test_longest_streaks_matches_replay(spark):
    rows = (
        REGISTRY["evt_longest_streaks"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    d = (
        ev.groupby(["event_type", "day"])["value_c"]
        .sum()
        .reset_index(name="x")
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        # first day has no change -> sign 0 (breaks), like the query
        sgns = [0] + [
            1 if b > a else (-1 if b < a else 0) for a, b in zip(xs, xs[1:])
        ]
        runs = {1: [], -1: []}
        cur_sgn, cur_len = 0, 0
        for s in sgns + [0]:  # trailing 0 flushes the last run
            if s == cur_sgn and s != 0:
                cur_len += 1
            else:
                if cur_sgn != 0:
                    runs[cur_sgn].append(cur_len)
                cur_sgn, cur_len = s, 1
        assert int(r["longest_up"]) == max(runs[1], default=0)
        assert int(r["longest_down"]) == max(runs[-1], default=0)
        assert int(r["n_up_runs"]) == len(runs[1])
        assert int(r["n_down_runs"]) == len(runs[-1])
        # identity: run lengths partition the non-zero-change days
        assert sum(runs[1]) + sum(runs[-1]) == sum(
            1 for s in sgns if s != 0
        )
