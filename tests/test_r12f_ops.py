"""Property gates for the round-12f batch: Christoffersen transition
replay (with the Kupiec cross-check identity) and first-passage replay
with censoring accounting."""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r12f import (
    _FP_THRESHOLD_C,
)

SF = "/root/testdata/sf0.001"


def _daily(col):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["value_c"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.date
    return (
        ev.groupby([col, "day"])["value_c"]
        .sum()
        .reset_index(name="x")
        .sort_values([col, "day"])
    )


def test_christoffersen_matches_replay_and_kupiec(spark):
    rows = (
        REGISTRY["evt_christoffersen_test"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    kup = {
        r["event_type"]: r
        for r in REGISTRY["evt_kupiec_var_backtest"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    d = _daily("event_type")
    for r in rows:
        xs = [int(x) for x in d[d["event_type"] == r["event_type"]]["x"]]
        drs = [b - a for a, b in zip(xs, xs[1:])]
        n = len(drs)
        half = [t for t in range(1, n + 1) if 2 * t <= n]
        train = sorted(
            (drs[t - 1], t) for t in half
        )  # (value, chrono tie-break)
        m = len(train)
        var_c = next(v for i, (v, _) in enumerate(train) if 10 * (i + 1) >= m)
        assert int(r["var_c"]) == var_c
        test_seq = [1 if drs[t - 1] < var_c else 0
                    for t in range(1, n + 1) if 2 * t > n]
        n00 = n01 = n10 = n11 = 0
        for a, b in zip(test_seq, test_seq[1:]):
            if a == 0 and b == 0:
                n00 += 1
            elif a == 0 and b == 1:
                n01 += 1
            elif a == 1 and b == 0:
                n10 += 1
            else:
                n11 += 1
        assert (int(r["n00"]), int(r["n01"]), int(r["n10"]), int(r["n11"])) \
            == (n00, n01, n10, n11)
        # consistency with Kupiec over the same construction: the
        # transition matrix row sums recover the violation count up to
        # the first test observation
        k = kup[r["event_type"]]
        x_viol = int(k["x_viol"])
        assert n01 + n11 in (x_viol, x_viol - 1)
        assert int(k["var_c"]) == var_c


def test_first_passage_matches_replay(spark):
    rows = (
        REGISTRY["evt_first_passage_time"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    d = _daily("user_id")
    hist: dict[int, int] = {}
    n_users = 0
    for uid, g in d.groupby("user_id"):
        n_users += 1
        cum = 0
        passage = -1
        for di, x in enumerate(g["x"], start=1):
            cum += int(x)
            if cum >= _FP_THRESHOLD_C:
                passage = di
                break
        hist[passage] = hist.get(passage, 0) + 1
    got = {int(r["passage_days"]): int(r["n_users"]) for r in rows}
    assert got == hist
    # histogram partitions the users exactly
    assert sum(got.values()) == n_users
    # censoring is exercised at this SF (threshold chosen for it) OR
    # everyone crosses — either way the -1 bucket count matches
    assert got.get(-1, 0) == hist.get(-1, 0)
