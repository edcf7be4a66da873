"""Property gates for the round-9y robust-repair/audit batch
(plans/queries_r9y.py): brute-force 7-day window medians/MADs in
Python, and pin the duplicate-payment detector's PERFECT
precision/recall against the deterministic injection rule.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_NUM, _DEN = 44478, 10000


def test_hampel_filter_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_hampel_filter"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        s = g.groupby("day")["v"].sum().sort_index()
        days = list(s.index)
        xs = [int(x) for x in s]
        n_windows = flagged = 0
        max_dev = None
        first_day = None
        for i in range(len(xs)):
            if i < 3 or i >= len(xs) - 3:
                continue  # partial windows excluded
            win = xs[i - 3 : i + 4]
            med = sorted(win)[3]
            mad = sorted(abs(v - med) for v in win)[3]
            n_windows += 1
            dev = abs(xs[i] - med)
            if _DEN * dev > _NUM * mad:
                flagged += 1
                max_dev = dev if max_dev is None else max(max_dev, dev)
                if first_day is None:
                    first_day = days[i]
        row = got[et]
        assert int(row["n_windows"]) == n_windows
        assert int(row["n_flagged"]) == flagged, et
        if flagged:
            assert int(row["max_flagged_dev"]) == max_dev
            assert str(row["first_flagged_day"]) == str(first_day)
        else:
            assert pd.isna(row["max_flagged_dev"])
    assert set(got) == set(ev["event_type"].unique())


def test_duplicate_payments_perfect_pr_vs_injection(spark):
    rows = (
        REGISTRY["rel_duplicate_payments"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(int(r["ok_a"]), int(r["ok_b"])) for r in rows}
    o = pd.read_parquet(f"{SF}/orders.parquet")
    # re-submissions carry the negated key -k-1 (strictly negative,
    # disjoint at any SF), so ok_a < ok_b pairs them as (-k-1, k)
    injected = {
        (-int(k) - 1, int(k))
        for k in o["o_orderkey"]
        if int(k) % 17 == 0
    }
    # perfect recall: every injected re-submission detected
    assert injected <= got
    # perfect precision: fixture amounts have no organic collisions,
    # so NOTHING beyond the injections may appear
    assert got == injected
    for r in rows:
        assert int(r["gap_days"]) == 3
        assert int(r["ok_b"]) == -int(r["ok_a"]) - 1
