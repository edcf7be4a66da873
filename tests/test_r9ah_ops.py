"""Property gate for the round-9ah shift-function batch
(plans/queries_r9ah.py): brute-force both samples' nearest-rank
deciles and pin monotonicity plus the shift identity.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
EPOCH = pd.Timestamp("2024-01-01").date()


def test_decile_shift_function_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_decile_shift_function"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {
        (r["event_type"], int(r["decile"])): (
            int(r["q_weekday"]),
            int(r["q_weekend"]),
            int(r["shift_c"]),
        )
        for r in rows
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    samples = defaultdict(lambda: ([], []))
    for (et, day), g in ev.groupby(["event_type", "day"]):
        if day < EPOCH:
            continue
        we = 1 if (day - EPOCH).days % 7 in (5, 6) else 0
        samples[et][we].append(int(g["v"].sum()))
    want_keys = set()
    for et, (wk, we) in samples.items():
        wk_s, we_s = sorted(wk), sorted(we)
        for i in range(1, 10):
            want_keys.add((et, i))
            qa = next(
                v
                for r, v in enumerate(wk_s, start=1)
                if 10 * r >= i * len(wk_s)
            )
            qb = next(
                v
                for r, v in enumerate(we_s, start=1)
                if 10 * r >= i * len(we_s)
            )
            assert got[(et, i)] == (qa, qb, qb - qa), (et, i)
        # decile curves are monotone within each sample
        qas = [got[(et, i)][0] for i in range(1, 10)]
        qbs = [got[(et, i)][1] for i in range(1, 10)]
        assert qas == sorted(qas) and qbs == sorted(qbs)
        # shift identity holds by construction
        for i in range(1, 10):
            qa, qb, s = got[(et, i)]
            assert s == qb - qa
    assert set(got) == want_keys
