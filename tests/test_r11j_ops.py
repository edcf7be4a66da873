"""Property gates for the round-11j batch: Viterbi DP laws — the
forward-max table dominates any fixed path's score, and the implied
argmax path is consistent with the table.
"""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r11j import (
    _E0_DOWN,
    _E0_UP,
    _E1_DOWN,
    _E1_UP,
    _STAY,
    _SWITCH,
)

SF = "/root/testdata/sf0.001"


def _obs(SF):
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
    seqs: dict[str, list[int]] = {}
    for ty, g in d.groupby("event_type"):
        xs = list(g["x"])
        seqs[ty] = [1 if xs[i] > xs[i - 1] else 0 for i in range(1, len(xs))]
    return seqs


def test_viterbi_table_matches_bruteforce_over_paths(spark):
    rows = (
        REGISTRY["evt_hmm_viterbi_check"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    table = {(r["event_type"], int(r["t"])): (int(r["s0"]), int(r["s1"])) for r in rows}
    seqs = _obs(SF)
    for ty, ups in seqs.items():
        if not ups:
            continue
        # brute force over all 2^L paths for a short prefix
        L = min(len(ups), 10)
        best_end = {0: None, 1: None}
        for mask in range(2 ** L):
            path = [(mask >> i) & 1 for i in range(L)]
            score = 0
            for i, (s, up) in enumerate(zip(path, ups[:L])):
                if s == 0:
                    score += _E0_UP if up else _E0_DOWN
                else:
                    score += _E1_UP if up else _E1_DOWN
                if i:
                    score += _STAY if path[i - 1] == s else _SWITCH
            e = path[-1]
            if best_end[e] is None or score > best_end[e]:
                best_end[e] = score
        got = table[(ty, L + 1)]  # t is 2-based over days
        assert got == (best_end[0], best_end[1]), ty


def test_viterbi_scores_monotone_in_t(spark):
    df = (
        REGISTRY["evt_hmm_viterbi_check"].spark_fn(spark, SF).toPandas()
    )
    # every step adds at least the minimum emission (+1) — scores
    # strictly increase along t within a type
    for _, g in df.groupby("event_type"):
        g = g.sort_values("t")
        assert (g["s0"].diff().dropna() >= 1).all()
        assert (g["s1"].diff().dropna() >= 1).all()
