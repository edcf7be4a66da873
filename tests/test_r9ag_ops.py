"""Property gates for the round-9ag coverage/periodicity batch
(plans/queries_r9ag.py): replay the greedy set cover in Python sets
and the floor-mean autocovariances in bigints; pin the greedy and
Cauchy-Schwarz invariants.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_ROUNDS = 4
_MAX_LAG = 14


def test_greedy_vocab_cover_matches_replay(spark):
    rows = (
        REGISTRY["doc_greedy_vocab_cover"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("round")
        .to_dict("records")
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vocab = defaultdict(set)
    for r in docs.itertuples():
        for w in re.sub(r"\s+", " ", r.text.lower().strip()).split(" "):
            if w:
                vocab[r.source].add(w)
    covered = set()
    picked = set()
    want = []
    for rnd in range(1, _ROUNDS + 1):
        best = None
        for src in sorted(vocab):
            if src in picked:
                continue
            gain = len(vocab[src] - covered)
            if best is None or gain > best[1]:
                best = (src, gain)
        covered |= vocab[best[0]]
        picked.add(best[0])
        want.append((rnd, best[0], best[1], len(covered)))
    got = [
        (int(r["round"]), r["source"], int(r["gain"]), int(r["covered"]))
        for r in rows
    ]
    assert got == want
    # greedy invariants: gains are non-increasing; coverage monotone
    gains = [g for _, _, g, _ in got]
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    covs = [c for _, _, _, c in got]
    assert all(a <= b for a, b in zip(covs, covs[1:]))
    assert covs[-1] <= len(set().union(*vocab.values()))


def test_dominant_period_autocovariances(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_dominant_period"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    assert set(got) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        ys = [int(x) for x in g.groupby("day")["v"].sum().sort_index()]
        n = len(ys)
        mu = sum(ys) // n  # floor mean (documented variant)
        e = [y - mu for y in ys]
        row = got[et]
        assert int(row["n"]) == n
        acov = {0: sum(x * x for x in e)}
        assert int(row["acov0"]) == acov[0]
        for L in range(1, _MAX_LAG + 1):
            acov[L] = sum(e[i] * e[i - L] for i in range(L, n))
            assert int(row[f"acov{L}"]) == acov[L], (et, L)
        # rho bounded (Cauchy-Schwarz with edge slack)
        assert acov[0] > 0
        for L in range(1, _MAX_LAG + 1):
            rho = acov[L] / acov[0]
            assert -1.05 <= rho <= 1.05, (et, L, rho)
        # the argmax lag is well-defined
        best = max(range(1, _MAX_LAG + 1), key=lambda L: acov[L])
        assert 1 <= best <= _MAX_LAG
