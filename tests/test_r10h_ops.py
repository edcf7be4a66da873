"""Property gates for the round-10h batch (plans/queries_r10h.py):
assemble the L-moment system from the emitted numerators against a
direct order-statistic computation, and brute-force the
trustworthiness rankings.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_Q, _K, _PFX = 32, 5, 16


def test_l_moments_match_replay_and_assemble(spark):
    rows = (
        REGISTRY["evt_l_moments"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["event_type"]: r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["c"] = (ev["value"].astype(float) * 100).round().astype("int64")
    d = ev.groupby(["event_type", "day"])["c"].sum().reset_index()
    for et, g in d.groupby("event_type"):
        xs = sorted(int(v) for v in g["c"])
        n = len(xs)
        b0 = sum(xs)
        b1 = sum(x * i for i, x in enumerate(xs))
        b2 = sum(x * i * (i - 1) for i, x in enumerate(xs))
        b3 = sum(x * i * (i - 1) * (i - 2) for i, x in enumerate(xs))
        r = got[et]
        assert int(r["n"]) == n
        assert int(r["b0_num"]) == b0
        assert int(r["b1_num"]) == b1
        assert int(r["b2_num"]) == b2
        assert int(r["b3_num"]) == b3
        # assemble the PWMs and the L-moment system
        bb0 = b0 / n
        bb1 = b1 / (n * (n - 1))
        bb2 = b2 / (n * (n - 1) * (n - 2))
        bb3 = b3 / (n * (n - 1) * (n - 2) * (n - 3))
        l1 = bb0
        l2 = 2 * bb1 - bb0
        l3 = 6 * bb2 - 6 * bb1 + bb0
        l4 = 20 * bb3 - 30 * bb2 + 12 * bb1 - bb0
        assert l2 > 0  # non-degenerate series
        t3, t4 = l3 / l2, l4 / l2
        # Hosking bounds: |t3| < 1 and (5t3^2 - 1)/4 <= t4 < 1
        assert abs(t3) < 1
        assert (5 * t3 * t3 - 1) / 4 - 1e-12 <= t4 < 1
        # cross-check l1/l2 against direct order-statistic formulas
        l1_direct = float(np.mean(xs))
        l2_direct = sum(
            x * (2 * (i + 1) - n - 1) for i, x in enumerate(xs)
        ) / (n * (n - 1))
        assert math.isclose(l1, l1_direct, rel_tol=1e-12)
        assert math.isclose(l2, l2_direct, rel_tol=1e-9)


def test_trustworthiness_matches_bruteforce(spark):
    rows = (
        REGISTRY["emb_trustworthiness"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["qid"]): r for r in rows}
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): np.round(
            np.asarray(r["embedding"], dtype=float) * 1000
        ).astype("int64")
        for _, r in emb.iterrows()
    }
    n_corpus = len(vecs) - 1  # candidates per query
    total_pen = 0
    for qid in range(_Q):
        full = sorted(
            (int(((v - vecs[qid]) ** 2).sum()), cid)
            for cid, v in vecs.items()
            if cid != qid
        )
        red = sorted(
            (
                int(((v[:_PFX] - vecs[qid][:_PFX]) ** 2).sum()),
                cid,
            )
            for cid, v in vecs.items()
            if cid != qid
        )
        full_rank = {cid: i + 1 for i, (_, cid) in enumerate(full)}
        top_full = {cid for _, cid in full[:_K]}
        intruders = [
            cid for _, cid in red[:_K] if cid not in top_full
        ]
        pen = sum(full_rank[c] - _K for c in intruders)
        r = got[qid]
        assert int(r["n_intruders"]) == len(intruders)
        assert int(r["penalty"]) == pen
        total_pen += pen
    # assemble T(k) over the panel (Venna–Kaski normalization)
    norm = _Q * _K * (2 * n_corpus - 3 * _K - 1) / 2
    t_k = 1 - total_pen / norm
    assert 0 <= t_k <= 1
