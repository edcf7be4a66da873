"""Property gates for the round-10m batch (plans/queries_r10m.py):
brute-force the panel k-NN digraph (reciprocity) and the two nearest
neighbors (Lowe margin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_P, _K = 64, 5


def _vecs(limit=None):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    out = {}
    for _, r in emb.iterrows():
        vid = int(r["vec_id"])
        if limit is not None and vid >= limit:
            continue
        out[vid] = np.round(
            np.asarray(r["embedding"], dtype=float) * 1000
        ).astype("int64")
    return out


def test_reciprocity_matches_bruteforce(spark):
    rows = (
        REGISTRY["emb_reciprocal_nn"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["src"]): r for r in rows}
    vecs = _vecs(limit=_P)
    edges = set()
    for s, v in vecs.items():
        d2 = sorted(
            (int(((w - v) ** 2).sum()), c)
            for c, w in vecs.items()
            if c != s
        )
        for _, c in d2[:_K]:
            edges.add((s, c))
    total_recip = 0
    for s in vecs:
        out = [(a, b) for a, b in edges if a == s]
        rec = sum(1 for a, b in out if (b, a) in edges)
        r = got[s]
        assert int(r["k_out"]) == len(out) == _K
        assert int(r["n_reciprocal"]) == rec
        total_recip += rec
    # reciprocal edges come in symmetric pairs -> even total
    assert total_recip % 2 == 0
    # edge-retention rate of the mutual-kNN graph is a valid fraction
    assert 0 <= total_recip / (len(vecs) * _K) <= 1


def test_knn_margin_matches_bruteforce(spark):
    rows = (
        REGISTRY["emb_knn_margin"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["qid"]): r for r in rows}
    vecs = _vecs()
    for qid in range(_P):
        d2 = sorted(
            (int(((w - vecs[qid]) ** 2).sum()), c)
            for c, w in vecs.items()
            if c != qid
        )
        (d1, c1), (dd2, c2) = d2[0], d2[1]
        r = got[qid]
        assert int(r["nn1"]) == c1 and int(r["d1_sq"]) == d1
        assert int(r["nn2"]) == c2 and int(r["d2_sq"]) == dd2
        assert d1 <= dd2
        if dd2 > 0:
            ratio = (d1 / dd2) ** 0.5  # Lowe ratio on L2 (not squared)
            assert 0 <= ratio <= 1
