"""Property gate for the round-9o coreset batch (plans/queries_r9o.py):
an independent Python greedy over raw parquet embeddings must reproduce
the pick sequence exactly; the coverage-radius curve must be monotone
non-increasing (the Gonzalez invariant behind the 2-approximation).
"""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_ANCHORS = 128
_K = 8


def test_kcenter_coreset_matches_bruteforce(spark):
    rows = (
        REGISTRY["emb_kcenter_coreset"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("step")
        .to_dict("records")
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb[emb["vec_id"] < _ANCHORS]
    qv = {
        int(r.vec_id): [int(round(float(x) * 1000.0)) for x in r.embedding]
        for r in emb.itertuples()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(qv[a], qv[b]))

    selected = [0]
    picks = [(0, 0, 0)]
    cands = sorted(qv)
    for s in range(1, _K):
        best = None
        for ia in cands:
            if ia in selected:
                continue
            md = min(d2(ia, ib) for ib in selected)
            if best is None or md > best[1]:
                best = (ia, md)
        picks.append((s, best[0], best[1]))
        selected.append(best[0])
    got = [
        (int(r["step"]), int(r["center_id"]), int(r["sel_d2"]))
        for r in rows
    ]
    assert got == picks
    # Gonzalez invariant: the absorbed radius never increases
    radii = [p[2] for p in picks[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert len(set(p[1] for p in picks)) == _K  # k distinct centers
    # coverage improves: after k picks every candidate is within the
    # LAST absorbed radius of some center (definition of the greedy)
    final_r = radii[-1]
    for ia in cands:
        if ia in selected:
            continue
        assert min(d2(ia, ib) for ib in selected) <= final_r
