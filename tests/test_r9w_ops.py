"""Property gates for the round-9w density/dimension batch
(plans/queries_r9w.py): brute-force k-NN, reachability, and TwoNN
pairs from raw parquet; assemble LOF and the intrinsic dimension.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_K = 5
_AN = 128


def _day_points():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    pts = {}
    for day in sorted(ev["day"].unique()):
        g = ev[ev["day"] == day]
        pts[day] = (
            int(g.loc[g["event_type"] == "purchase", "v"].sum()),
            int(g.loc[g["event_type"] == "view", "v"].sum()),
        )
    return pts


def test_lof_reachability_matches_bruteforce(spark):
    rows = (
        REGISTRY["evt_lof_reachability"].spark_fn(spark, SF).toPandas()
    )
    got = {
        (r["day"], r["neighbor"]): (
            int(r["d2"]),
            int(r["reach2"]),
            int(r["kdist2_self"]),
        )
        for r in rows.to_dict("records")
    }
    pts = _day_points()
    days = sorted(pts)

    def d2(a, b):
        (xa, ya), (xb, yb) = pts[a], pts[b]
        return (xa - xb) ** 2 + (ya - yb) ** 2

    knn, kdist = {}, {}
    for a in days:
        nn = sorted(((d2(a, b), b) for b in days if b != a))[:_K]
        knn[a] = nn
        kdist[a] = nn[-1][0]
    want = {}
    for a in days:
        for dd, b in knn[a]:
            want[(a, b)] = (dd, max(dd, kdist[b]), kdist[a])
    assert got == want
    # assemble LOF and pin invariants
    lrd = {
        a: _K / (sum(max(dd, kdist[b]) for dd, b in knn[a]) or 1)
        for a in days
    }
    for a in days:
        lof = sum(lrd[b] for _, b in knn[a]) / _K / lrd[a]
        assert lof > 0 and math.isfinite(lof)
    for (a, b), (dd, reach, kself) in got.items():
        assert reach >= dd and reach >= kdist[b] and kself == kdist[a]


def test_twonn_intrinsic_dim(spark):
    got = {
        int(r["vec_id"]): r
        for r in REGISTRY["emb_twonn_intrinsic_dim"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb[emb["vec_id"] < _AN]
    qv = {
        int(r.vec_id): [int(round(float(x) * 1000.0)) for x in r.embedding]
        for r in emb.itertuples()
    }
    ids = sorted(qv)
    ratios = []
    for ia in ids:
        nn = sorted(
            (
                sum((x - y) * (x - y) for x, y in zip(qv[ia], qv[ib])),
                ib,
            )
            for ib in ids
            if ib != ia
        )[:2]
        row = got[ia]
        assert (int(row["d1_2"]), int(row["nn1"])) == nn[0], ia
        assert (int(row["d2_2"]), int(row["nn2"])) == nn[1], ia
        assert nn[1][0] >= nn[0][0] >= 0
        if nn[0][0] > 0 and nn[1][0] > nn[0][0]:
            ratios.append(0.5 * math.log(nn[1][0] / nn[0][0]))
    assert set(got) == set(ids)
    # Facco estimator on the usable ratios: positive, finite, and in a
    # plausible band for a synthetic embedding table
    d_hat = len(ratios) / sum(ratios)
    assert 0 < d_hat < 200, d_hat
