"""Property gates for the round-8d operators (plans/queries_r8d.py):
a pure-Python/numpy brute force of W1's transport identity, the
BQ+rescore pipeline, and the Yule-Walker ratios.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF).toPandas()


def test_wasserstein_matches_sorted_sample_form(spark):
    """Σ|F_A−F_B|·gap over the support equals the classic sorted-sample
    W1 (checked via scipy-free numpy: mean absolute difference of the
    inverse-CDFs on a common grid = integral of |F_A−F_B|)."""
    got = _run(spark, "evt_wasserstein_1d")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.value.notna()].copy()
    ev["v"] = np.round(ev.value.to_numpy(dtype=np.float64) * 100).astype(np.int64)
    ev["wk"] = (ev.ts.dt.dayofweek >= 5).astype(int)
    for _, r in got.iterrows():
        g = ev[ev.event_type == r["event_type"]]
        a = np.sort(g[g.wk == 1].v.to_numpy())
        b = np.sort(g[g.wk == 0].v.to_numpy())
        na, nb = len(a), len(b)
        assert (int(r["n_weekend"]), int(r["n_weekday"])) == (na, nb)
        # integral of |F_A - F_B| dv via the pooled support
        support = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, support, side="right") / na
        fb = np.searchsorted(b, support, side="right") / nb
        w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(support)))
        assert abs(int(r["w1_num"]) / (na * nb) - w1) < 1e-9
        assert float(r["w1"]) == round(w1 / 100.0, 6)


def test_binary_quantization_matches_numpy(spark):
    got = _run(spark, "emb_binary_quantization_topk").sort_values("rank")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    q = {
        int(r.vec_id): np.round(
            np.asarray(r.embedding, dtype=np.float64) * 1000
        ).astype(np.int64)
        for r in emb.itertuples()
    }
    sig = {
        vid: sum(1 << d for d in range(64) if v[d] > 0) for vid, v in q.items()
    }
    qs = sig[4]
    cands = sorted(
        (bin(sig[v] ^ qs).count("1"), v) for v in q if v >= 8
    )[:50]
    rer = sorted(
        (int(((q[v] - q[4]) ** 2).sum()), v, h) for h, v in cands
    )[:10]
    assert [
        (int(r["neighbor_id"]), int(r["d2"]), int(r["hamming"]))
        for _, r in got.iterrows()
    ] == [(v, d2, h) for d2, v, h in rer]


def test_pacf_yw_matches_numpy(spark):
    got = _run(spark, "evt_pacf_yw")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.value.notna()].copy()
    ev["vc"] = np.round(ev.value.to_numpy(dtype=np.float64) * 100).astype(np.int64)
    ev["day"] = ev.ts.dt.normalize()
    for _, r in got.iterrows():
        g = (
            ev[ev.event_type == r["event_type"]]
            .groupby("day")
            .vc.sum()
            .sort_index()
            .to_numpy(dtype=object)  # exact python ints
        )
        n = len(g)
        sx = int(sum(g))
        sxx = int(sum(v * v for v in g))
        sxy1 = int(sum(g[i] * g[i - 1] for i in range(1, n)))
        sxy2 = int(sum(g[i] * g[i - 2] for i in range(2, n)))
        c0 = float(n * sxx - sx * sx)
        c1 = float(n * sxy1 - sx * sx)
        c2 = float(n * sxy2 - sx * sx)
        assert int(r["n_days"]) == n
        assert float(r["phi11"]) == round(c1 / c0, 6)
        assert float(r["phi22"]) == round(
            (c0 * c2 - c1 * c1) / (c0 * c0 - c1 * c1), 6
        )
