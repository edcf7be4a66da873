"""Property gates for the round-9d reliability/embedding-health batch
(plans/queries_r9d.py): replay the Weibull rank regression, the
per-dimension moments, and the nearest-centroid purity from raw parquet
rows in pure Python; assemble shape/scale and anisotropy against
numpy references.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_LN_U = 1000000
_HALF = 1048576
_SHIFT = 32.0


def test_weibull_plot_fit_stats_and_shape(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_weibull_plot_fit"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    last = {}
    gaps = defaultdict(list)  # type -> [(gap, user_id, event_id)]
    for r in ev.itertuples():
        us = int(pd.Timestamp(r.ts).value // 1000)
        key = (int(r.user_id), r.event_type)
        if key in last:
            gap = us - last[key]
            if gap >= 1:
                gaps[r.event_type].append(
                    (gap, int(r.user_id), int(r.event_id))
                )
        last[key] = us
    assert set(got) == set(gaps)
    for et, rows in gaps.items():
        rows.sort()
        n = len(rows)
        xs, ys = [], []
        for i, (gap, _, _) in enumerate(rows, start=1):
            xs.append(round(math.log(gap) * _LN_U))
            p = (i - 0.3) / (n + 0.4)
            ys.append(round((_SHIFT + math.log(-math.log(1.0 - p))) * _LN_U))
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["sx"]) == sum(xs)
        assert int(row["sys"]) == sum(ys)
        sxx = int(row["sxx_hi"]) * _HALF + int(row["sxx_lo"])
        sxys = int(row["sxys_hi"]) * _HALF + int(row["sxys_lo"])
        assert sxx == sum(x * x for x in xs)
        assert sxys == sum(x * y for x, y in zip(xs, ys))
        # assemble shape/scale: the +32 shift cancels in the covariance
        sx, sy = sum(xs), sum(ys)
        slope = (n * sxys - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy / n - _SHIFT * _LN_U) / _LN_U - slope * (
            sx / n / _LN_U
        )
        xf = [x / _LN_U for x in xs]
        yf = [y / _LN_U - _SHIFT for y in ys]
        k_np, b_np = np.polyfit(xf, yf, 1)
        assert abs(slope - k_np) < 1e-6 * max(1.0, abs(k_np))
        assert abs(intercept - b_np) < 1e-6 * max(1.0, abs(b_np))
        # inter-arrivals of a thinned point process: shape near/below 1
        assert 0.0 < slope < 3.0
        scale_us = math.exp(-intercept / slope)
        assert scale_us > 0


def test_anisotropy_spectrum_stats(spark):
    got = (
        REGISTRY["emb_anisotropy_spectrum"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("d")
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    q = np.round(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1000.0
    ).astype("int64")
    n, dim = q.shape
    assert list(got["d"]) == list(range(1, dim + 1))
    assert (got["n"] == n).all()
    assert list(got["sd"]) == [int(v) for v in q.sum(axis=0)]
    assert list(got["qd"]) == [int(v) for v in (q * q).sum(axis=0)]
    # assembled anisotropy: ||mu||^2 / E||x||^2 — small for a healthy
    # centered space (and exactly reproducible from the emitted ints)
    sd = q.sum(axis=0).astype(object)
    mu2 = sum(int(v) ** 2 for v in sd) / (n * n)
    ex2 = int((q * q).sum()) / n
    aniso = mu2 / ex2
    assert 0.0 <= aniso < 0.5
    # variance spectrum: no dead dimension in the synthetic corpus
    var = [(int(qd) / n) - (int(s) / n) ** 2 for qd, s in zip(got["qd"], got["sd"])]
    assert min(var) > 0


def test_cluster_label_purity_matches_bruteforce(spark):
    got = {
        int(r["cluster_id"]): r
        for r in REGISTRY["emb_cluster_label_purity"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    q = np.round(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1000.0
    ).astype("int64")
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    cents = {int(i): q[k] for k, i in enumerate(ids) if i < 8}
    clusters = defaultdict(Counter)
    for k, i in enumerate(ids):
        if i < 8:
            continue
        best = min(
            (int(((q[k] - cv) ** 2).sum()), cid) for cid, cv in cents.items()
        )
        clusters[best[1]][int(labels[k])] += 1
    assert set(got) == set(clusters)
    for cid, hist in clusters.items():
        row = got[cid]
        n = sum(hist.values())
        top_label = min(hist, key=lambda l: (-hist[l], l))
        assert int(row["n"]) == n
        assert int(row["n_labels"]) == len(hist)
        assert int(row["top_label"]) == top_label
        assert int(row["top_count"]) == hist[top_label]
        assert int(row["purity_bp"]) == hist[top_label] * 10000 // n
        assert 0 < int(row["purity_bp"]) <= 10000
