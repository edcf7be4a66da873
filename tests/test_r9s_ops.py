"""Property gates for the round-9s streaming-quantile/contrastive batch
(plans/queries_r9s.py): brute-force bucket quantiles from raw parquet,
replay the pair table with Python ints, assemble alignment/uniformity
and pin the Jensen bound.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_HB, _CAP = 10000, 600
_AU = 64


def test_stream_histogram_quantiles_match_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["stream_histogram_quantiles"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["b"] = (
        ((ev["value"].astype(float) * 100).round().astype("int64") // _HB)
        .clip(upper=_CAP)
    )
    assert set(got) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        buckets = sorted(g["b"])
        n = len(buckets)
        row = got[et]
        assert int(row["n"]) == n
        for p in (50, 90, 99):
            # nearest-rank over buckets: smallest bucket with
            # 100*cum >= p*n
            cum = 0
            want = None
            for b, c in sorted(Counter(buckets).items()):
                cum += c
                if 100 * cum >= p * n:
                    want = b
                    break
            assert int(row[f"q{p}_b"]) == want, (et, p)
        # quantile monotonicity
        assert (
            int(row["q50_b"]) <= int(row["q90_b"]) <= int(row["q99_b"])
        )


def test_alignment_uniformity_pairs_and_metrics(spark):
    df = (
        REGISTRY["emb_alignment_uniformity"].spark_fn(spark, SF).toPandas()
    )
    got = {
        (int(r["ia"]), int(r["ib"])): (int(r["same"]), int(r["d2"]))
        for r in df.to_dict("records")
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb[emb["vec_id"] < _AU]
    qv, lab = {}, {}
    for r in emb.itertuples():
        qv[int(r.vec_id)] = [
            int(round(float(x) * 1000.0)) for x in r.embedding
        ]
        lab[int(r.vec_id)] = int(r.label)
    ids = sorted(qv)
    want = {}
    for i, ia in enumerate(ids):
        for ib in ids[i + 1 :]:
            d2 = sum(
                (x - y) * (x - y) for x, y in zip(qv[ia], qv[ib])
            )
            want[(ia, ib)] = (1 if lab[ia] == lab[ib] else 0, d2)
    assert got == want
    n_pairs = len(ids) * (len(ids) - 1) // 2
    assert len(got) == n_pairs
    # assemble the two metrics (raw-vector variant; d2 in milli² units)
    pos = [d2 for s, d2 in got.values() if s == 1]
    assert pos, "fixtures must produce some same-label anchor pairs"
    align = sum(pos) / len(pos) / 1e6
    unif = math.log(
        sum(math.exp(-2.0 * d2 / 1e6) for _, d2 in got.values())
        / n_pairs
    )
    assert align >= 0.0
    assert unif <= 0.0 + 1e-12  # Jensen: log mean exp(-x) <= 0 for x>=0
    assert math.isfinite(unif)
