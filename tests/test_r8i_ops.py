"""Property gates for the round-8i operators: pure-Python triplet
classification and MASE from raw rows, plus the partition invariant
hard + semihard + easy == all negatives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
MARGIN = 2_000_000


def test_semihard_triplets_match_pure_python(spark):
    got = (
        REGISTRY["emb_semihard_triplets"]
        .spark_fn(spark, SF)
        .toPandas()
        .set_index("anchor_id")
        .sort_index()
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    q = {
        int(r.vec_id): (
            np.round(np.asarray(r.embedding, dtype=np.float64) * 1000).astype(
                np.int64
            ),
            int(r.label),
        )
        for r in emb.itertuples()
    }
    for aid in sorted(v for v in q if v < 64):
        av, alab = q[aid]
        ds = {
            bid: int(((av - bv) ** 2).sum())
            for bid, (bv, blab) in q.items()
            if bid != aid
        }
        pos = sorted(
            (d, bid) for bid, d in ds.items() if q[bid][1] == alab
        )
        if not pos:
            assert aid not in got.index
            continue
        dp = pos[0][0]
        negs = [d for bid, d in ds.items() if q[bid][1] != alab]
        hard = sum(1 for d in negs if d <= dp)
        semi = sum(1 for d in negs if dp < d <= dp + MARGIN)
        row = got.loc[aid]
        assert int(row["d2_pos"]) == dp
        assert (
            int(row["n_neg"]),
            int(row["n_hard"]),
            int(row["n_semihard"]),
            int(row["n_easy"]),
        ) == (len(negs), hard, semi, len(negs) - hard - semi)
        assert (
            int(row["n_hard"]) + int(row["n_semihard"]) + int(row["n_easy"])
            == int(row["n_neg"])
        )


def test_mase_matches_pure_python(spark):
    got = REGISTRY["evt_mase_backtest"].spark_fn(spark, SF).toPandas()
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
        )
        x = [int(v) for v in g]
        scored = range(7, len(x))
        sae_m = sum(abs(x[i] - x[i - 7]) for i in scored)
        sae_n = sum(abs(x[i] - x[i - 1]) for i in scored)
        assert int(r["n_scored"]) == len(x) - 7
        assert (int(r["sae_model"]), int(r["sae_naive"])) == (sae_m, sae_n)
        assert float(r["mase"]) == round(sae_m / sae_n, 6)
