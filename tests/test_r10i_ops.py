"""Property gates for the round-10i batch (plans/queries_r10i.py):
replay NDCG from first principles (float log2 discounts vs the
micro-unit lattice) and the Hoover identity.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r10i import (
    _DISC,
    _K,
    _QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_ndcg_matches_replay_and_assembles(spark):
    rows = (
        REGISTRY["doc_ndcg_at_k"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["qname"]: r for r in rows}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {
        int(r["doc_id"]): [
            w
            for w in re.split(r"\s+", r["text"].strip().lower())
            if w
        ]
        for _, r in docs.iterrows()
    }
    for qname, terms in _QUERIES:
        scored = []
        for did, ws in toks.items():
            score = sum(1 for w in ws if w in terms)
            rel = sum(1 for t in terms if t in ws)
            if score > 0 or rel > 0:
                scored.append((did, score, rel))
        ranked = sorted(scored, key=lambda s: (-s[1], s[0]))
        ideal = sorted(scored, key=lambda s: (-s[2], s[0]))
        dcg_u = sum(
            ((1 << rel) - 1) * _DISC[i + 1]
            for i, (_, _, rel) in enumerate(ranked[:_K])
        )
        idcg_u = sum(
            ((1 << rel) - 1) * _DISC[i + 1]
            for i, (_, _, rel) in enumerate(ideal[:_K])
        )
        n_rel = sum(1 for _, _, rel in scored if rel > 0)
        r = got[qname]
        assert int(r["dcg_u"]) == dcg_u
        assert int(r["idcg_u"]) == idcg_u
        assert int(r["n_rel"]) == n_rel
        # assemble: micro-lattice NDCG tracks the float computation
        ndcg = dcg_u / idcg_u
        assert 0 < ndcg <= 1
        assert idcg_u >= dcg_u  # ideal ranking dominates
        f_dcg = sum(
            ((1 << rel) - 1) / math.log2(i + 2)
            for i, (_, _, rel) in enumerate(ranked[:_K])
        )
        f_idcg = sum(
            ((1 << rel) - 1) / math.log2(i + 2)
            for i, (_, _, rel) in enumerate(ideal[:_K])
        )
        assert math.isclose(ndcg, f_dcg / f_idcg, rel_tol=1e-5)


def test_hoover_matches_replay(spark):
    rows = (
        REGISTRY["evt_hoover_index"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["event_type"]: r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["c"] = (ev["value"].astype(float) * 100).round().astype("int64")
    u = ev.groupby(["event_type", "user_id"])["c"].sum()
    for et in u.index.get_level_values(0).unique():
        xs = [int(v) for v in u[et]]
        n, tot = len(xs), sum(xs)
        num = sum(abs(n * x - tot) for x in xs)
        r = got[et]
        assert int(r["n_users"]) == n
        assert int(r["total_c"]) == tot
        assert int(r["hoover_num"]) == num
        # assemble H and pin range + the mean-absolute-deviation twin
        h = num / (2 * n * tot)
        assert 0 <= h < 1
        mean = tot / n
        mad_based = sum(abs(x - mean) for x in xs) / (2 * tot)
        assert math.isclose(h, mad_based, rel_tol=1e-12)
