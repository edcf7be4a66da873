"""Property gates for the round-9af ranking/balance batch
(plans/queries_r9af.py): brute-force the win matrix and run the
Bradley-Terry MM fixed point; hashlib-replay shard assignment and pin
hash uniformity.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_NS = 32


def test_pairwise_wins_and_bradley_terry(spark):
    rows = (
        REGISTRY["evt_pairwise_wins_bt"].spark_fn(spark, SF).toPandas()
    )
    got = {
        (r["winner"], r["loser"]): (int(r["wins"]), int(r["n_days"]))
        for r in rows.to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    daily = defaultdict(dict)
    for (et, day), g in ev.groupby(["event_type", "day"]):
        daily[day][et] = int(g["v"].sum())
    types = sorted(ev["event_type"].unique())
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            days = [d for d in daily if a in daily[d] and b in daily[d]]
            wins = sum(1 for d in days if daily[d][a] > daily[d][b])
            want[(a, b)] = (wins, len(days))
    assert got == want
    # Bradley-Terry MM fixed point over the full (two-sided) matrix
    w = defaultdict(float)
    n = defaultdict(float)
    for (a, b), (wins, days) in want.items():
        losses = days - wins - sum(
            1
            for d in daily
            if a in daily[d] and b in daily[d]
            and daily[d][a] == daily[d][b]
        )
        w[a] += wins
        w[b] += losses
        n[(a, b)] = n[(b, a)] = days
    p = {t_: 1.0 for t_ in types}
    for _ in range(200):
        newp = {}
        for t_ in types:
            denom = sum(
                n[(t_, o)] / (p[t_] + p[o])
                for o in types
                if o != t_ and n.get((t_, o))
            )
            newp[t_] = w[t_] / denom if denom else p[t_]
        s = sum(newp.values())
        p = {k: v / s * len(types) for k, v in newp.items()}
    # strengths positive and finite; total wins conserved
    assert all(v > 0 and math.isfinite(v) for v in p.values())
    assert sum(w.values()) <= sum(
        d for _, d in want.values()
    )


def test_shard_token_balance_and_uniformity(spark):
    rows = (
        REGISTRY["doc_shard_token_balance"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["shard"]): r for r in rows}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg = defaultdict(lambda: [0, 0, 0])
    for r in docs.itertuples():
        shard = (
            int(
                hashlib.md5(f"shard:{int(r.doc_id)}".encode()).hexdigest()[
                    :8
                ],
                16,
            )
            % _NS
        )
        toks = [
            w
            for w in re.sub(r"\s+", " ", r.text.lower().strip()).split(" ")
            if w
        ]
        a = agg[shard]
        a[0] += 1
        a[1] += len(toks)
        a[2] = max(a[2], len(toks))
    assert set(got) == set(agg)
    for sh, (nd, nt, mx) in agg.items():
        row = got[sh]
        assert int(row["n_docs"]) == nd
        assert int(row["n_tokens"]) == nt, sh
        assert int(row["max_doc_tokens"]) == mx
    # hash uniformity: per-shard doc counts inside generous binomial
    # bands around n/32
    n = len(docs)
    mean = n / _NS
    sd = math.sqrt(n * (1 / _NS) * (1 - 1 / _NS))
    for sh in range(_NS):
        nd = agg.get(sh, [0, 0, 0])[0]
        assert abs(nd - mean) <= 5 * sd + 1, (sh, nd)
    # imbalance ratio well-formed
    toks = [agg[s][1] for s in agg]
    assert max(toks) >= min(toks) >= 0
