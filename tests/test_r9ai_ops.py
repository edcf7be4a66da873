"""Property gates for the round-9ai milestone/predictability batch
(plans/queries_r9ai.py): replay the cumulative crossing per user and
the bigram entropy sums; assemble H(w2|w1) and pin its bounds.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_TH = 50000
_BK = 7
_LN_U = 1000000


def test_time_to_threshold_matches_replay(spark):
    got = {
        int(r["bucket"]): int(r["n_users"])
        for r in REGISTRY["evt_time_to_threshold"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet").copy()
    ev["v"] = (
        (ev["value"].fillna(0.0).astype(float) * 100).round().astype("int64")
    )
    want = Counter()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        first = g["ts"].iloc[0].date()
        cum = 0
        hit = None
        for r in g.itertuples():
            cum += int(r.v)
            if cum >= _TH:
                hit = r.ts.date()
                break
        if hit is None:
            want[-1] += 1
        else:
            want[(hit - first).days // _BK] += 1
    assert got == dict(want)
    assert sum(got.values()) == ev["user_id"].nunique()


def test_word_bigram_entropy_sums_and_bounds(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_word_bigram_entropy"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cb = defaultdict(Counter)
    for r in docs.itertuples():
        ws = [
            w
            for w in re.sub(r"\s+", " ", r.text.lower().strip()).split(" ")
        ]
        for a, b in zip(ws, ws[1:]):
            if a and b:
                cb[r.source][(a, b)] += 1
    assert set(got) == set(cb)
    for src, cnt in cb.items():
        n = sum(cnt.values())
        s_bi = sum(
            c * round(math.log(c) * _LN_U) for c in cnt.values()
        )
        cu = Counter()
        for (a, _), c in cnt.items():
            cu[a] += c
        s_uni = sum(
            c * round(math.log(c) * _LN_U) for c in cu.values()
        )
        row = got[src]
        assert int(row["n_bigrams"]) == n
        assert int(row["n_distinct_bigrams"]) == len(cnt)
        assert int(row["s_bi_u"]) == s_bi, src
        assert int(row["s_uni_u"]) == s_uni, src
        # assemble H(w2|w1) = (s_uni - s_bi) / N, in nats
        h = (s_uni - s_bi) / n / _LN_U
        assert -1e-9 <= h  # conditional entropy is non-negative
        # ceiling: H(w2|w1) <= ln(#distinct successors) upper bound
        assert h <= math.log(max(2, len(set(b for _, b in cnt)))) + 1e-6
