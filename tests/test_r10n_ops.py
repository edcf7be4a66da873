"""Property gates for the round-10n batch (plans/queries_r10n.py):
replay TV drift on the week grid and the duplicate-cluster histogram.
"""

from __future__ import annotations

import datetime
import hashlib
import re
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_tv_drift_matches_replay_and_bounds(spark):
    rows = (
        REGISTRY["evt_tv_drift"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["week_key"]): r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = datetime.date(1970, 1, 1)
    wk = ev["ts"].dt.date.map(lambda d: (d - epoch).days // 7)
    mix: dict[int, Counter] = {}
    for w, et in zip(wk, ev["event_type"]):
        mix.setdefault(int(w), Counter())[et] += 1
    weeks = sorted(mix)
    types = sorted({t for c in mix.values() for t in c})
    expected = 0
    for w in weeks:
        if w - 1 not in mix:
            continue
        expected += 1
        c1, c2 = mix[w], mix[w - 1]
        n1, n2 = sum(c1.values()), sum(c2.values())
        num = sum(
            abs(c1.get(t, 0) * n2 - c2.get(t, 0) * n1) for t in types
        )
        r = got[w]
        assert int(r["n_cur"]) == n1
        assert int(r["n_prev"]) == n2
        assert int(r["tv_num"]) == num
        tv = num / (2 * n1 * n2)
        assert 0 <= tv <= 1
    assert len(got) == expected and expected >= 2  # weeks exist to pair


def test_dup_cluster_sources_matches_replay(spark):
    rows = (
        REGISTRY["doc_dup_cluster_sources"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(int(r["sz"]), int(r["n_sources"])): r for r in rows}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    clusters: dict[str, list[str]] = {}
    for _, r in docs.iterrows():
        norm = re.sub(r"\s+", " ", r["text"].strip().lower())
        fp = hashlib.md5(norm.encode()).hexdigest()
        clusters.setdefault(fp, []).append(r["source"])
    want: dict[tuple[int, int], list[int]] = {}
    for srcs in clusters.values():
        key = (len(srcs), len(set(srcs)))
        acc = want.setdefault(key, [0, 0])
        acc[0] += 1
        acc[1] += len(srcs)
        assert key[1] <= key[0]  # n_sources <= cluster size
    assert set(got) == set(want)
    for key, (ncl, ndocs) in want.items():
        r = got[key]
        assert int(r["n_clusters"]) == ncl
        assert int(r["n_docs"]) == ndocs
    # doc-mass identity: cells partition the corpus
    assert sum(int(r["n_docs"]) for r in rows) == len(docs)
