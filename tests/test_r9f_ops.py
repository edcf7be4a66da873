"""Property gates for the round-9f privacy/tuning batch
(plans/queries_r9f.py): replay the randomized-response mechanism, the
gap-sweep session counts, and the pairwise distance histogram from raw
parquet rows; pin the LDP estimator's exact self-normalization and its
statistical recovery.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_TYPES = ("click", "error", "purchase", "signup", "view")
_GAPS_S = (1800, 3600, 7200)


def test_ldp_frequency_mechanism_and_unbiasedness(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_ldp_frequency"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    reported = Counter()
    true = Counter()
    for r in ev.itertuples():
        h = hashlib.md5(f"{int(r.event_id)}:ldp".encode()).hexdigest()
        keep = int(h[:4], 16) % 4
        ridx = int(h[4:8], 16) % 5
        true[r.event_type] += 1
        reported[r.event_type if keep != 0 else _TYPES[ridx]] += 1
    n = len(ev)
    assert set(got) == set(_TYPES)
    for v in _TYPES:
        row = got[v]
        assert int(row["reported_c"]) == reported[v]
        assert int(row["true_c"]) == true[v]
        assert int(row["n"]) == n
        assert int(row["est_num"]) == 20 * reported[v] - n
    # the estimator self-normalizes EXACTLY: sum of estimates == n
    assert sum(int(r["est_num"]) for r in got.values()) == 15 * n
    # statistical recovery: each estimate within 5 sigma of the truth
    # (sigma^2 <= n * p(1-p)-ish; use the generous binomial bound)
    sigma = (n * 0.25) ** 0.5 * (20 / 15)
    for v in _TYPES:
        est = int(got[v]["est_num"]) / 15
        assert abs(est - true[v]) < 5 * sigma + 1


def test_session_gap_sweep_matches_bruteforce(spark):
    got = {
        int(r["gap_s"]): r
        for r in REGISTRY["evt_session_gap_sweep"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    last = {}
    gaps = []
    users = set()
    for r in ev.itertuples():
        us = int(pd.Timestamp(r.ts).value // 1000)
        uid = int(r.user_id)
        users.add(uid)
        if uid in last:
            gaps.append(us - last[uid])
        last[uid] = us
    n_rows = len(ev)
    assert set(got) == set(_GAPS_S)
    prev_sessions = None
    for gs in _GAPS_S:
        breaks = sum(1 for g in gaps if g > gs * 1000000)
        sessions = breaks + len(users)
        row = got[gs]
        assert int(row["n_sessions"]) == sessions
        assert int(row["events_per_session_milli"]) == (
            n_rows * 1000 // sessions
        )
        # monotone: a larger gap can only merge sessions
        if prev_sessions is not None:
            assert sessions <= prev_sessions
        prev_sessions = sessions
    assert int(got[_GAPS_S[-1]]["n_sessions"]) >= len(users)


def test_distance_histogram_matches_bruteforce(spark):
    got = {
        int(r["bucket"]): r
        for r in REGISTRY["emb_distance_histogram"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb[emb["vec_id"] < 128].sort_values("vec_id")
    q = np.round(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1000.0
    ).astype("int64")
    n = len(q)
    hist = defaultdict(list)
    for i in range(n):
        d = ((q[i + 1 :] - q[i]) ** 2).sum(axis=1)
        for d2 in d:
            hist[min(int(d2) // 100000, 50)].append(int(d2))
    assert set(got) == set(hist)
    total = 0
    for b, ds in hist.items():
        row = got[b]
        assert int(row["n_pairs"]) == len(ds)
        assert int(row["min_d2"]) == min(ds)
        assert int(row["max_d2"]) == max(ds)
        total += len(ds)
    assert total == n * (n - 1) // 2  # every pair lands in one bucket
