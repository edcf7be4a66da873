"""Property gates for the round-8e operators (plans/queries_r8e.py):
brute-force the HLL register table, Newman's Q from the raw candidate
graph, and the Engle-Granger readout from raw rows.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF).toPandas()


def test_stream_hll_portable_matches_pure_python(spark):
    got = _run(spark, "stream_hll_portable_distinct")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    regs = defaultdict(dict)
    for et, uid in set(zip(ev.event_type, ev.user_id)):
        hv = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:8], 16)
        bkt, w = hv % 256, hv // 256
        rho = 25 if w == 0 else 25 - w.bit_length()
        regs[et][bkt] = max(regs[et].get(bkt, -(10 ** 9)), rho)
    for _, r in got.iterrows():
        reg = regs[r["event_type"]]
        zero = 256 - len(reg)
        ssum = sum(1 << (25 - v) for v in reg.values()) + zero * (1 << 25)
        assert int(r["zero_registers"]) == zero
        assert int(r["sum_scaled"]) == ssum
        assert float(r["hll_users"]) == round(1579498136381.3938 / ssum, 6)


def test_dupgraph_modularity_matches_pure_python(spark):
    from mql5_economic_news_data_pipeline_2025_gcp__spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_mapside,
    )
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
        fan_out,
        t,
    )

    got = _run(spark, "doc_dupgraph_modularity").iloc[0]
    docs = fan_out(spark, t(spark, SF, "documents"))
    sig = minhash_signatures_mapside(docs, n=3, num_hashes=8)
    pairs = [
        (int(r.id_a), int(r.id_b))
        for r in lsh_candidate_pairs(sig, bands=4, rows_per_band=2).collect()
    ]
    # pure-python CC (min label in component)
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    label = {}
    for n in adj:
        if n in label:
            continue
        comp, stack = [], [n]
        seen = {n}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        lab = min(comp)
        for u in comp:
            label[u] = lab
    m = len(pairs)
    e_c = defaultdict(int)
    for a, b in pairs:
        if label[a] == label[b]:
            e_c[label[a]] += 1
    d_c = defaultdict(int)
    for n, nbrs in adj.items():
        d_c[label[n]] += len(nbrs)
    q_num = sum(4 * m * e_c[c] - d_c[c] * d_c[c] for c in d_c)
    assert int(got["n_communities"]) == len(d_c)
    assert int(got["q_num"]) == q_num
    assert int(got["q_den"]) == 4 * m * m
    assert float(got["modularity"]) == round(q_num / (4 * m * m), 6)


def test_cointegration_matches_pure_python(spark):
    got = _run(spark, "evt_cointegration_lite").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.value.notna() & ev.event_type.isin(["view", "purchase"])].copy()
    ev["vc"] = np.round(ev.value.to_numpy(dtype=np.float64) * 100).astype(np.int64)
    ev["day"] = ev.ts.dt.normalize()
    g = ev.pivot_table(
        index="day",
        columns="event_type",
        values="vc",
        aggfunc="sum",
        fill_value=0,
    ).sort_index()
    x = [int(v) for v in g.get("view", pd.Series(0, index=g.index))]
    y = [int(v) for v in g.get("purchase", pd.Series(0, index=g.index))]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    beta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    alpha = (float(sy) - beta * float(sx)) / float(n)
    e = [float(b) - alpha - beta * a for a, b in zip(x, y)]
    s_ee1 = 0.0
    for i in range(1, n):
        s_ee1 += e[i] * e[i - 1]
    s_e2 = 0.0
    for i in range(n - 1):
        s_e2 += e[i] * e[i]
    assert int(got["n_days"]) == n
    assert float(got["beta"]) == round(beta, 6)
    assert float(got["alpha"]) == round(alpha, 6)
    assert float(got["resid_rho1"]) == round(s_ee1 / s_e2, 6)
