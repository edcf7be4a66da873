"""Property gates for the round-10c batch (plans/queries_r10c.py):
replay the Gopher rules per document in Python; brute-force the k-NN
lists and pin the hubness histogram's mass identity.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_STOPS = {"the", "be", "to", "of", "and", "that", "have", "with"}
_Q, _K = 64, 5


def test_gopher_rules_match_replay(spark):
    rows = (
        REGISTRY["doc_gopher_rules"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {r["source"]: r for r in rows}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want: dict[str, list[int]] = {}
    for _, row in docs.iterrows():
        ws = [w for w in re.split(r"\s+", row["text"].strip().lower()) if w]
        n_w = len(ws)
        sum_len = sum(len(w) for w in ws)
        n_alpha = sum(1 for w in ws if re.search("[a-z]", w))
        n_stop = len(_STOPS & set(ws))
        r_wc = 50 <= n_w <= 100000
        r_mwl = 3 * n_w <= sum_len <= 10 * n_w
        r_alpha = 5 * n_alpha >= 4 * n_w
        r_stop = n_stop >= 2
        acc = want.setdefault(row["source"], [0, 0, 0, 0, 0, 0])
        acc[0] += 1
        acc[1] += not r_wc
        acc[2] += not r_mwl
        acc[3] += not r_alpha
        acc[4] += not r_stop
        acc[5] += r_wc and r_mwl and r_alpha and r_stop
    assert set(got) == set(want)
    for src, (n, fwc, fmwl, falpha, fstop, npass) in want.items():
        r = got[src]
        assert int(r["n_docs"]) == n
        assert int(r["fail_word_count"]) == fwc
        assert int(r["fail_mean_word_len"]) == fmwl
        assert int(r["fail_alpha_frac"]) == falpha
        assert int(r["fail_stop_words"]) == fstop
        assert int(r["n_pass_all"]) == npass
    # documented fixture degeneracies (honest read-out, pinned):
    # word-soup docs never reach 2 distinct stop words; every token
    # is alphabetic
    assert all(int(got[s]["fail_stop_words"]) == int(got[s]["n_docs"])
               for s in got)
    assert all(int(got[s]["fail_alpha_frac"]) == 0 for s in got)
    # ...and the word-count rule actually discriminates (both outcomes)
    tot_fail_wc = sum(int(got[s]["fail_word_count"]) for s in got)
    tot = sum(int(got[s]["n_docs"]) for s in got)
    assert 0 < tot_fail_wc < tot


def test_hubness_matches_bruteforce(spark):
    rows = (
        REGISTRY["emb_hubness"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["k_occ"]): int(r["n_vectors"]) for r in rows}
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): np.round(
            np.asarray(r["embedding"], dtype=float) * 1000
        ).astype("int64")
        for _, r in emb.iterrows()
    }
    occ: dict[int, int] = {}
    for qid in sorted(vecs):
        if qid >= _Q:
            continue
        d2 = sorted(
            (int(((v - vecs[qid]) ** 2).sum()), cid)
            for cid, v in vecs.items()
            if cid != qid
        )
        for _, cid in d2[:_K]:
            occ[cid] = occ.get(cid, 0) + 1
    want: dict[int, int] = {}
    for c in occ.values():
        want[c] = want.get(c, 0) + 1
    assert got == want
    # mass identity: every query contributes exactly k list slots
    assert sum(k * n for k, n in got.items()) == _Q * _K
    # skew assembles from the histogram (k-occurrence third moment)
    n_in = sum(got.values())
    mean = _Q * _K / n_in
    m2 = sum(n * (k - mean) ** 2 for k, n in got.items()) / n_in
    m3 = sum(n * (k - mean) ** 3 for k, n in got.items()) / n_in
    if m2 > 0:
        skew = m3 / m2**1.5
        assert np.isfinite(skew)
