"""Property gates for the round-12c batch: LCS/ROUGE-L replay against a
classic quadratic DP, and a full numpy replay of the deterministic
Hopkins statistic."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _toks(text: str, cap: int = 24) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w][:cap]


def _lcs(a: list[str], b: list[str]) -> int:
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[n][m]


def test_lcs_rouge_matches_bruteforce(spark):
    rows = (
        REGISTRY["doc_lcs_rouge"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values(
        ["source", "doc_id"]
    )
    got = {r["source"]: r for r in rows}
    n_checked = 0
    for src, g in docs.groupby("source"):
        texts = list(g["text"])
        if len(texts) < 2:
            continue
        a, b = _toks(texts[0]), _toks(texts[1])
        if not a or not b:
            continue
        want = _lcs(a, b)
        r = got[src]
        assert (int(r["la"]), int(r["lb"])) == (len(a), len(b))
        assert int(r["lcs_len"]) == want
        # ROUGE-L F bounds: 0 <= F <= 1, and F = 1 iff identical prefixes
        assert 0.0 <= r["rouge_l_f"] <= 1.0
        n_checked += 1
    assert n_checked == len(rows)


def _md5_rank(keys, prefix=""):
    return sorted(
        keys, key=lambda k: (hashlib.md5((prefix + str(k)).encode()).hexdigest(), k)
    )


def test_hopkins_matches_numpy_replay(spark):
    r = (
        REGISTRY["emb_hopkins_statistic"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert len(r) == 1
    r = r[0]
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(v): np.round(np.array(e, dtype=np.float64) * 1000).astype(
            np.int64
        )
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    ref_ids = _md5_rank(list(vecs))[:256]
    R = np.stack([vecs[i] for i in ref_ids])
    lo, hi = R.min(axis=0), R.max(axis=0)
    assert int(r["n_ref"]) == len(ref_ids)
    # synthetic probes: md5('hop<p>:<d>') % 1001 scaled into [lo, hi]
    sum_u = 0
    for p in range(1, 33):
        um = np.empty(R.shape[1], dtype=np.int64)
        for d in range(1, R.shape[1] + 1):
            hv = int(
                hashlib.md5(f"hop{p}:{d}".encode()).hexdigest()[:8], 16
            ) % 1001
            um[d - 1] = lo[d - 1] + ((hi[d - 1] - lo[d - 1]) * hv) // 1000
        sum_u += int(((R - um) ** 2).sum(axis=1).min())
    # real query points: md5('hop:<id>') rank within the reference set
    x_ids = _md5_rank(ref_ids, prefix="hop:")[:32]
    sum_w = 0
    for q in x_ids:
        d2 = ((R - vecs[q]) ** 2).sum(axis=1)
        d2[ref_ids.index(q)] = np.iinfo(np.int64).max  # self excluded
        sum_w += int(d2.min())
    assert int(r["sum_u"]) == sum_u
    assert int(r["sum_w"]) == sum_w
    assert int(r["n_probe"]) == 32
    assert 0.0 < r["hopkins"] < 1.0
