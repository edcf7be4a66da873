"""Property gates for the round-7a oracle twins: brute-force the
ALGORITHM (two Lloyd rounds, fixed-basis projection, fixed-weight
linear evaluation, Bloom probe-and-test) in plain Python from the raw
parquet rows and compare against the registered Spark queries."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r7a import (
    _BLOOM_K,
    _BLOOM_M,
    _basis_coef,
)

SF = "/root/testdata/sf0.001"


def _round_half_away(q: float) -> int:
    """round() as both engines implement it (half away from zero) —
    Python's built-in round is banker's and would diverge on .5 ties."""
    return int(math.floor(q + 0.5)) if q >= 0 else int(math.ceil(q - 0.5))


def _load_qvecs():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding::DOUBLE[] AS e, label "
        f"FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return [
        (vid, [_round_half_away(x * 1000.0) for x in e], lab)
        for vid, e, lab in rows
    ]


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _assign(qv, cents):
    # min d2, ties to the lower centroid id
    return min(cents, key=lambda cid: (_d2(qv, cents[cid]), cid))


def test_lloyd_round2_matches_bruteforce(spark):
    got = {
        int(r["centroid_id"]): r
        for r in REGISTRY["emb_lloyd_round2_check"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    vecs = _load_qvecs()
    cents1 = {vid: qv for vid, qv, _ in vecs if vid < 8}
    corpus = [(vid, qv) for vid, qv, _ in vecs if vid >= 8]
    a1 = {vid: _assign(qv, cents1) for vid, qv in corpus}
    # round-1 update: integer sums, then ONE division + half-away round
    cents2 = {}
    for cid in set(a1.values()):
        members = [qv for vid, qv in corpus if a1[vid] == cid]
        n = len(members)
        cents2[cid] = [
            _round_half_away(sum(m[i] for m in members) / n)
            for i in range(len(members[0]))
        ]
    a2 = {vid: _assign(qv, cents2) for vid, qv in corpus}
    for cid in sorted({a1[v] for v in a1}):
        exp_n1 = sum(1 for v in a1 if a1[v] == cid)
        exp_n2 = sum(1 for v in a2 if a2[v] == cid)
        exp_moved = sum(1 for v in a2 if a2[v] == cid and a1[v] != cid)
        exp_inertia = sum(
            _d2(qv, cents2[cid]) for vid, qv in corpus if a2[vid] == cid
        )
        row = got[cid]
        assert int(row["n_round1"]) == exp_n1, cid
        assert int(row["n_round2"]) == exp_n2, cid
        assert int(row["moved_in"]) == exp_moved, cid
        assert int(row["inertia2"]) == exp_inertia, cid
    assert set(got) == set(cents1) & {a1[v] for v in a1} | {
        a1[v] for v in a1
    }  # every non-empty round-1 cluster is reported


def test_lloyd_round2_movement_is_consistent(spark):
    df = (
        REGISTRY["emb_lloyd_round2_check"].spark_fn(spark, SF).toPandas()
    )
    # total corpus size is conserved across rounds; movers-in <= round-2 size
    assert int(df["n_round1"].sum()) == int(df["n_round2"].sum())
    assert (df["moved_in"] <= df["n_round2"]).all()
    assert (df["inertia2"] >= 0).all()


def test_pca_basis_matches_bruteforce(spark):
    got = {
        int(r["vec_id"]): r
        for r in REGISTRY["emb_pca_basis_check"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    for vid, qv, _ in _load_qvecs():
        row = got[vid]
        for k in range(4):
            exp = sum(
                x * _basis_coef(k, i + 1) for i, x in enumerate(qv)
            )
            assert int(row[f"y{k}"]) == exp, (vid, k)
        assert int(row["x2"]) == sum(x * x for x in qv), vid


def test_logreg_margin_matches_bruteforce(spark):
    got = {
        int(r["y"]): r
        for r in REGISTRY["emb_logreg_margin_check"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    agg = {0: [0, 0, 0, 0], 1: [0, 0, 0, 0]}  # n, pred_pos, correct, msum
    for _, qv, lab in _load_qvecs():
        y = int(lab) % 2
        margin = sum(x * (((7 * (i + 1)) % 11) - 5) for i, x in enumerate(qv))
        pred = 1 if margin >= 0 else 0
        a = agg[y]
        a[0] += 1
        a[1] += pred
        a[2] += 1 if pred == y else 0
        a[3] += margin
    for y in (0, 1):
        row = got[y]
        assert [
            int(row["n"]),
            int(row["n_pred_pos"]),
            int(row["n_correct"]),
            int(row["margin_sum"]),
        ] == agg[y], y


def _shingles(text: str):
    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _probes(shingle: str):
    h = hashlib.md5(shingle.encode()).hexdigest()
    return [int(h[4 * w : 4 * w + 4], 16) % _BLOOM_M for w in range(_BLOOM_K)]


def test_bloom_portable_matches_bruteforce(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["doc_bloom_portable_check"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    bench_sh = set()
    for did, _, text in docs:
        if did % 17 == 0:
            bench_sh |= _shingles(text)
    bits = {p for s in bench_sh for p in _probes(s)}
    exp = {}
    for did, src, text in docs:
        if did % 17 == 0:
            continue
        sh = _shingles(text)
        exact = any(s in bench_sh for s in sh)
        bloom = any(all(p in bits for p in _probes(s)) for s in sh)
        n, e, b = exp.get(src, (0, 0, 0))
        exp[src] = (n + 1, e + exact, b + bloom)
    assert set(got) == set(exp)
    for src, (n, e, b) in exp.items():
        row = got[src]
        assert (int(row["n_docs"]), int(row["n_exact"]), int(row["n_bloom"])) == (
            n,
            e,
            b,
        ), src
        # Bloom filters cannot false-negative
        assert int(row["n_bloom"]) >= int(row["n_exact"]), src
