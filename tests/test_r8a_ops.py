"""Property gates for the round-8a oracle twins (plans/queries_r8a.py).

Differential hashes (diffcheck/driver) prove Spark == DuckDB; these
tests brute-force each ALGORITHM from raw parquet rows in plain
Python/numpy — the invariant both engines could get wrong together:
Sennrich BPE greedy-merge semantics, the simhash majority vote, PQ's
argmin-encode/ADC-lookup identity, LPA's plurality-with-smallest-tie
rule, and the HLL register / exact-percentile definitions.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _run(spark, name):
    return (
        REGISTRY[name]
        .spark_fn(spark, SF)
        .toPandas()
    )


# ----------------------------------------------------------- BPE twin


def _bpe_reference(texts, num_merges=3):
    """Pure-Python Sennrich BPE on the word-frequency dictionary."""
    wf = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                wf[w] += 1
    vocab = {tuple(w): f for w, f in wf.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pc = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((rank, l, r, l + r, cnt))
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train3_matches_pure_python(spark):
    got = _run(spark, "doc_bpe_train3_check").sort_values("rank")
    ref = _bpe_reference(_docs()["text"].tolist(), 3)
    assert [
        (int(r["rank"]), r["left"], r["right"], r["merged"], int(r["pair_count"]))
        for _, r in got.iterrows()
    ] == ref


# --------------------------------------------------------- phash twin


def _simhash64(payload: bytes) -> int:
    acc = [0] * 64
    for i in range(max(0, len(payload) - 3)):
        h = int.from_bytes(hashlib.md5(payload[i : i + 4]).digest()[:8], "big")
        for j in range(64):
            acc[j] += 1 if (h >> j) & 1 else -1
    v = 0
    for j in range(64):
        if acc[j] > 0:
            v |= 1 << j
    return v - (1 << 64) if v >= (1 << 63) else v


def test_phash_histogram_matches_pure_python(spark):
    got = _run(spark, "mm_phash_portable_check")
    docs = _docs()
    docs = docs[docs.doc_id < 2048]
    sigs = {
        int(r.doc_id): _simhash64(r.text.encode("utf-8"))
        for r in docs.itertuples()
    }
    ids = sorted(sigs)
    hist = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            hist[bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")] += 1
    assert {
        int(r["hamming"]): int(r["n_pairs"]) for _, r in got.iterrows()
    } == dict(hist)


# ------------------------------------------------------------ PQ twin


def test_pq_adc_matches_numpy(spark):
    got = _run(spark, "emb_pq_adc_check").sort_values("rank")
    emb = _emb().sort_values("vec_id")
    q = {
        int(r.vec_id): np.round(np.asarray(r.embedding, dtype=np.float64) * 1000)
        .astype(np.int64)
        for r in emb.itertuples()
    }
    cb = {c: q[c] for c in range(4)}
    query = q[4]
    scores = {}
    for vid, v in q.items():
        if vid < 8:
            continue
        adc = 0
        for s in range(8):
            sl = slice(8 * s, 8 * s + 8)
            d2s = [(int(((v[sl] - cb[c][sl]) ** 2).sum()), c) for c in range(4)]
            code = min(d2s)[1]
            adc += int(((query[sl] - cb[code][sl]) ** 2).sum())
        scores[vid] = adc
    ref = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    assert [
        (int(r["neighbor_id"]), int(r["adc_d2"])) for _, r in got.iterrows()
    ] == ref


# ----------------------------------------------------------- LPA twin


def test_knn_label_prop_matches_pure_python(spark):
    got = _run(spark, "emb_knn_label_prop_check")
    emb = _emb()
    emb = emb[emb.vec_id < 256]
    q = {
        int(r.vec_id): np.round(np.asarray(r.embedding, dtype=np.float64) * 1000)
        .astype(np.int64)
        for r in emb.itertuples()
    }
    ids = sorted(q)
    edges = set()
    for a in ids:
        d2s = sorted(
            (int(((q[a] - q[b]) ** 2).sum()), b) for b in ids if b != a
        )
        for _, b in d2s[:4]:
            edges.add((a, b))
            edges.add((b, a))
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(labels[b] for b in nbrs)
            new[n] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    ref = Counter(labels.values())
    assert {
        int(r["community"]): int(r["n_members"]) for _, r in got.iterrows()
    } == dict(ref)


# --------------------------------------------------- sketch profile twin


def test_sketch_portable_profile_matches_pure_python(spark):
    got = _run(spark, "evt_sketch_portable_profile")
    ev = _events()
    # exact cross-multiplied percentiles of value cents
    out = {}
    for et, g in ev[ev.value.notna()].groupby("event_type"):
        vc = sorted(
            int(v)
            for v in np.round(g.value.to_numpy(dtype=np.float64) * 100).astype(
                np.int64
            )
        )
        n = len(vc)
        p50 = next(v for i, v in enumerate(vc, 1) if 2 * i >= n)
        p99 = next(v for i, v in enumerate(vc, 1) if 100 * i >= 99 * n)
        out[et] = (n, p50, p99)
    # HLL registers over md5-prefix hashes of distinct (type, user)
    regs = defaultdict(dict)
    for et, uid in set(zip(ev.event_type, ev.user_id)):
        hv = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:8], 16)
        bkt, w = hv % 256, hv // 256
        rho = 25 if w == 0 else 25 - w.bit_length()
        regs[et][bkt] = max(regs[et].get(bkt, -(10 ** 9)), rho)
    for _, r in got.iterrows():
        et = r["event_type"]
        n, p50, p99 = out[et]
        assert (int(r["n_valued"]), int(r["p50_c"]), int(r["p99_c"])) == (
            n,
            p50,
            p99,
        )
        reg = regs[et]
        zero = 256 - len(reg)
        ssum = sum(1 << (25 - v) for v in reg.values()) + zero * (1 << 25)
        assert int(r["zero_registers"]) == zero
        assert int(r["sum_scaled"]) == ssum
        assert float(r["hll_users"]) == round(1579498136381.3938 / ssum, 6)


# ---------------------------------------------------- HLL overlap twin


def test_hll_portable_overlap_matches_pure_python(spark):
    got = _run(spark, "evt_hll_portable_overlap")
    ev = _events()
    regs = defaultdict(dict)
    for et, uid in set(zip(ev.event_type, ev.user_id)):
        hv = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:8], 16)
        bkt, w = hv % 256, hv // 256
        rho = 25 if w == 0 else 25 - w.bit_length()
        regs[et][bkt] = max(regs[et].get(bkt, -(10 ** 9)), rho)

    def scaled(reg):
        return sum(1 << (25 - v) for v in reg.values()) + (
            256 - len(reg)
        ) * (1 << 25)

    exact = ev.groupby("event_type").user_id.nunique().to_dict()
    for _, r in got.iterrows():
        ta, tb = r["type_a"], r["type_b"]
        assert ta < tb
        union = dict(regs[ta])
        for k, v in regs[tb].items():
            union[k] = max(union.get(k, -(10 ** 9)), v)
        assert int(r["n_a_exact"]) == exact[ta]
        assert int(r["n_b_exact"]) == exact[tb]
        assert int(r["sum_scaled_a"]) == scaled(regs[ta])
        assert int(r["sum_scaled_b"]) == scaled(regs[tb])
        assert int(r["sum_scaled_union"]) == scaled(union)
        est = (
            1579498136381.3938 / scaled(regs[ta])
            + 1579498136381.3938 / scaled(regs[tb])
            - 1579498136381.3938 / scaled(union)
        )
        assert float(r["est_overlap"]) == round(est, 2)
