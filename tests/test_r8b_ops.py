"""Property gates for the round-8b operators (plans/queries_r8b.py).

Brute-force each algorithm from raw parquet rows in plain Python:
WordPiece fertility accounting, Zipf-head coverage, OOV pruning cost,
the Murphy identity REL − RES + UNC == Brier, and IPF's fit direction
(each raking round moves its own margins onto target).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r6b import (
    _WP_CHARS,
    _WP_VOCAB,
)

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF).toPandas()


def _words(text):
    return [w for w in re.split(r"\s+", text.strip().lower()) if w]


def _wp_segment(w):
    if not set(w) <= set(_WP_CHARS):
        return ["[UNK]"]
    out, pos = [], 0
    while pos < len(w):
        best = None
        for piece, raw, cont in _WP_VOCAB:
            if cont != (pos > 0):
                continue
            if w.startswith(raw, pos) and (best is None or len(raw) > len(best[1])):
                best = (piece, raw)
        pos += len(best[1])
        out.append(best[0])
    return out


def test_wordpiece_fertility_matches_pure_python(spark):
    got = _run(spark, "doc_wordpiece_fertility")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ref = {}
    for src, g in docs.groupby("source"):
        n_words = n_tokens = n_cont = 0
        for text in g.text:
            for w in _words(text):
                pieces = _wp_segment(w)
                n_words += 1
                n_tokens += len(pieces)
                n_cont += sum(1 for p in pieces if p.startswith("##"))
        ref[src] = (n_words, n_tokens, n_cont)
    for _, r in got.iterrows():
        nw, nt, nc = ref[r["source"]]
        assert (int(r["n_words"]), int(r["n_tokens"]), int(r["n_continuations"])) == (
            nw,
            nt,
            nc,
        )
        assert float(r["fertility"]) == round(nt / nw, 6)


def test_ngram_coverage_matches_pure_python(spark):
    got = _run(spark, "doc_ngram_coverage_curve").iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter()
    for text in docs.text:
        ws = _words(text)
        for a, b in zip(ws, ws[1:]):
            cnt[(a, b)] += 1
    total = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    cov = lambda k: sum(c for _, c in ordered[:k])  # noqa: E731
    assert int(got["total_instances"]) == total
    assert int(got["distinct_bigrams"]) == len(cnt)
    for k, col in ((10, "cov10"), (100, "cov100"), (1000, "cov1000")):
        assert int(got[col]) == cov(k)
        assert int(got[f"ppm{k}"]) == cov(k) * 1000000 // total


def test_vocab_pruning_matches_pure_python(spark):
    got = _run(spark, "doc_vocab_pruning_oov")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    wc = Counter(w for text in docs.text for w in _words(text))
    total = sum(wc.values())
    for _, r in got.iterrows():
        t = int(r["min_count"])
        kept = sum(1 for f in wc.values() if f >= t)
        oov = sum(f for f in wc.values() if f < t)
        assert (int(r["vocab_kept"]), int(r["oov_instances"])) == (kept, oov)
        assert int(r["total_instances"]) == total
        assert int(r["oov_ppm"]) == oov * 1000000 // total


def test_brier_murphy_identity(spark):
    """REL − RES + UNC must equal the raw Brier score (up to the 1e-6
    emission rounding × 10 bins)."""
    got = _run(spark, "evt_brier_decomposition")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    bins = (
        ev.user_id.map(
            lambda u: int(hashlib.md5(str(int(u)).encode()).hexdigest()[:3], 16)
            % 10
        )
    ).to_numpy()
    o = (ev.event_type == "purchase").to_numpy().astype(int)
    n = len(o)
    brier = sum(((2 * b + 1) / 20.0 - x) ** 2 for b, x in zip(bins, o)) / n
    rel = got.rel_term.sum() / n
    res = got.res_term.sum() / n
    unc = float(got.uncertainty.iloc[0])
    assert abs((rel - res + unc) - brier) < 1e-4
    # per-bin integer sufficient statistics are exact
    ref = Counter(zip(bins, o))
    for _, r in got.iterrows():
        b = int(r["bin"])
        assert int(r["n"]) == ref[(b, 0)] + ref[(b, 1)]
        assert int(r["s"]) == ref[(b, 1)]


def test_ipf_rounds_move_margins_toward_targets(spark):
    got = _run(spark, "evt_ipf_raking_check")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    wk = (ev.ts.dt.dayofweek >= 5).astype(int)  # pandas: Mon=0 → Sat/Sun >= 5
    df = pd.DataFrame(
        {"et": ev.event_type, "wk": wk, "even": (ev.event_id % 2 == 0)}
    )
    # row-fit: after round 1 the weighted row masses hit the even-split
    # targets to within rounding of the milli weights
    r_target = df[df.even].groupby("et").size().to_dict()
    for et, g in got.groupby("event_type"):
        mass1 = (g.n * g.w1_millis).sum() / 1000.0
        assert abs(mass1 - r_target[et]) <= 0.002 * g.n.sum()
    # col-fit: after round 2 the weighted column masses hit the odd-split
    # targets to within rounding
    c_target = df[~df.even].groupby("wk").size().to_dict()
    for wkv, g in got.groupby("wk"):
        mass2 = g.col_mass2.iloc[0] / 1000.0
        assert (g.col_mass2 == g.col_mass2.iloc[0]).all()
        assert abs(mass2 - c_target[int(wkv)]) <= 0.002 * g.n.sum()
