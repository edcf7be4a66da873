"""Property gates for the round-12b batch: Goodman–Kruskal λ replay in
pandas and Burrows' Delta metric properties + replay."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_gk_lambda_matches_bruteforce(spark):
    r = (
        REGISTRY["evt_gk_lambda"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert len(r) == 1
    r = r[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hb"] = ev["ts"].dt.hour // 6
    c = ev.groupby(["hb", "event_type"]).size()
    grid = c.unstack(fill_value=0)
    n = int(grid.values.sum())
    sum_rowmax = int(grid.max(axis=1).sum())
    sum_colmax = int(grid.max(axis=0).sum())
    max_coltot = int(grid.sum(axis=0).max())
    max_rowtot = int(grid.sum(axis=1).max())
    assert int(r["num_col_given_row"]) == sum_rowmax - max_coltot
    assert int(r["den_col_given_row"]) == n - max_coltot
    assert int(r["num_row_given_col"]) == sum_colmax - max_rowtot
    assert int(r["den_row_given_col"]) == n - max_rowtot
    assert int(r["num_sym"]) == (
        sum_rowmax + sum_colmax - max_coltot - max_rowtot
    )
    assert int(r["den_sym"]) == 2 * n - max_coltot - max_rowtot
    # PRE measure bounds: 0 <= lambda <= 1 in every direction
    for k in ("lambda_col_given_row", "lambda_row_given_col", "lambda_sym"):
        assert 0.0 <= r[k] <= 1.0


def _tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w]


def test_burrows_delta_matches_bruteforce(spark):
    rows = (
        REGISTRY["doc_burrows_delta"].spark_fn(spark, SF).toPandas()
        .to_dict("records")
    )
    assert rows
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_src: dict[str, Counter] = {}
    glob: Counter = Counter()
    for _, d in docs.iterrows():
        toks = _tokens(d["text"])
        per_src.setdefault(d["source"], Counter()).update(toks)
        glob.update(toks)
    topw = [
        w for w, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:20]
    srcs = sorted(per_src)
    ns = len(srcs)
    f = {
        (s, w): per_src[s][w] * 1_000_000 // sum(per_src[s].values())
        for s in srcs
        for w in topw
    }
    z = {}
    kept_words = []
    for w in topw:
        S = sum(f[(s, w)] for s in srcs)
        Q = sum(f[(s, w)] ** 2 for s in srcs)
        disc = ns * Q - S * S
        if disc <= 0:
            continue
        kept_words.append(w)
        for s in srcs:
            z[(s, w)] = round(
                1_000_000 * (ns * f[(s, w)] - S) / math.sqrt(disc)
            )
    got = {(r["src_a"], r["src_b"]): r for r in rows}
    assert len(got) == ns * (ns - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            want = sum(abs(z[(a, w)] - z[(b, w)]) for w in kept_words)
            r = got[(a, b)]
            assert int(r["n_words"]) == len(kept_words)
            assert int(r["delta_sum_micro"]) == want
    # metric sanity: Delta is symmetric by construction (a<b canonical)
    # and non-negative; self-delta would be 0
    assert all(r["burrows_delta"] >= 0 for r in rows)
