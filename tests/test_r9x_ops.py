"""Property gate for the round-9x RBO batch (plans/queries_r9x.py):
brute-force both top-50 term rankings from raw parquet, match ranks,
and assemble extrapolated RBO at p = 0.9 with its [0, 1] range pinned.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_A, _B = "src0", "src1"
_D = 50
_P = 0.9


def _top_terms(docs, source):
    cnt = Counter()
    for text in docs.loc[docs["source"] == source, "text"]:
        for w in re.sub(r"\s+", " ", text.lower().strip()).split(" "):
            if w:
                cnt[w] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_D]
    return {w: (r + 1, c) for r, (w, c) in enumerate(ranked)}


def test_rbo_term_ranks_match_and_assemble(spark):
    rows = (
        REGISTRY["doc_rbo_term_ranks"].spark_fn(spark, SF).toPandas()
    )
    got = {
        r["term"]: (
            int(r["rank_a"]),
            int(r["rank_b"]),
            int(r["c_a"]),
            int(r["c_b"]),
        )
        for r in rows.to_dict("records")
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ta = _top_terms(docs, _A)
    tb = _top_terms(docs, _B)
    want = {
        w: (ta[w][0], tb[w][0], ta[w][1], tb[w][1])
        for w in set(ta) & set(tb)
    }
    assert got == want
    # assemble extrapolated RBO at p = 0.9 from the emitted rank pairs
    overlap_at = [0] * (_D + 1)
    for ra, rb, _, _ in got.values():
        for d in range(max(ra, rb), _D + 1):
            overlap_at[d] += 1
    rbo_min = (1 - _P) * sum(
        _P ** (d - 1) * overlap_at[d] / d for d in range(1, _D + 1)
    )
    # extrapolation term: assume agreement continues at depth-D rate
    rbo_ext = rbo_min + (overlap_at[_D] / _D) * _P ** _D
    assert 0.0 <= rbo_min <= rbo_ext <= 1.0 + 1e-12
    # overlap-at-depth is monotone and bounded by depth
    for d in range(1, _D + 1):
        assert overlap_at[d] <= d
        assert overlap_at[d] >= overlap_at[d - 1]
    # word-soup fixture sources share a small vocabulary: the heads
    # must overlap substantially
    assert overlap_at[_D] >= _D // 2
