"""Property gate for evt_changepoint_binseg2: a pure-Python recursive
binary segmentation from raw rows, plus the SSE-decomposition
invariant (each child's objective ≥ its segment's single-mean fit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _best_split(days, s, n, lo, hi):
    """argmax over k in [lo, hi) of L²/nl + R²/nr for the segment
    [lo, hi]; returns (day, ls, ln, rs, rn, obj) or None."""
    tot_s = sum(s[lo : hi + 1])
    tot_n = sum(n[lo : hi + 1])
    best = None
    ls = ln = 0
    for k in range(lo, hi):
        ls += s[k]
        ln += n[k]
        rs, rn = tot_s - ls, tot_n - ln
        if rn <= 0 or ln <= 0:
            continue
        obj = float(ls) * ls / ln + float(rs) * rs / rn
        if best is None or obj > best[5] or (obj == best[5] and days[k] < best[0]):
            if best is None or obj > best[5]:
                best = (days[k], ls, ln, rs, rn, obj)
    return best


def test_binseg2_matches_pure_python(spark):
    got = (
        REGISTRY["evt_changepoint_binseg2"]
        .spark_fn(spark, SF)
        .toPandas()
        .set_index("segment")
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.value.notna()].copy()
    ev["vc"] = np.round(ev.value.to_numpy(dtype=np.float64) * 100).astype(np.int64)
    g = ev.groupby(ev.ts.dt.normalize()).agg(s=("vc", "sum"), n=("vc", "size"))
    g = g.sort_index()
    days = [d.date() for d in g.index]
    s = [int(v) for v in g.s]
    n = [int(v) for v in g.n]
    nn = len(days)
    root = _best_split(days, s, n, 0, nn - 1)
    k1 = days.index(root[0])
    left = _best_split(days, s, n, 0, k1)
    right = _best_split(days, s, n, k1 + 1, nn - 1)
    for seg, ref in (("root", root), ("left", left), ("right", right)):
        if ref is None:
            assert seg not in got.index
            continue
        row = got.loc[seg]
        assert pd.Timestamp(row["split_day"]).date() == ref[0]
        assert (
            int(row["left_sum_c"]),
            int(row["left_n"]),
            int(row["right_sum_c"]),
            int(row["right_n"]),
        ) == ref[1:5]
        assert float(row["objective"]) == round(ref[5], 6)
    # decomposition invariant: a child's two-mean fit is at least as
    # good as its segment's one-mean fit (SSE never increases by
    # splitting) — L²/nl + R²/nr >= (L+R)²/(nl+nr)
    for seg in ("left", "right"):
        if seg in got.index:
            row = got.loc[seg]
            L, nl = int(row["left_sum_c"]), int(row["left_n"])
            R, nr = int(row["right_sum_c"]), int(row["right_n"])
            assert float(row["objective"]) >= (L + R) ** 2 / (nl + nr) - 1e-6
