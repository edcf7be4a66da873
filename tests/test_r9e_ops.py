"""Property gates for the round-9e dependence/decision batch
(plans/queries_r9e.py): brute-force the contingency table, the
top-20% confusion matrix, and the association signs from raw parquet
rows; assemble MI = H(t) + H(d) - H(t,d) >= 0 from the emitted cells.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_LN_U = 1000000


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_mutual_information_cells_and_assembly(spark):
    got = (
        REGISTRY["evt_mutual_information"]
        .spark_fn(spark, SF)
        .toPandas()
    )
    ev = _events()
    cells = Counter()
    for r in ev.itertuples():
        # Spark dayofweek: 1=Sunday..7=Saturday
        dow = (pd.Timestamp(r.ts).dayofweek + 1) % 7 + 1
        cells[(r.event_type, dow)] += 1
    n = sum(cells.values())
    rows = Counter()
    cols = Counter()
    for (t, d), c in cells.items():
        rows[t] += c
        cols[d] += c
    assert len(got) == len(cells)
    mi_u = 0
    for rec in got.to_dict("records"):
        key = (rec["event_type"], int(rec["dow"]))
        c = cells[key]
        assert int(rec["c"]) == c
        assert int(rec["row_total"]) == rows[key[0]]
        assert int(rec["col_total"]) == cols[key[1]]
        assert int(rec["n"]) == n
        expect = c * round(
            math.log(c * n / (rows[key[0]] * cols[key[1]])) * _LN_U
        )
        assert int(rec["mi_term_u"]) == expect
        mi_u += expect
    mi = mi_u / (n * _LN_U)
    # direct float reference and the entropy identity
    mi_direct = sum(
        (c / n) * math.log(c * n / (rows[t] * cols[d]))
        for (t, d), c in cells.items()
    )
    ht = -sum((c / n) * math.log(c / n) for c in rows.values())
    hd = -sum((c / n) * math.log(c / n) for c in cols.values())
    htd = -sum((c / n) * math.log(c / n) for c in cells.values())
    assert abs(mi - mi_direct) < 1e-5
    assert abs(mi_direct - (ht + hd - htd)) < 1e-9
    assert mi >= -1e-5
    assert mi <= min(ht, hd) + 1e-9


def test_confusion_threshold_matches_bruteforce(spark):
    row = (
        REGISTRY["evt_confusion_threshold"]
        .spark_fn(spark, SF)
        .toPandas()
        .iloc[0]
    )
    ev = _events()
    ev = ev[ev["value"].notna()]
    score = defaultdict(int)
    y = defaultdict(int)
    for r in ev.itertuples():
        uid = int(r.user_id)
        score[uid] += int(round(float(r.value) * 100))
        if r.event_type == "purchase":
            y[uid] = 1
    order = sorted(score, key=lambda u: (-score[u], u))
    nu = len(order)
    tp = fp = fn = tn = 0
    for rn, uid in enumerate(order, start=1):
        yhat = 1 if rn * 5 <= nu else 0
        yy = y.get(uid, 0)
        tp += yhat and yy
        fp += yhat and not yy
        fn += (not yhat) and yy
        tn += (not yhat) and (not yy)
    assert (int(row["tp"]), int(row["fp"]), int(row["fn"]), int(row["tn"])) \
        == (tp, fp, fn, tn)
    assert int(row["precision_bp"]) == tp * 10000 // (tp + fp)
    assert int(row["recall_bp"]) == tp * 10000 // (tp + fn)
    assert int(row["f1_bp"]) == 2 * tp * 10000 // (2 * tp + fp + fn)
    # F1 is between precision and recall (floored-bp tolerance of 1)
    lo = min(int(row["precision_bp"]), int(row["recall_bp"]))
    hi = max(int(row["precision_bp"]), int(row["recall_bp"]))
    assert lo - 1 <= int(row["f1_bp"]) <= hi + 1


def test_simpson_audit_matches_bruteforce(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_simpson_paradox_audit"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    ev = _events()
    ev = ev[ev["value"].notna()]
    g = defaultdict(lambda: [0, 0, 0, 0])  # n, sx, sy, sxy
    for r in ev.itertuples():
        x = 1 if pd.Timestamp(r.ts).dayofweek >= 5 else 0  # Sat/Sun
        yv = int(round(float(r.value) * 100))
        s = g[r.event_type]
        s[0] += 1
        s[1] += x
        s[2] += yv
        s[3] += x * yv
    tn = sum(v[0] for v in g.values())
    tsx = sum(v[1] for v in g.values())
    tsy = sum(v[2] for v in g.values())
    tsxy = sum(v[3] for v in g.values())

    def sgn(a, b):
        return 1 if a > b else (-1 if a < b else 0)

    pooled = sgn(tn * tsxy, tsx * tsy)
    assert set(got) == set(g)
    for et, (n, sx, sy, sxy) in g.items():
        row = got[et]
        assert (int(row["n"]), int(row["sx"]), int(row["sy"]),
                int(row["sxy"])) == (n, sx, sy, sxy)
        a = sgn(n * sxy, sx * sy)
        assert int(row["assoc_sign"]) == a
        assert int(row["pooled_sign"]) == pooled
        assert int(row["flipped"]) == (1 if a * pooled < 0 else 0)
