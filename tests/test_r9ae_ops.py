"""Property gates for the round-9ae SPRT/Benford batch
(plans/queries_r9ae.py): replay the LLR walk sequentially in Python,
brute-force the two-digit cells, assemble chi-square/MAD conformity.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_INC1 = round(math.log(0.6 / 0.5) * 1e6)
_INC0 = round(math.log(0.4 / 0.5) * 1e6)
_BOUND = round(math.log(19.0) * 1e6)


def test_sprt_conversion_matches_walk(spark):
    row = (
        REGISTRY["evt_sprt_conversion"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")[0]
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    first = ev.groupby("user_id")["ts"].min()
    purch = (
        ev[ev["event_type"] == "purchase"].groupby("user_id")["ts"].min()
    )
    users = sorted(
        first.index, key=lambda u: (first[u], int(u))
    )
    llr = 0
    first_cross = 0
    decision = 0
    n_conv = 0
    for t, u in enumerate(users, start=1):
        x = 0
        if u in purch.index:
            gap = (purch[u].date() - first[u].date()).days
            if gap <= 7:
                x = 1
        n_conv += x
        llr += _INC1 if x else _INC0
        if first_cross == 0 and abs(llr) >= _BOUND:
            first_cross = t
            decision = 1 if llr > 0 else -1
    assert int(row["n_users"]) == len(users)
    assert int(row["n_converted"]) == n_conv
    assert int(row["llr_final_u"]) == llr
    assert int(row["first_cross_t"]) == first_cross
    assert int(row["decision"]) == decision
    # crossing must come with a decision, and vice versa
    assert (first_cross == 0) == (decision == 0)


def test_benford_two_digit_cells_and_conformity(spark):
    rows = (
        REGISTRY["evt_benford_two_digit"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {int(r["d2"]): r for r in rows}
    assert set(got) == set(range(10, 100))
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["v"] = (ev["value"].astype(float) * 100).round().astype("int64")
    ev = ev[ev["v"] >= 10]
    want = Counter(int(str(int(v))[:2]) for v in ev["v"])
    n = sum(want.values())
    chi2 = 0.0
    mad = 0.0
    for d in range(10, 100):
        r = got[d]
        assert int(r["c"]) == want.get(d, 0), d
        assert int(r["n"]) == n
        p_lit = int(r["benford_p_u"]) / 1e6
        p_ref = math.log10(1 + 1 / d)
        assert abs(p_lit - p_ref) < 1e-6
        e = n * p_ref
        chi2 += (want.get(d, 0) - e) ** 2 / e
        mad += abs(want.get(d, 0) / n - p_ref)
    mad /= 90.0
    assert math.isfinite(chi2) and chi2 >= 0.0
    assert 0.0 <= mad <= 1.0
    # literal table is a (quantized) probability distribution
    assert abs(sum(int(got[d]["benford_p_u"]) for d in range(10, 100))
               - 1_000_000) <= 10


def test_sprt_double_cross_decision_is_first_crossing(spark, tmp_path):
    """Adversarial fixture: 17 converters push the LLR past +bound, then
    30 non-converters drag it below -bound. The decision must be +1 (the
    FIRST crossing's direction), not the -1 a bare min-over-signs of all
    crossed rows would report. Differential: Spark vs the DuckDB oracle
    on the same fixture, plus a pinned expected decision."""
    import datetime

    import duckdb

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    n_up = -(-_BOUND // _INC1)  # ceil: conversions to cross +bound
    n_dn = -(-(2 * _BOUND) // -_INC0) + 2  # then enough to cross -bound
    for k in range(n_up + n_dn):
        ts = base + datetime.timedelta(minutes=k)
        eid += 1
        rows.append((eid, ts, k, "view", 1.0, "{}"))
        if k < n_up:  # converter: purchase same day
            eid += 1
            rows.append((eid, ts + datetime.timedelta(hours=1), k,
                         "purchase", 2.0, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet", index=False)

    spec = REGISTRY["evt_sprt_conversion"]
    got = spec.spark_fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet'"
    )
    want = con.execute(spec.oracle).df()
    r = got.to_dict("records")[0]
    assert int(r["first_cross_t"]) == n_up
    assert int(r["decision"]) == 1  # first crossing was upward
    # final LLR really did double-cross (below -bound at the end)
    assert int(r["llr_final_u"]) <= -_BOUND
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "scripts"))
    from diffcheck import compare

    assert not compare(got, want)
