"""Property gates for the round-11c/11d batches (privacy operators and
bucketed SMOTE): pigeonhole identities, Mondrian partition laws, and a
pandas replay of the adjacent-rank nearest-neighbor synthesis.
"""

from __future__ import annotations

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_l_diversity_pigeonhole_and_recursive_cl(spark):
    rows = (
        REGISTRY["evt_l_diversity"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    total = 0
    for r in rows:
        k, l, mx = int(r["k"]), int(r["l_distinct"]), int(r["max_sensitive_n"])
        total += k
        assert 1 <= l <= k
        assert 1 <= mx <= k
        # pigeonhole: l groups can't hold k rows unless the modal one
        # has at least ceil(k/l)
        assert mx * l >= k
        # recursive (c, l) assembles: c=1 means modal <= sum of the rest
        c1_ok = mx <= k - mx or l == 1
        assert isinstance(c1_ok, bool)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert total == len(ev)


def test_mondrian_cuts_partition_laws(spark):
    rows = (
        REGISTRY["evt_mondrian_cuts"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert sum(int(r["k"]) for r in rows) == len(ev)
    assert 1 <= len(rows) <= 4
    by = {(int(r["half"]), int(r["leaf"])): r for r in rows}
    # boxes are disjoint along the cut dims: halves split user ranges,
    # leaves split hour ranges within a half
    if (0, 0) in by and (1, 0) in by:
        assert int(by[(0, 0)]["u_hi"]) < int(by[(1, 0)]["u_lo"])
    for half in (0, 1):
        if (half, 0) in by and (half, 1) in by:
            assert int(by[(half, 0)]["h_hi"]) < int(by[(half, 1)]["h_lo"])
    for r in rows:
        assert int(r["u_lo"]) <= int(r["u_hi"])
        assert int(r["h_lo"]) <= int(r["h_hi"])
        assert int(r["k"]) >= 1
    # the level-1 cut is the lower median: both halves non-trivial
    left_k = sum(int(r["k"]) for r in rows if int(r["half"]) == 0)
    assert 0 < left_k < len(ev)


def test_smote_matches_pandas_replay(spark):
    rows = (
        REGISTRY["evt_smote_bucketed"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    assert rows
    got = {int(r["event_id"]): r for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    m = ev[(ev["event_type"] == "error") & ev["value"].notna()].copy()
    m["v"] = (m["value"] * 100).round().astype("int64")
    m = m[m["v"] >= 0]
    m["hour"] = m["ts"].dt.hour
    want = {}
    for (_, _), g in m.groupby(["user_id", "hour"]):
        g = g.sort_values(["v", "event_id"]).reset_index(drop=True)
        if len(g) < 2:
            continue
        for i in range(len(g)):
            v = int(g.loc[i, "v"])
            prev_ok = i > 0
            next_ok = i < len(g) - 1
            if prev_ok and (
                not next_ok
                or v - int(g.loc[i - 1, "v"])
                <= int(g.loc[i + 1, "v"]) - v
            ):
                nn = i - 1
            else:
                nn = i + 1
            nv = int(g.loc[nn, "v"])
            want[int(g.loc[i, "event_id"])] = (
                int(g.loc[nn, "event_id"]),
                (v + nv) // 2,
            )
    assert set(got) == set(want)
    for eid, (nn_id, mid) in want.items():
        r = got[eid]
        assert int(r["nn_event_id"]) == nn_id
        assert int(r["synth_value_c"]) == mid


def test_smote_synthetics_are_interpolations(spark):
    df = REGISTRY["evt_smote_bucketed"].spark_fn(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["v"] = (ev["value"] * 100).round().astype("int64")
    v_of = dict(zip(ev["event_id"].astype(int), ev["v"].astype(int)))
    for r in df.to_dict("records"):
        a = v_of[int(r["event_id"])]
        b = v_of[int(r["nn_event_id"])]
        lo, hi = min(a, b), max(a, b)
        assert lo <= int(r["synth_value_c"]) <= hi
