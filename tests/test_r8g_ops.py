"""Property gate for evt_qini_uplift (plans/queries_r8g.py): replay
the ranking, assignment, and cumulative Qini from raw rows, plus the
identity q(last decile) = Yt − Yc·Nt/Nc over the whole population.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_qini_matches_pure_python(spark):
    got = (
        REGISTRY["evt_qini_uplift"]
        .spark_fn(spark, SF)
        .toPandas()
        .sort_values("decile")
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    users = {}
    for r in ev.itertuples():
        uid = int(r.user_id)
        s, y = users.get(uid, (0, 0))
        users[uid] = (
            s + (1 if r.event_type == "view" else 0),
            max(y, 1 if r.event_type == "purchase" else 0),
        )
    rows = sorted(users.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n = len(rows)
    cum = {}
    nt = nc = yt = yc = 0
    for i, (uid, (s, y)) in enumerate(rows):
        treated = (
            int(hashlib.md5(f"{uid}:qini".encode()).hexdigest()[:4], 16) % 2
        )
        if treated:
            nt += 1
            yt += y
        else:
            nc += 1
            yc += y
        cum[i * 10 // n] = (nt, nc, yt, yc)
    for _, r in got.iterrows():
        d = int(r["decile"])
        ent, enc, eyt, eyc = cum[d]
        assert (
            int(r["cum_nt"]),
            int(r["cum_nc"]),
            int(r["cum_yt"]),
            int(r["cum_yc"]),
        ) == (ent, enc, eyt, eyc)
        assert float(r["qini"]) == round(eyt - eyc * ent / enc, 6)
    last = got.iloc[-1]
    assert int(last["cum_nt"]) + int(last["cum_nc"]) == n
