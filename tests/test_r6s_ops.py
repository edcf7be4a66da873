"""Property gate for the BH-FDR permutation operator."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
    keyed_events,
)

SF = "/root/testdata/sf0.001"
TYPES = ["click", "error", "purchase", "signup", "view"]


def test_fdr_bh_matches_bruteforce(spark):
    df = (
        REGISTRY["evt_fdr_bh"].spark_fn(spark, SF).toPandas()
        .set_index("event_type")
    )
    rows = (
        keyed_events(spark, SF)
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value_c")
        .toPandas()
    )
    n = len(rows)
    s = int(rows["value_c"].sum())
    # observed stats
    t_obs, n_g, s_g = {}, {}, {}
    for et in TYPES:
        g = rows[rows["event_type"] == et]
        n_g[et], s_g[et] = len(g), int(g["value_c"].sum())
        t_obs[et] = abs(n * s_g[et] - n_g[et] * s)
    # 50 pseudo-labelings from md5 windows
    digests = [
        hashlib.md5(str(int(e)).encode()).hexdigest()
        for e in rows["event_id"]
    ]
    vc = rows["value_c"].astype(int).tolist()
    null_stats = []  # list of (n_grp, s_grp) per labeling per group r
    for w in range(10):
        vals = [int(d[3 * w : 3 * w + 3], 16) % 5 for d in digests]
        for r in range(5):
            cnt = sum(1 for v in vals if v == r)
            tot = sum(x for v, x in zip(vals, vc) if v == r)
            null_stats.append(abs(n * tot - cnt * s))
    assert len(null_stats) == 50
    ge = {
        et: sum(1 for t in null_stats if t >= t_obs[et]) for et in TYPES
    }
    for et in TYPES:
        assert int(df.loc[et, "n_g"]) == n_g[et]
        assert int(df.loc[et, "s_g"]) == s_g[et]
        assert int(df.loc[et, "ge_count"]) == ge[et], et
        assert int(df.loc[et, "p_bp"]) == (1 + ge[et]) * 10000 // 51
    # BH step-up with exact integers
    order = sorted(TYPES, key=lambda e: (ge[e], e))
    k = 0
    for i, et in enumerate(order, start=1):
        if 20 * (1 + ge[et]) <= 51 * i:
            k = i
    want_rejected = set(order[:k])
    got_rejected = {et for et in TYPES if int(df.loc[et, "rejected"]) == 1}
    assert got_rejected == want_rejected
    # ranks are the sort order
    for i, et in enumerate(order, start=1):
        assert int(df.loc[et, "p_rank"]) == i
