"""Property gates for the round-9n streaming-CMS batch
(plans/queries_r9n.py): hashlib replays every salted cell assignment,
the drained grid must equal the from-scratch Python grid exactly, each
grid row must sum to N (mass conservation), and point estimates must
never undercount (the CMS one-sided guarantee).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
_SALTS = ("cmsg0:", "cmsg1:", "cmsg2:", "cmsg3:")
_W = 64


def _cell(salt: str, key: str) -> int:
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:8], 16) % _W


def test_stream_cms_grid_matches_replay_and_bounds(spark):
    rows = (
        REGISTRY["stream_cms_portable_grid"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    got = {(int(r["grid_row"]), int(r["j"])): int(r["c"]) for r in rows}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    keys = ev["user_id"].astype("int64").astype(str)
    want = Counter()
    for k in keys:
        for i, s in enumerate(_SALTS):
            want[(i, _cell(s, k))] += 1
    assert got == dict(want)
    # mass conservation: every grid row holds all N observations
    n = len(keys)
    for i in range(len(_SALTS)):
        assert sum(c for (r, _), c in got.items() if r == i) == n
    # one-sided error: min-over-rows estimate >= exact count, always
    exact = Counter(keys)
    for k, true_n in exact.items():
        est = min(
            got[(i, _cell(s, k))] for i, s in enumerate(_SALTS)
        )
        assert est >= true_n, k
