"""Property gates for the round-8c token-bucket operators
(plans/queries_r8c.py): a pure-Python bucket replay from raw rows, plus
the policy-monotonicity invariant (a larger cap never denies more).
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
EPOCH = 1704067200
CAP, RATE, COST = 3000, 17, 1000


def _replay(cap=CAP):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    seqs = defaultdict(list)
    for r in ev.itertuples():
        e = int(r.ts.timestamp()) - EPOCH
        if e >= 0:
            seqs[int(r.user_id)].append((e, int(r.event_id)))
    out = {}
    for u, rows in seqs.items():
        rows.sort()
        tok, prev, allowed = cap, None, 0
        for e, _ in rows:
            dt = 0 if prev is None else e - prev
            tok = min(cap, tok + dt * RATE)
            if tok >= COST:
                tok -= COST
                allowed += 1
            prev = e
        out[u] = (len(rows), allowed, len(rows) - allowed, tok)
    return out


def test_rate_limit_audit_matches_pure_python(spark):
    got = REGISTRY["evt_rate_limit_audit"].spark_fn(spark, SF).toPandas()
    ref = _replay()
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        n, a, d, tok = ref[int(r["user_id"])]
        assert (
            int(r["n_events"]),
            int(r["allowed"]),
            int(r["denied"]),
            int(r["final_tok_m"]),
        ) == (n, a, d, tok)


def test_rate_limit_sweep_matches_and_is_monotone(spark):
    got = (
        REGISTRY["evt_rate_limit_policy_sweep"]
        .spark_fn(spark, SF)
        .toPandas()
        .set_index("cap_millitok")
        .sort_index()
    )
    allowed_by_cap = {}
    for cap in (1000, 3000, 10000):
        ref = _replay(cap)
        ta = sum(a for _, a, _, _ in ref.values())
        td = sum(d for _, _, d, _ in ref.values())
        ut = sum(1 for _, _, d, _ in ref.values() if d > 0)
        row = got.loc[cap]
        assert (
            int(row["total_allowed"]),
            int(row["total_denied"]),
            int(row["users_throttled"]),
            int(row["n_users"]),
        ) == (ta, td, ut, len(ref))
        allowed_by_cap[cap] = ta
    # a larger bucket can only allow more
    assert allowed_by_cap[1000] <= allowed_by_cap[3000] <= allowed_by_cap[10000]


def test_stream_rate_limited_drain_equals_batch_audit(spark):
    """A full chronological drain of the streaming bucket must equal the
    batch replay row for row."""
    batch = (
        REGISTRY["evt_rate_limit_audit"]
        .spark_fn(spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    stream = (
        REGISTRY["stream_rate_limited"]
        .spark_fn(spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(batch.index) == list(stream.index)
    for col in ("n_events", "allowed", "denied", "final_tok_m"):
        assert (batch[col].astype("int64") == stream[col].astype("int64")).all()
