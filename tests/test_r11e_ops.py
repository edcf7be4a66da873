"""Gate for the round-11e batch: the timers TWS leg as a registry
query (plans/queries_r11e.py::stream_session_close_tws) — the drain's
closed-session set must equal the batch formula the oracle encodes:
non-final sessions ∪ final sessions with end + gap ≤ max(ts).
"""

from __future__ import annotations

import pandas as pd
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.compat import (
    ensure_protobuf,
)
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r11e import (
    _GAP_S,
)

SF = "/root/testdata/sf0.001"


def test_closed_set_equals_batch_formula(spark):
    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime on this image")
    got = {
        (int(r["user_id"]), int(r["start_us"]), int(r["end_us"]), int(r["n"]))
        for r in REGISTRY["stream_session_close_tws"]
        .spark_fn(spark, SF)
        .collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    gap_us = _GAP_S * 1_000_000
    sess = []
    for uid, g in ev.groupby("user_id"):
        ts = sorted(int(t.value) // 1000 for t in g["ts"])
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > gap_us:
                sess.append((int(uid), start, last, n, False))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        sess.append((int(uid), start, last, n, True))
    wm_us = max(int(t.value) // 1000 for t in ev["ts"])
    want = {
        (u, s, e, n)
        for u, s, e, n, is_last in sess
        if not is_last or e + gap_us <= wm_us
    }
    assert got == want
    # the withheld-open contract is actually exercised: at least one
    # final session stays open (its timer is past the final watermark)
    n_open = len(sess) - len(want)
    assert n_open >= 1


def _expected_closed(ev: pd.DataFrame) -> set[tuple]:
    gap_us = _GAP_S * 1_000_000
    sess = []
    for uid, g in ev.groupby("user_id"):
        ts = sorted(int(t.value) // 1000 for t in g["ts"])
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > gap_us:
                sess.append((int(uid), start, last, n, False))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        sess.append((int(uid), start, last, n, True))
    wm_us = max(int(t.value) // 1000 for t in ev["ts"])
    return {
        (u, s, e, n)
        for u, s, e, n, is_last in sess
        if not is_last or e + gap_us <= wm_us
    }


def test_session_close_tws_two_file_table(spark, tmp_path):
    """The oracle's ordering precondition must hold for a MULTI-FILE
    events table, not just the single-file sf layout: the source is
    opened single_batch (maxFilesPerTrigger = file count), so even an
    adversarial split — the first-listed part holding the LATER half of
    every user's events — arrives as one micro-batch, gets sorted
    inside the processor, and reproduces the batch formula exactly."""
    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime on this image")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    table_dir = tmp_path / "events.parquet"
    table_dir.mkdir()
    cut = ev["ts"].median()
    late, early = ev[ev["ts"] > cut], ev[ev["ts"] <= cut]
    assert len(late) and len(early)
    # name the LATE half first (lexicographic + mtime order both pick
    # it up first) — out of event-time order on purpose
    late.to_parquet(table_dir / "part-0.parquet", index=False)
    early.to_parquet(table_dir / "part-1.parquet", index=False)
    got = {
        (int(r["user_id"]), int(r["start_us"]), int(r["end_us"]), int(r["n"]))
        for r in REGISTRY["stream_session_close_tws"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert got == _expected_closed(ev)
