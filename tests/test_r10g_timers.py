"""Gate for event-time TIMER semantics on the transformWithState API
(streaming/stateful.py::session_close_tws).

Construction: two controlled micro-batches (file mtimes order the file
source's pickup; 8 main part files = batch 1, a newer flush file =
batch 2). Batch 1 carries every real user's events; batch 2 is one
far-future event from a dedicated flush user, which advances the
watermark past every armed timer, so all real sessions close via
``handleExpiredTimer`` (or inline, for intra-batch gaps). The flush
user's own session stays open and must NOT be emitted — that's the
withheld-open-window contract.

Expected output = batch sessionization (gap rule) of the real users'
events, which the test replays in pandas.
"""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.compat import (
    ensure_protobuf,
)

GAP_S = 600
_FLUSH_USER = 999_999


@pytest.fixture(scope="module")
def timer_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("sc_tws")
    d = base / "events.parquet"
    d.mkdir()
    t0 = datetime.datetime(2025, 3, 1, 9, 0, 0)

    def ev(eid, uid, off_s):
        return (
            eid,
            t0 + datetime.timedelta(seconds=off_s),
            uid,
            "view",
            1.0,
            "{}",
        )

    rows = []
    eid = 0
    # user 1: two sessions split by an intra-batch gap (inline close)
    for off in (0, 60, 120, 2000, 2100):
        eid += 1
        rows.append(ev(eid, 1, off))
    # user 2: one session, closes only via the timer
    for off in (30, 300, 500):
        eid += 1
        rows.append(ev(eid, 2, off))
    # user 3: single event session
    eid += 1
    rows.append(ev(eid, 3, 400))
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    main = pd.DataFrame(rows, columns=cols)
    main["ts"] = pd.to_datetime(main["ts"])
    # batch 1: 8 part files (= maxFilesPerTrigger), older mtimes
    for i in range(8):
        p = d / f"part-a{i}.parquet"
        main.iloc[i::8].to_parquet(p, index=False)
        os.utime(p, (1_000_000, 1_000_000))
    # batch 2: the watermark flush (one far-future event), newer mtime
    flush = pd.DataFrame(
        [ev(10_000, _FLUSH_USER, 10_000_000)], columns=cols
    )
    flush["ts"] = pd.to_datetime(flush["ts"])
    fp = d / "part-b-flush.parquet"
    flush.to_parquet(fp, index=False)
    os.utime(fp, (2_000_000, 2_000_000))
    return str(base), main


def _sessionize(main: pd.DataFrame) -> set[tuple[int, int, int, int]]:
    out = set()
    for uid, g in main.groupby("user_id"):
        ts = sorted(int(t.value) // 1000 for t in g["ts"])  # us
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > GAP_S * 1_000_000:
                out.add((int(uid), start, last, n))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        out.add((int(uid), start, last, n))
    return out


def test_timer_closes_sessions_on_watermark(spark, timer_dir):
    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime on this image")
    from mql5_economic_news_data_pipeline_2025_gcp__spark.streaming.stateful import (
        session_close_tws,
    )

    events_dir, main = timer_dir
    got = {
        (int(r["user_id"]), int(r["start_us"]), int(r["end_us"]),
         int(r["n"]))
        for r in session_close_tws(spark, events_dir, GAP_S).collect()
    }
    want = _sessionize(main)
    # every real user's session closed (timer or inline), none invented
    assert got == want
    # the flush user's open session was withheld
    assert not any(u == _FLUSH_USER for u, *_ in got)
    # and the timer path was actually exercised: user 2/3's sessions
    # end before batch 1's max ts, so no inline row could close them
    assert any(u == 2 for u, *_ in got) and any(u == 3 for u, *_ in got)
