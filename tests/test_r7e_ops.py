"""Property gates for round-7e: brute-force session-window merging
(range-overlap semantics) and the scalar-quantization error profile in
plain Python against the registered queries at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
GAP_US = 1_800_000_000


def _round_half_away(q: float) -> int:
    return int(math.floor(q + 0.5)) if q >= 0 else int(math.ceil(q - 0.5))


def test_session_windows_match_bruteforce(spark):
    got = sorted(
        (int(r["user_id"]), r["session_start"], r["session_end"],
         int(r["n"]), int(r["value_c_sum"]))
        for r in REGISTRY["stream_session_values"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    )
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), ts, "
        f"CAST(round(value*100) AS BIGINT) FROM '{SF}/events.parquet'"
    ).fetchall()
    per_user = defaultdict(list)
    for uid, us, ts, vc in rows:
        per_user[int(uid)].append((us, ts, vc))
    exp = []
    for uid, evs in per_user.items():
        evs.sort()
        cur = None
        for us, ts, vc in evs:
            # Spark merges iff [us, us+gap) overlaps the session range:
            # an event at exactly session_end starts a NEW session
            if cur is None or us >= cur["end_us"]:
                if cur is not None:
                    exp.append(cur)
                cur = {"uid": uid, "start": ts, "end_us": us + GAP_US,
                       "n": 0, "sum": 0}
            cur["end_us"] = us + GAP_US
            cur["n"] += 1
            cur["sum"] += vc
            cur["last_ts"] = ts
        if cur is not None:
            exp.append(cur)
    import datetime as dt

    exp_rows = sorted(
        (s["uid"], s["start"],
         s["last_ts"] + dt.timedelta(minutes=30), s["n"], s["sum"])
        for s in exp
    )
    assert len(got) == len(exp_rows)
    for g, e in zip(got, exp_rows):
        assert g == e, (g, e)


def test_session_windows_cover_all_events(spark):
    df = REGISTRY["stream_session_values"].spark_fn(spark, SF).toPandas()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df["n"].sum()) == n_events
    # session invariant: end - start >= gap (a single event spans gap)
    assert (
        (df["session_end"] - df["session_start"]).dt.total_seconds() >= 1800
    ).all()


def test_sq_error_profile_matches_bruteforce(spark):
    got = {
        int(r["dim"]): r
        for r in REGISTRY["emb_sq_error_profile"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    rows = duckdb.sql(
        f"SELECT embedding::DOUBLE[] FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    dims = defaultdict(list)
    for (e,) in rows:
        for i, x in enumerate(e):
            dims[i + 1].append(_round_half_away(x * 1000.0))
    for d, xs in dims.items():
        mn, mx = min(xs), max(xs)
        scale = (mx - mn) / 255.0
        codes, max_err = set(), 0.0
        for x in xs:
            c = _round_half_away((x - mn) / scale) if mx > mn else 0
            codes.add(c)
            max_err = max(max_err, abs((mn + c * scale) - x))
        row = got[d]
        assert int(row["min_x"]) == mn and int(row["max_x"]) == mx, d
        assert int(row["n_codes"]) == len(codes), d
        assert abs(float(row["max_abs_err"]) - max_err) < 1e-9, d
        # SQ8 guarantee: reconstruction error is bounded by half a step
        if mx > mn:
            assert float(row["max_abs_err"]) <= scale / 2 + 1e-9, d
