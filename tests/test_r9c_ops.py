"""Property gates for the round-9c drift/tail batch
(plans/queries_r9c.py): replay the Page-Hinkley recurrence and the POT
threshold from raw parquet rows in pure Python, assemble the
generalized-Pareto moment estimates from the emitted integer stats, and
pin the detector constants shared with the streaming operator.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
from mql5_economic_news_data_pipeline_2025_gcp__spark.streaming.stateful import (
    PH_DELTA_C,
    PH_LAMBDA_C,
    PH_N0,
)

SF = "/root/testdata/sf0.001"
_HALF = 1048576


def _series():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["x"] = (ev["value"].astype(float) * 100).round().astype("int64")
    out = defaultdict(list)
    for r in ev.sort_values(["ts", "event_id"]).itertuples():
        out[r.event_type].append(int(r.x))
    return out


def _ph_reference(xs):
    """Pure-python Page-Hinkley fold — the exact integer recurrence."""
    n0 = min(PH_N0, len(xs))
    s0 = sum(xs[:n0])
    m = runmin = ph_max = n_alarms = first_alarm = 0
    thresh = n0 * PH_LAMBDA_C
    for rn, x in enumerate(xs, start=1):
        if rn <= n0:
            continue
        m += n0 * x - s0 - n0 * PH_DELTA_C
        runmin = min(runmin, m)
        ph = m - min(0, runmin)
        ph_max = max(ph_max, ph)
        if ph > thresh:
            n_alarms += 1
            if first_alarm == 0:
                first_alarm = rn
    return len(xs), n_alarms, first_alarm, ph_max


def test_page_hinkley_matches_pure_python(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_page_hinkley"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = _series()
    assert set(got) == set(series)
    for et, xs in series.items():
        n, n_alarms, first_alarm, ph_max = _ph_reference(xs)
        row = got[et]
        assert int(row["n"]) == n, et
        assert int(row["n_alarms"]) == n_alarms, et
        assert int(row["first_alarm_rn"]) == first_alarm, et
        assert int(row["ph_max"]) == ph_max, et
        # structural invariants: ph_max >= 0; an alarm implies the peak
        # statistic crossed the threshold
        assert ph_max >= 0
        if n_alarms:
            assert ph_max > min(PH_N0, n) * PH_LAMBDA_C
            assert first_alarm > min(PH_N0, n)


def test_ph_detects_injected_shift():
    """The detector actually detects: a synthetic level shift after the
    baseline raises an alarm; the stationary prefix alone does not."""
    flat = [10000] * 300
    assert _ph_reference(flat)[1] == 0
    shifted = [10000] * 150 + [10000 + PH_DELTA_C + PH_LAMBDA_C] * 120
    n, n_alarms, first_alarm, _ = _ph_reference(shifted)
    assert n_alarms > 0 and first_alarm > 150


def test_peaks_over_threshold_stats_and_gpd(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["evt_peaks_over_threshold"]
        .spark_fn(spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = _series()
    for et, xs in series.items():
        vals = sorted(xs)
        n = len(vals)
        # exact nearest-rank P90 from the histogram: min v with
        # 10*cum >= 9*n  ==  the ceil(0.9n)-th order statistic
        k = -((-9 * n) // 10)
        u = vals[k - 1]
        exceed = [v - u for v in xs if v > u]
        row = got[et]
        assert int(row["n"]) == n
        assert int(row["u"]) == u
        assert int(row["n_exceed"]) == len(exceed)
        assert int(row["sum_e"]) == sum(exceed)
        qe = int(row["qe_hi"]) * _HALF + int(row["qe_lo"])
        assert qe == sum(e * e for e in exceed)
        # assemble GPD moment estimates and pin against the float path
        ne = len(exceed)
        if ne >= 2:
            m1 = sum(exceed) / ne
            s2 = (qe / ne) - m1 * m1
            xi = 0.5 * (1 - m1 * m1 / s2)
            beta = 0.5 * m1 * (1 + m1 * m1 / s2)
            mean = sum(exceed) / ne
            var = sum((e - mean) ** 2 for e in exceed) / ne
            assert abs(s2 - var) < 1e-6 * max(1.0, var)
            # uniform-ish tails are short: xi < 0.5 always holds here
            assert xi < 0.5 and beta > 0


def test_ph_constants_single_source():
    """The batch module must read the SAME constants the streaming
    operator folds with (import-level sharing, no literal drift)."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import (
        queries_r9c,
    )

    assert queries_r9c.PH_N0 == PH_N0 == 100
    assert queries_r9c.PH_DELTA_C == PH_DELTA_C == 100
    assert queries_r9c.PH_LAMBDA_C == PH_LAMBDA_C == 50000
    for q in ("evt_page_hinkley", "stream_page_hinkley"):
        assert str(PH_LAMBDA_C) in REGISTRY[q].oracle
