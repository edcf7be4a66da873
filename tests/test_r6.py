"""Round-6 semantic gates — properties the hash-equality oracle can't
express: estimator accuracy, the CUSUM prefix-min identity against a
literal recursion, and indicator sanity invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

from conftest import SF_DIR  # noqa: E402


def test_hll_portable_estimate_accuracy(spark):
    """The portable HLL is a real estimator, not just hash-stable: the
    emitted fields suffice to finish the standard estimator — raw
    harmonic estimate, plus the small-range linear-counting correction
    m·ln(m/V) when E < 2.5m and V > 0 (ln lives HERE, consumer-side;
    the query emits only engine-portable integers + one division).
    Corrected estimate within 20% of exact (m=256 → rsd ≈ 6.5%)."""
    import math

    m = 256
    rows = (
        REGISTRY["evt_hll_portable_rollup"]
        .spark_fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    for r in rows:
        est, v = r["hll_estimate"], r["zero_registers"]
        if est < 2.5 * m and v > 0:
            est = m * math.log(m / v)
        err = abs(est - r["exact_distinct"]) / max(r["exact_distinct"], 1)
        assert err < 0.20, (r["event_type"], est, r["exact_distinct"])


def test_cusum_prefix_min_identity(spark):
    """The window form equals the literal recursion
    s_t = max(0, s_{t-1} + d_t) replayed in Python on a real series."""
    ev = (
        REGISTRY["evt_cusum_check"].spark_fn(spark, SF_DIR)
        .orderBy("user_id", "event_type")
        .limit(1)
        .collect()[0]
    )
    uid, etype = ev["user_id"], ev["event_type"]
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.common import (
        keyed_events,
    )

    rows = (
        keyed_events(spark, SF_DIR)
        .filter(
            (F.col("user_id") == uid)
            & (F.col("event_type") == etype)
            & F.col("value").isNotNull()
        )
        .orderBy("ts", "event_id")
        .select("value_c")
        .collect()
    )
    vals = [r["value_c"] for r in rows]
    n, sv, k = len(vals), sum(vals), 100
    s_hi = s_lo = 0
    max_hi = max_lo = 0
    first_alarm = None
    for i, v in enumerate(vals, start=1):
        s_hi = max(0, s_hi + (n * v - sv - n * k))
        s_lo = max(0, s_lo + (sv - n * v - n * k))
        max_hi, max_lo = max(max_hi, s_hi), max(max_lo, s_lo)
        if first_alarm is None and (s_hi >= n * 1000 or s_lo >= n * 1000):
            first_alarm = i
    assert round(max_hi / n / 100, 6) == ev["cusum_hi_max"]
    assert round(max_lo / n / 100, 6) == ev["cusum_lo_max"]
    assert first_alarm == ev["first_alarm_rn"]


def test_mmr_check_first_pick_is_top_relevance(spark):
    """MMR rank 1 must be the pure-relevance argmax (max_sim is empty)."""
    out = {
        r["rnk"]: r
        for r in REGISTRY["emb_mmr_check"].spark_fn(spark, SF_DIR).collect()
    }
    assert set(out) == {1, 2, 3}
    assert len({r["neighbor_id"] for r in out.values()}) == 3
    # rank-1 score is 7·rel with no diversity penalty → the largest
    assert out[1]["mmr_score"] >= out[2]["mmr_score"]


def test_markov_absorption_converges_to_solve(spark):
    """60 integer value iterations land within 1e-3 of the numpy
    linear-system absorption probability the attribution op solves."""
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.queries_r4b import (  # noqa: E501
        _markov_transition_counts,
        _removal_effects,
    )

    rows = (
        REGISTRY["evt_markov_absorption_check"]
        .spark_fn(spark, SF_DIR)
        .collect()
    )
    it = {r["state"]: r["absorb_micro"] / 1e6 for r in rows}
    counts = _markov_transition_counts(spark, SF_DIR).collect()
    effects = _removal_effects([(r["src"], r["dst"], r["n"]) for r in counts])
    p_base = effects[0][1]  # (channel, p_base, removal_effect)
    assert abs(it["START"] - p_base) < 1e-3, (it["START"], p_base)


def test_drawdown_invariants(spark):
    rows = REGISTRY["evt_drawdown"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["max_drawdown_c"] >= 0
        assert r["peak_c"] >= 0 or r["max_drawdown_c"] >= -r["peak_c"]


def test_bollinger_band_ordering(spark):
    df = REGISTRY["evt_bollinger_bands"].spark_fn(spark, SF_DIR)
    bad = df.filter(
        (F.col("upper_c") < F.col("mean_c"))
        | (F.col("mean_c") < F.col("lower_c"))
        | (F.col("sd_c") < 0)
    ).count()
    assert bad == 0
