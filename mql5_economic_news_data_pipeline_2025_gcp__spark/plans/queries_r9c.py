"""Round-9 batch c: drift detection and tail-risk statistics.

``evt_page_hinkley`` — the Page-Hinkley mean-shift detector replayed
over each event_type's chronological value series (the classic online
drift test a feature pipeline runs before trusting a training window).
``stream_page_hinkley`` — the SAME detector as an online
applyInPandasWithState operator (streaming/stateful.py); a full drain
must equal the batch replay, so both share one oracle.
``evt_peaks_over_threshold`` — extreme-value POT sufficient statistics
(exceedances over the exact per-type P90) feeding generalized-Pareto
moment estimates in the pytest gate — the tail-index readout beyond
`evt_var_cvar`'s quantile + tail mean.

Determinism: the PH statistic is kept n₀-scaled so every value is an
exact integer (m += n₀·x − S₀ − n₀·δ; alarms compare against n₀·λ);
windowed integer SUM/MIN are exact in both engines at any frame size
(the ~64-row segment-tree caveat applies to doubles only). POT squared
excesses ride the 2²⁰ hi/lo BIGINT halves.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

# single source of truth for the detector constants — the streaming
# operator imports nothing from plans (no cycle); both read these
from ..streaming.stateful import PH_DELTA_C, PH_LAMBDA_C, PH_N0

_HALF = 1048576

_PH_ORACLE = f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL),
    base AS (
      SELECT event_type,
             CAST(sum(CASE WHEN rn <= {PH_N0} THEN x ELSE 0 END)
                  AS BIGINT) AS s0,
             CAST(sum(CASE WHEN rn <= {PH_N0} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n0
      FROM s GROUP BY event_type),
    m AS (
      SELECT s.event_type, s.rn, b.n0,
             sum(CASE WHEN s.rn > b.n0
                      THEN b.n0 * s.x - b.s0 - b.n0 * {PH_DELTA_C}
                      ELSE 0 END)
               OVER (PARTITION BY s.event_type ORDER BY s.rn
                     ROWS UNBOUNDED PRECEDING) AS m
      FROM s JOIN base b USING (event_type)),
    ph AS (
      SELECT event_type, rn, n0,
             m - least(0, min(m) OVER (PARTITION BY event_type ORDER BY rn
                                       ROWS UNBOUNDED PRECEDING)) AS ph
      FROM m)
    SELECT event_type,
           CAST(max(rn) AS BIGINT) AS n,
           CAST(sum(CASE WHEN rn > n0 AND ph > n0 * {PH_LAMBDA_C}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
           CAST(coalesce(min(CASE WHEN rn > n0 AND ph > n0 * {PH_LAMBDA_C}
                                  THEN rn END), 0) AS BIGINT)
             AS first_alarm_rn,
           CAST(max(ph) AS BIGINT) AS ph_max
    FROM ph GROUP BY event_type
"""

_PH_DESC = (
    "Page-Hinkley mean-shift detection per event_type value series: "
    f"the first {PH_N0} chronological values set the baseline S₀, then "
    "the n₀-scaled integer statistic m accumulates n₀·x − S₀ − n₀·δ "
    "and ph = m − min(0, running-min m) crossing n₀·λ raises the "
    "alarm (δ and λ are shared literal cents — "
    f"{PH_DELTA_C}/{PH_LAMBDA_C}). Emits n, alarm count, first alarm "
    "position and the peak statistic — the drift report that decides "
    "whether a training window is trustworthy. Baseline rows carry "
    "ph = 0 so types shorter than n₀ read all-zero rather than "
    "vanishing."
)


@register(
    "evt_page_hinkley",
    oracle=_PH_ORACLE,
    description=_PH_DESC
    + " Shape: ONE event_type shuffle feeds the rank window, the "
    "baseline conditional agg, the cumulative-sum and running-min "
    "windows, and the final fold — every stage is keyed on the same "
    "column, so the exchange is reused end to end (budget-pinned).",
    tags=("events", "statistics", "drift", "timeseries"),
)
def evt_page_hinkley(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    w_rn = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.col("value_c").alias("x"),
        F.row_number().over(w_rn).alias("rn"),
    )
    # window-lift the baseline instead of agg + join-back: S0/n0 are
    # conditional sums over the SAME event_type partition the rank
    # window already shuffled on, so the fact lineage is derived once
    # (agg+broadcast-join form measured 2 scans / 2 exchanges; this is
    # 1 scan / 1 reused exchange)
    wp = Window.partitionBy("event_type")
    s = s.select(
        "event_type",
        "x",
        "rn",
        F.sum(F.when(F.col("rn") <= PH_N0, F.col("x")).otherwise(0))
        .over(wp)
        .cast("bigint")
        .alias("s0"),
        F.sum(F.when(F.col("rn") <= PH_N0, 1).otherwise(0))
        .over(wp)
        .cast("bigint")
        .alias("n0"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    term = F.when(
        F.col("rn") > F.col("n0"),
        F.col("n0") * F.col("x") - F.col("s0") - F.col("n0") * PH_DELTA_C,
    ).otherwise(F.lit(0))
    m = s.withColumn("m", F.sum(term).over(w_cum))
    ph = m.select(
        "event_type",
        "rn",
        "n0",
        (
            F.col("m")
            - F.least(F.lit(0).cast("bigint"), F.min("m").over(w_cum))
        ).alias("ph"),
    )
    alarm = (F.col("rn") > F.col("n0")) & (
        F.col("ph") > F.col("n0") * PH_LAMBDA_C
    )
    return ph.groupBy("event_type").agg(
        F.max("rn").cast("bigint").alias("n"),
        F.sum(F.when(alarm, 1).otherwise(0)).cast("bigint").alias("n_alarms"),
        F.coalesce(F.min(F.when(alarm, F.col("rn"))), F.lit(0))
        .cast("bigint")
        .alias("first_alarm_rn"),
        F.max("ph").cast("bigint").alias("ph_max"),
    )


@register(
    "stream_page_hinkley",
    oracle=_PH_ORACLE,
    description=_PH_DESC
    + " ONLINE form: applyInPandasWithState with seven scalars of "
    "state per event_type (store bounded by |types|); in-batch "
    "arrivals replay in (ts, event_id) order and cross-batch order "
    "rides the landing-prefix contract, so a full chronological drain "
    "equals the batch window replay — the shared oracle checks "
    "exactly that.",
    tags=("streaming", "stateful", "drift", "pandas-udf"),
)
def stream_page_hinkley_q(spark, sf_dir):
    from ..streaming.stateful import stream_page_hinkley as run

    raw = run(spark, sf_dir)
    # update-mode sink: one row per key per micro-batch; final = max n
    latest = raw.groupBy("event_type").agg(
        F.max(
            F.struct("n", "n_alarms", "first_alarm_rn", "ph_max")
        ).alias("s")
    )
    return latest.select(
        "event_type",
        F.col("s.n").alias("n"),
        F.col("s.n_alarms").alias("n_alarms"),
        F.col("s.first_alarm_rn").alias("first_alarm_rn"),
        F.col("s.ph_max").alias("ph_max"),
    )


@register(
    "evt_peaks_over_threshold",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    hist AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY event_type, v),
    cum AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM hist),
    thr AS (
      SELECT event_type,
             CAST(min(CASE WHEN 10 * cc >= 9 * n THEN v END) AS BIGINT)
               AS u
      FROM cum GROUP BY event_type)
    SELECT s.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(t.u) AS BIGINT) AS u,
           CAST(sum(CASE WHEN s.v > t.u THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exceed,
           CAST(sum(CASE WHEN s.v > t.u THEN s.v - t.u ELSE 0 END)
                AS BIGINT) AS sum_e,
           CAST(sum(CASE WHEN s.v > t.u
                         THEN ((s.v - t.u) * (s.v - t.u)) // {_HALF}
                         ELSE 0 END) AS BIGINT) AS qe_hi,
           CAST(sum(CASE WHEN s.v > t.u
                         THEN ((s.v - t.u) * (s.v - t.u)) % {_HALF}
                         ELSE 0 END) AS BIGINT) AS qe_lo
    FROM s JOIN thr t USING (event_type)
    GROUP BY s.event_type
    """,
    description=(
        "peaks-over-threshold tail statistics PER EVENT TYPE — the "
        "per-group, integer-render-safe form of the global "
        "`evt_pot_gpd_tail` (which emits float moments for one pooled "
        "tail; this one gives each type its own threshold and keeps "
        "the whole differential surface in BIGINT): the "
        "threshold is the exact nearest-rank P90 from the value "
        "HISTOGRAM (cross-multiplied 10·cum ≥ 9·n — no float "
        "quantile), exceedances emit exact integer n/Σe/Σe² with the "
        "squared sum as BIGINT hi/lo halves. The pytest gate assembles "
        "the generalized-Pareto moment estimates ξ = ½(1 − m²/s²) and "
        "β = ½m(1 + m²/s²) — the tail-index readout `evt_var_cvar`'s "
        "quantile + tail mean can't give — and pins them against "
        "numpy. Shape: one histogram agg + histogram-sized windows, "
        "broadcast the 5-row threshold table back, one agg (the "
        "evt_levene_median lineage shape)"
    ),
    tags=("events", "statistics", "risk"),
)
def evt_peaks_over_threshold(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    s = ev.select("event_type", F.col("value_c").alias("v"))
    hist = s.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "v",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(wn).alias("n"),
    )
    thr = cum.groupBy("event_type").agg(
        F.min(F.when(10 * F.col("cc") >= 9 * F.col("n"), F.col("v")))
        .cast("bigint")
        .alias("u")
    )
    j = s.join(F.broadcast(thr), "event_type")
    e = F.when(F.col("v") > F.col("u"), F.col("v") - F.col("u"))
    j = j.select(
        "event_type", "u", e.alias("e")
    ).withColumn("e2", (F.col("e") * F.col("e")).cast("bigint"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("u").cast("bigint").alias("u"),
        F.count("e").cast("bigint").alias("n_exceed"),
        F.coalesce(F.sum("e"), F.lit(0)).cast("bigint").alias("sum_e"),
        F.coalesce(F.sum(F.expr(f"e2 DIV {_HALF}")), F.lit(0))
        .cast("bigint")
        .alias("qe_hi"),
        F.coalesce(F.sum(F.col("e2") % _HALF), F.lit(0))
        .cast("bigint")
        .alias("qe_lo"),
    )
