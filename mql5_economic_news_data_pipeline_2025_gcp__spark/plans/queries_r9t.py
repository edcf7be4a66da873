"""Round-9 batch t: risk backtesting and downside risk measures.

``evt_kupiec_var_backtest`` — the regulatory VaR BACKTEST: estimate the
10% one-day VaR of each type's daily value CHANGE on the first half of
the year (exact nearest-rank order statistic), then count violations on
the held-out second half.  `evt_var_cvar` estimates the quantile;
Kupiec's proportion-of-failures test asks whether the estimate
actually held up out of sample — the gate assembles the POF likelihood
ratio LR = −2·ln[(1−p)^{n−x} p^x / (1−x/n)^{n−x} (x/n)^x] ~ χ²(1).

``evt_downside_risk`` — the lower/upper partial-moment sufficient
statistics against a zero target over the same daily changes: LPM₁
(expected shortfall below target), LPM₂ (downside variance → Sortino),
UPM₁ (expected gain).  Mean-variance measures (`evt_moment_skew_
kurtosis`) punish upside and downside symmetrically; Omega = UPM₁/LPM₁
and Sortino = mean/√(LPM₂/n) are what an asymmetric-loss consumer
actually wants.

Determinism: daily changes are exact integer cent differences (can be
NEGATIVE — so there is no integer division or modulo anywhere near
them; quantile selection is comparison-only rank arithmetic, and the
LPM₂ square is taken on the NON-NEGATIVE loss magnitude, split at 2²⁰
before squaring).  Train/test split is 2·t ≤ n on the rank — the same
pinned integer arithmetic as evt_chow_test.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_P_NUM, _P_DEN = 1, 10  # VaR level p = 10%
_S20 = 1048576

_DIFF_SQL = """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, day,
             x - lag(x) OVER (PARTITION BY event_type ORDER BY day) AS dr
      FROM d),
    s AS (
      SELECT event_type, dr,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM r WHERE dr IS NOT NULL)
"""


@register(
    "evt_kupiec_var_backtest",
    oracle=_DIFF_SQL
    + f"""
    , train AS (
      SELECT event_type, dr,
             row_number() OVER (PARTITION BY event_type ORDER BY dr, t)
               AS rk,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM s WHERE 2 * t <= n),
    var_t AS (
      SELECT event_type,
             CAST(min(dr) AS BIGINT) AS var_c,
             CAST(max(m) AS BIGINT) AS n_train
      FROM train WHERE {_P_DEN} * rk >= {_P_NUM} * m
      GROUP BY event_type),
    test AS (
      SELECT event_type, dr FROM s WHERE 2 * t > n)
    SELECT t.event_type, v.n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           v.var_c,
           CAST(sum(CASE WHEN t.dr < v.var_c THEN 1 ELSE 0 END)
                AS BIGINT) AS x_viol
    FROM test t JOIN var_t v USING (event_type)
    GROUP BY t.event_type, v.n_train, v.var_c
    """,
    description=(
        f"Kupiec proportion-of-failures VaR backtest per event_type: "
        f"the {_P_NUM * 100 // _P_DEN}% one-day VaR of daily cent "
        "CHANGES is the exact nearest-rank order statistic of the "
        "first half (cross-multiplied 10·rk ≥ m, ties broken by the "
        "chronological index), violations counted on the held-out "
        "second half (strict <). Changes can be negative, so the "
        "whole lineage is comparison-only — no integer division "
        "anywhere near signed operands. The gate assembles the POF "
        "likelihood ratio and pins x ≤ n_test and LR ≥ 0. Shape: one "
        "(type, day) rollup, one type window stack (diff, rank, "
        "split), a rank window over the ≤183-row train frame, one "
        "broadcast join + fold"
    ),
    tags=("events", "risk", "statistics"),
)
def evt_kupiec_var_backtest(spark, sf_dir):
    # the diff frame feeds BOTH the train-quantile and the test-count
    # lineages — checkpoint so the fact rollup runs once (4 exchanges
    # measured → 2 tiny-frame exchanges, the r8h convention)
    s = _diff_frame(spark, sf_dir).localCheckpoint()
    train = s.filter(2 * F.col("t") <= F.col("n")).select(
        "event_type",
        "dr",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("dr", "t"))
        .alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    var_t = (
        train.filter(_P_DEN * F.col("rk") >= _P_NUM * F.col("m"))
        .groupBy("event_type")
        .agg(
            F.min("dr").cast("bigint").alias("var_c"),
            F.max("m").cast("bigint").alias("n_train"),
        )
    )
    test = s.filter(2 * F.col("t") > F.col("n")).select("event_type", "dr")
    return (
        test.join(F.broadcast(var_t), "event_type")
        .groupBy("event_type", "n_train", "var_c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("dr") < F.col("var_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("x_viol"),
        )
        .select("event_type", "n_train", "n_test", "var_c", "x_viol")
    )


@register(
    "evt_downside_risk",
    oracle=_DIFF_SQL
    + f"""
    , m AS (
      SELECT event_type, dr,
             CASE WHEN dr < 0 THEN -dr ELSE 0 END AS loss
      FROM s),
    sp AS (
      SELECT event_type, dr, loss,
             loss // {_S20} AS lh, loss % {_S20} AS ll
      FROM m)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dr) AS BIGINT) AS sum_dr,
           CAST(sum(loss) AS BIGINT) AS lpm1,
           CAST(sum(CASE WHEN dr > 0 THEN dr ELSE 0 END) AS BIGINT)
             AS upm1,
           CAST(sum(lh * lh) AS BIGINT) AS lpm2_2,
           CAST(sum(2 * lh * ll) AS BIGINT) AS lpm2_1,
           CAST(sum(ll * ll) AS BIGINT) AS lpm2_0
    FROM sp GROUP BY event_type
    """,
    description=(
        "lower/upper partial moments of daily cent changes against a "
        "zero target per event_type: LPM₁ = Σ losses, UPM₁ = Σ gains "
        "(exact integers), and LPM₂ as the 2²⁰-split three-component "
        "sums of the squared NON-NEGATIVE loss magnitude (the split "
        "is taken after the sign fold, so the signed-operand DIV "
        "hazard never arises). The gate assembles Omega = UPM₁/LPM₁ "
        "and Sortino = mean/√(LPM₂/n) and pins the identity "
        "UPM₁ − LPM₁ = Σdr exactly in Python bigints — the "
        "asymmetric-loss risk measures mean-variance can't express. "
        "Shape: one (type, day) rollup, one type lag window, one "
        "type fold riding the window exchange"
    ),
    tags=("events", "risk", "statistics"),
)
def evt_downside_risk(spark, sf_dir):
    s = _diff_frame(spark, sf_dir)
    m = s.select(
        "event_type",
        "dr",
        F.when(F.col("dr") < 0, -F.col("dr")).otherwise(0).alias("loss"),
    )
    sp = m.select(
        "event_type",
        "dr",
        "loss",
        F.expr(f"loss DIV {_S20}").alias("lh"),
        (F.col("loss") % _S20).alias("ll"),
    )
    return sp.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dr").cast("bigint").alias("sum_dr"),
        F.sum("loss").cast("bigint").alias("lpm1"),
        F.sum(F.when(F.col("dr") > 0, F.col("dr")).otherwise(0))
        .cast("bigint")
        .alias("upm1"),
        F.sum(F.col("lh") * F.col("lh")).cast("bigint").alias("lpm2_2"),
        F.sum(2 * F.col("lh") * F.col("ll")).cast("bigint").alias("lpm2_1"),
        F.sum(F.col("ll") * F.col("ll")).cast("bigint").alias("lpm2_0"),
    )


def _diff_frame(spark, sf_dir):
    """Per-type chronological daily-change frame: (type, dr, t, n) with
    the first (lag-undefined) day dropped — shared by both batch-t
    risk statistics."""
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type",
        "day",
        (F.col("x") - F.lag("x").over(wt)).alias("dr"),
    ).filter(F.col("dr").isNotNull())
    return r.select(
        "event_type",
        "dr",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("t"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
