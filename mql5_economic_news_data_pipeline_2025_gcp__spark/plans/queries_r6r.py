"""Round-6 continuation (batch r): residual-whiteness diagnostics.

Ljung-Box portmanteau + partial autocorrelations, all derived from
EXACT integer lag moments: the centered autocovariances are cleared of
the fractional mean by multiplying through by n² (``n²·Σxy − nS(A+B) +
(n−k)S²`` — pure 38-digit integers), so the r_k, PACF, and Q values
are identical expression trees over identical integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_LAGS = [1, 2, 3]

_LAG_CELLS_SQL = ",\n             ".join(
    f"CAST(coalesce(sum(CAST(x AS HUGEINT) * x{k}), 0) AS HUGEINT)"
    f" AS p{k},\n"
    f"             CAST(coalesce(sum(x) FILTER (x{k} IS NOT NULL), 0)"
    f" AS HUGEINT) AS a{k},\n"
    f"             CAST(coalesce(sum(x{k}), 0) AS HUGEINT) AS b{k}"
    for k in _LAGS
)

_R_SQL = {
    k: (
        f"CAST(n * n * p{k} - n * s * (a{k} + b{k})"
        f" + (n - {k}) * s * s AS DOUBLE)"
        f" / CAST(n * (n * q - s * s) AS DOUBLE)"
    )
    for k in _LAGS
}


@register(
    "evt_ljung_box",
    oracle=rf"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    lagged AS (
      SELECT x,
             lag(x, 1) OVER (ORDER BY day) AS x1,
             lag(x, 2) OVER (ORDER BY day) AS x2,
             lag(x, 3) OVER (ORDER BY day) AS x3
      FROM d),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q,
             {_LAG_CELLS_SQL}
      FROM lagged),
    r AS (
      SELECT CAST(n AS BIGINT) AS n_days,
             {_R_SQL[1]} AS r1,
             {_R_SQL[2]} AS r2,
             {_R_SQL[3]} AS r3,
             CAST(n AS DOUBLE) AS nd
      FROM m)
    SELECT n_days, r1, r2, r3,
           (r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2,
           nd * (nd + 2.0)
             * ((r1 * r1 / (nd - 1.0) + r2 * r2 / (nd - 2.0))
                + r3 * r3 / (nd - 3.0)) AS q_lb
    FROM r
    """,
    description="Ljung-Box portmanteau test (lags 1-3) on the daily "
    "value series plus the lag-2 partial autocorrelation: centered "
    "autocovariances cleared of the fractional mean by n^2 "
    "multiplication (exact HUGEINT/decimal integers), r_k / PACF / Q "
    "as identical expression trees",
    tags=("events", "statistics", "timeseries"),
)
def evt_ljung_box(spark, sf_dir):
    """Is anything left in the residuals? — the whiteness gate every
    forecasting pipeline should run after `evt_holt_smoothing` /
    `evt_stl_decompose`.

    Q = n(n+2)·Σ_k r_k²/(n−k) pools the first three autocorrelations
    into one chi-square-distributed statistic; the lag-2 PACF
    ``(r₂ − r₁²)/(1 − r₁²)`` (Durbin recursion) separates direct from
    inherited correlation.  The subtlety is exactness: r_k's numerator
    involves the FRACTIONAL mean, so both sides compute
    ``n²Σx_tx_{t+k} − nS(A_k+B_k) + (n−k)S²`` — an exact 38-digit
    integer (A_k/B_k are the lag-aligned partial sums) — and divide by
    the integer ``n(nΣx² − S²)`` only at the end, as one identical
    tree.

    Scale: one fact pass to the calendar-bounded day frame, one lag
    window, one 11-cell exact-moment aggregation (the
    `evt_granger_lite` shape at three lags).
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.orderBy("day")
    lagged = d.select(
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in _LAGS],
    )
    dec = "decimal(38,0)"
    cells = [
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("s"),
        F.sum((F.col("x").cast(dec) * F.col("x")).cast(dec)).alias("q"),
    ]
    for k in _LAGS:
        cells += [
            F.coalesce(
                F.sum((F.col("x").cast(dec) * F.col(f"x{k}")).cast(dec)),
                F.lit(0).cast(dec),
            ).alias(f"p{k}"),
            F.coalesce(
                F.sum(
                    F.when(F.col(f"x{k}").isNotNull(), F.col("x"))
                ).cast(dec),
                F.lit(0).cast(dec),
            ).alias(f"a{k}"),
            F.coalesce(F.sum(f"x{k}").cast(dec), F.lit(0).cast(dec)).alias(
                f"b{k}"
            ),
        ]
    m = lagged.agg(*cells)

    def r_k(k):
        num = (
            F.col("n") * F.col("n") * F.col(f"p{k}")
            - F.col("n") * F.col("s") * (F.col(f"a{k}") + F.col(f"b{k}"))
            + (F.col("n") - F.lit(k)) * F.col("s") * F.col("s")
        )
        den = F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
        return num.cast("double") / den.cast("double")

    r = m.select(
        F.col("n").cast("bigint").alias("n_days"),
        r_k(1).alias("r1"),
        r_k(2).alias("r2"),
        r_k(3).alias("r3"),
        F.col("n").cast("double").alias("nd"),
    )
    return r.select(
        "n_days", "r1", "r2", "r3",
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (F.lit(1.0) - F.col("r1") * F.col("r1"))
        ).alias("pacf2"),
        (
            F.col("nd")
            * (F.col("nd") + F.lit(2.0))
            * (
                (
                    F.col("r1") * F.col("r1") / (F.col("nd") - F.lit(1.0))
                    + F.col("r2") * F.col("r2") / (F.col("nd") - F.lit(2.0))
                )
                + F.col("r3") * F.col("r3") / (F.col("nd") - F.lit(3.0))
            )
        ).alias("q_lb"),
    )
