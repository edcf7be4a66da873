"""Round-9 batch r: seasonal trend testing and information-theoretic
lead-lag direction.

``evt_seasonal_mann_kendall`` — the Hirsch–Slack seasonal Mann-Kendall
test per event_type: the plain MK statistic (`evt_mann_kendall`, one
global series) is blind to weekly seasonality — a flat series with a
strong weekday cycle generates spurious sign pairs across weekdays.
The seasonal form computes S WITHIN each weekday series and sums; the
emitted per-(type, weekday) S and exact variance numerators let the
gate assemble Z = (S_tot ∓ 1)/√(Σ var) with the tie-corrected null
variance.

``evt_transfer_entropy`` — Schreiber transfer entropy between the
daily purchase and view direction series (up/down moves), BOTH
directions: TE(X→Y) = I(y_t ; x_{t−1} | y_{t−1}) from the 8-cell
(y_t, y_{t−1}, x_{t−1}) contingency counts.  Granger (`evt_granger_lite`)
asks the linear version of "does X's past help predict Y?"; TE asks it
information-theoretically, and the ASYMMETRY between the two emitted
directions is the lead-lag arrow.  Plug-in conditional MI is ≥ 0 by
Jensen — the gate pins it.

Determinism: both queries emit ONLY BIGINT counts/sums from strict
integer comparisons (direction = 1 iff today strictly exceeds
yesterday; MK sign pairs via strict </>).  The gates own every float.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_EPOCH_DAY = "2024-01-01"  # fixture start — a Monday
_PAIR = ("purchase", "view")


@register(
    "evt_seasonal_mann_kendall",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             datediff('day', DATE '{_EPOCH_DAY}', CAST(ts AS DATE)) % 7
               AS wd,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events
      WHERE value IS NOT NULL AND CAST(ts AS DATE) >= DATE '{_EPOCH_DAY}'
      GROUP BY event_type, CAST(ts AS DATE),
               datediff('day', DATE '{_EPOCH_DAY}', CAST(ts AS DATE)) % 7),
    p AS (
      SELECT a.event_type, a.wd,
             CASE WHEN b.x > a.x THEN 1
                  WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.wd = b.wd
       AND a.day < b.day),
    s AS (
      SELECT event_type, wd,
             CAST(sum(sgn) AS BIGINT) AS s_wd
      FROM p GROUP BY event_type, wd),
    n AS (
      SELECT event_type, wd, CAST(count(*) AS BIGINT) AS n_wd
      FROM d GROUP BY event_type, wd)
    SELECT n.event_type, CAST(n.wd AS BIGINT) AS wd, n.n_wd,
           CAST(coalesce(s.s_wd, 0) AS BIGINT) AS s_wd,
           CAST(n.n_wd * (n.n_wd - 1) * (2 * n.n_wd + 5) AS BIGINT)
             AS var_num18
    FROM n LEFT JOIN s ON s.event_type = n.event_type AND s.wd = n.wd
    """,
    description=(
        "Hirsch–Slack seasonal Mann-Kendall per event_type: the MK "
        "sign statistic computed WITHIN each weekday series (epoch-"
        "anchored parity, day ≥ epoch enforced both sides) so a "
        "weekly cycle cannot fake a trend; emits per (type, weekday) "
        "the season length, S, and the exact null-variance numerator "
        "n(n−1)(2n+5) (denominator 18 applied by the gate, which "
        "assembles the continuity-corrected Z over ΣS and Σvar — "
        "ties in daily cent totals are measure-zero at fixture "
        "scales and the no-tie variance is pinned against a "
        "tie-aware brute force). Shape: one (type, day) rollup, one "
        "within-weekday self-join of the ≤52-row season frames, two "
        "folds on the same key family"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_seasonal_mann_kendall(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull()
        & (F.to_date("ts") >= F.lit(_EPOCH_DAY).cast("date"))
    )
    d = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (
            F.datediff(F.to_date("ts"), F.lit(_EPOCH_DAY).cast("date")) % 7
        ).alias("wd"),
    ).agg(F.sum("value_c").cast("bigint").alias("x")).localCheckpoint()
    # ≤366-rows-per-type day frame: feeds both self-join sides + the
    # season-length fold (without it: 3 fact rollups)
    a = d.select(
        F.col("event_type").alias("et"),
        F.col("wd").alias("w"),
        F.col("day").alias("da"),
        F.col("x").alias("xa"),
    )
    b = d.select(
        F.col("event_type").alias("et"),
        F.col("wd").alias("w"),
        F.col("day").alias("db"),
        F.col("x").alias("xb"),
    )
    sgn = (
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, ["et", "w"])
        .filter(F.col("da") < F.col("db"))
        .select("et", "w", sgn.alias("sgn"))
        .groupBy("et", "w")
        .agg(F.sum("sgn").cast("bigint").alias("s_wd"))
    )
    n = d.groupBy(
        F.col("event_type"), F.col("wd")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_wd"))
    return (
        n.join(
            s,
            (n["event_type"] == s["et"]) & (n["wd"] == s["w"]),
            "left",
        )
        .select(
            "event_type",
            F.col("wd").cast("bigint").alias("wd"),
            "n_wd",
            F.coalesce("s_wd", F.lit(0)).cast("bigint").alias("s_wd"),
            (
                F.col("n_wd")
                * (F.col("n_wd") - 1)
                * (2 * F.col("n_wd") + 5)
            )
            .cast("bigint")
            .alias("var_num18"),
        )
    )


@register(
    "evt_transfer_entropy",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = '{_PAIR[0]}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS xp,
             CAST(sum(CASE WHEN event_type = '{_PAIR[1]}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS xv
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    u AS (
      SELECT day,
             CASE WHEN xp > lag(xp) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS up,
             CASE WHEN xv > lag(xv) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS uv,
             row_number() OVER (ORDER BY day) AS rn
      FROM d),
    tr AS (
      SELECT uv AS y, lag(uv) OVER (ORDER BY day) AS yp,
             lag(up) OVER (ORDER BY day) AS xq,
             up AS y2, lag(up) OVER (ORDER BY day) AS yp2,
             lag(uv) OVER (ORDER BY day) AS xq2,
             rn
      FROM u),
    both_dirs AS (
      SELECT 'p2v' AS direction, y, yp, xq FROM tr WHERE rn >= 3
      UNION ALL
      SELECT 'v2p' AS direction, y2 AS y, yp2 AS yp, xq2 AS xq
      FROM tr WHERE rn >= 3)
    SELECT direction,
           CAST(y AS BIGINT) AS y_t,
           CAST(yp AS BIGINT) AS y_prev,
           CAST(xq AS BIGINT) AS x_prev,
           CAST(count(*) AS BIGINT) AS c
    FROM both_dirs GROUP BY direction, y, yp, xq
    """,
    description=(
        "Schreiber transfer entropy between the daily purchase and "
        "view DIRECTION series (up = strictly exceeded yesterday), "
        "both directions: the 8-cell (y_t, y_{t−1}, x_{t−1}) "
        "contingency counts per direction (rows with rn < 3 dropped "
        "so every lag is defined). The gate assembles "
        "TE = I(y_t; x_{t−1} | y_{t−1}) from the counts, pins the "
        "Jensen non-negativity of plug-in conditional MI, and reads "
        "the p→v vs v→p ASYMMETRY — the information-theoretic "
        "lead-lag arrow next to evt_granger_lite's linear one and "
        "evt_ccf_lead_lag's correlation one. Shape: one day rollup, "
        "lag windows over the ≤366-row GLOBAL day frame (documented "
        "single-partition presentation seam), one ≤16-row fold"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_transfer_entropy(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        *[
            F.sum(
                F.when(F.col("event_type") == tname, F.col("value_c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias(col)
            for tname, col in zip(_PAIR, ("xp", "xv"))
        ]
    )
    w = Window.orderBy("day")
    u = d.select(
        "day",
        F.when(F.col("xp") > F.lag("xp").over(w), 1).otherwise(0).alias(
            "up"
        ),
        F.when(F.col("xv") > F.lag("xv").over(w), 1).otherwise(0).alias(
            "uv"
        ),
        F.row_number().over(w).alias("rn"),
    )
    tr = u.select(
        F.col("uv").alias("y"),
        F.lag("uv").over(w.orderBy("day")).alias("yp"),
        F.lag("up").over(w.orderBy("day")).alias("xq"),
        F.col("up").alias("y2"),
        F.lag("up").over(w.orderBy("day")).alias("yp2"),
        F.lag("uv").over(w.orderBy("day")).alias("xq2"),
        "rn",
        "day",
    ).filter(F.col("rn") >= 3)
    p2v = tr.select(
        F.lit("p2v").alias("direction"), "y", "yp", "xq"
    )
    v2p = tr.select(
        F.lit("v2p").alias("direction"),
        F.col("y2").alias("y"),
        F.col("yp2").alias("yp"),
        F.col("xq2").alias("xq"),
    )
    return (
        p2v.union(v2p)
        .groupBy("direction", "y", "yp", "xq")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "direction",
            F.col("y").cast("bigint").alias("y_t"),
            F.col("yp").cast("bigint").alias("y_prev"),
            F.col("xq").cast("bigint").alias("x_prev"),
            "c",
        )
    )
