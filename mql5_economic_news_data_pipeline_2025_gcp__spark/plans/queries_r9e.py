"""Round-9 batch e: dependence and decision diagnostics.

``evt_mutual_information`` — mutual information (plus the marginal
entropies) between event type and weekday from the contingency table:
the symmetric dependence readout next to the directional chi-square
(`evt_chisq_independence` answers "is there dependence?"; MI answers
"how many nats does knowing the weekday buy you?" — the feature-
selection currency).

``evt_confusion_threshold`` — the thresholded confusion matrix for the
standing eval setup (score = per-user total value, outcome = ever
purchased, the `evt_rank_auc`/`evt_gains_table` convention): target the
top 20% by score and report TP/FP/FN/TN with floored basis-point
precision/recall/F1 — the operating-point readout the threshold-free
AUC and gains curve don't give.

``evt_simpson_paradox_audit`` — per-type vs pooled association sign
between the weekend indicator and value: a type whose within-group
association flips against the pooled sign is Simpson's paradox in the
wild — the confounding alarm an experimentation platform runs before
trusting any pooled lift.

Determinism: contingency cells are exact integers; per-cell MI terms
are micro-nat quantized (c·ln(cN/(rs)) with one rounded log per cell);
rates are floored basis points; association signs are exact 128-bit
integer comparisons confined to CTEs (finals all BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_LN_U = 1000000


@register(
    "evt_mutual_information",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow0,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, dow0 + 1 AS dow, c,
             sum(c) OVER (PARTITION BY event_type) AS r,
             sum(c) OVER (PARTITION BY dow0) AS s,
             sum(c) OVER () AS n
      FROM c)
    SELECT event_type, CAST(dow AS BIGINT) AS dow,
           c,
           CAST(r AS BIGINT) AS row_total,
           CAST(s AS BIGINT) AS col_total,
           CAST(n AS BIGINT) AS n,
           CAST(c * CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                                   / (CAST(r AS DOUBLE)
                                      * CAST(s AS DOUBLE))) * {_LN_U})
                         AS BIGINT) AS BIGINT) AS mi_term_u
    FROM m
    """,
    description=(
        "mutual-information cell table between event type and weekday: "
        "each contingency cell emits its exact count, marginals, and "
        "the micro-nat quantized MI contribution c·ln(cN/(rs)) — the "
        "pytest gate folds the ≤35 cells into MI, H(type), H(dow), and "
        "pins MI = H(t)+H(d)−H(t,d) ≥ 0 against a direct float "
        "reference. The symmetric how-much-dependence companion to "
        "evt_chisq_independence's is-there-dependence test, and the "
        "feature-selection score for calendar features. Weekday is "
        "pinned to Spark's 1=Sunday convention (DuckDB dayofweek is "
        "0=Sunday — the oracle shifts by +1, the known engine gotcha). "
        "Shape: one (type, dow) count agg, then marginals as windows "
        "over the 35-row cell frame — one fact shuffle total"
    ),
    tags=("events", "statistics", "dependence"),
)
def evt_mutual_information(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    c = ev.groupBy(
        "event_type", F.dayofweek(F.to_date("ts")).cast("bigint").alias("dow")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    m = c.select(
        "event_type",
        "dow",
        "c",
        F.sum("c").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("c").over(Window.partitionBy("dow")).alias("s"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    term = (
        F.col("c")
        * F.round(
            F.log(
                F.col("c").cast("double")
                * F.col("n").cast("double")
                / (F.col("r").cast("double") * F.col("s").cast("double"))
            )
            * _LN_U
        ).cast("bigint")
    )
    return m.select(
        "event_type",
        "dow",
        "c",
        F.col("r").cast("bigint").alias("row_total"),
        F.col("s").cast("bigint").alias("col_total"),
        F.col("n").cast("bigint").alias("n"),
        term.cast("bigint").alias("mi_term_u"),
    )


@register(
    "evt_confusion_threshold",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                  AS BIGINT) AS score,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    r AS (
      SELECT y,
             row_number() OVER (ORDER BY score DESC, user_id) AS rn,
             count(*) OVER () AS nu
      FROM u),
    p AS (SELECT y, CASE WHEN rn * 5 <= nu THEN 1 ELSE 0 END AS yhat
          FROM r),
    cm AS (
      SELECT CAST(sum(CASE WHEN yhat = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(sum(CASE WHEN yhat = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(sum(CASE WHEN yhat = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(sum(CASE WHEN yhat = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tn
      FROM p)
    SELECT tp, fp, fn, tn,
           CAST(tp * 10000 // (tp + fp) AS BIGINT) AS precision_bp,
           CAST(tp * 10000 // (tp + fn) AS BIGINT) AS recall_bp,
           CAST(2 * tp * 10000 // (2 * tp + fp + fn) AS BIGINT) AS f1_bp
    FROM cm
    """,
    description=(
        "thresholded confusion matrix at the top-20% operating point "
        "for the standing eval setup (score = per-user total value, "
        "outcome = ever purchased — the evt_rank_auc / evt_gains_table "
        "convention): predicted positive iff rank·5 ≤ n over the "
        "pinned total order (score DESC, user_id), then TP/FP/FN/TN "
        "with floored basis-point precision, recall, and F1 "
        "(2TP/(2TP+FP+FN) — one exact integer division, no float "
        "harmonic mean). Completes the eval family with the "
        "operating-point view AUC and the gains curve can't give. "
        "Shape: one per-user aggregate, one rank window over the USER "
        "frame (the gains_table presentation carve-out), a 1-row fold"
    ),
    tags=("events", "mleval", "statistics"),
)
def evt_confusion_threshold(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum("value_c"), F.lit(0)).cast("bigint").alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    wtot = Window.orderBy(F.desc("score"), F.asc("user_id"))
    p = u.select(
        "y",
        F.row_number().over(wtot).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nu"),
    ).select(
        "y",
        F.when(F.col("rn") * 5 <= F.col("nu"), 1).otherwise(0).alias("yhat"),
    )
    cm = p.agg(
        F.sum(F.when((F.col("yhat") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when((F.col("yhat") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("yhat") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((F.col("yhat") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("tp * 10000 DIV (tp + fp)").alias("precision_bp"),
        F.expr("tp * 10000 DIV (tp + fn)").alias("recall_bp"),
        F.expr("2 * tp * 10000 DIV (2 * tp + fp + fn)").alias("f1_bp"),
    )


@register(
    "evt_simpson_paradox_audit",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM s GROUP BY event_type),
    w AS (
      SELECT *,
             sum(n) OVER () AS tn, sum(sx) OVER () AS tsx,
             sum(sy) OVER () AS tsy, sum(sxy) OVER () AS tsxy
      FROM g)
    SELECT event_type, n, sx, sy, sxy,
           CAST(CASE WHEN CAST(n AS HUGEINT) * sxy
                          > CAST(sx AS HUGEINT) * sy THEN 1
                     WHEN CAST(n AS HUGEINT) * sxy
                          < CAST(sx AS HUGEINT) * sy THEN -1
                     ELSE 0 END AS BIGINT) AS assoc_sign,
           CAST(CASE WHEN CAST(tn AS HUGEINT) * tsxy
                          > CAST(tsx AS HUGEINT) * tsy THEN 1
                     WHEN CAST(tn AS HUGEINT) * tsxy
                          < CAST(tsx AS HUGEINT) * tsy THEN -1
                     ELSE 0 END AS BIGINT) AS pooled_sign,
           CAST(CASE WHEN (CASE WHEN CAST(n AS HUGEINT) * sxy
                                     > CAST(sx AS HUGEINT) * sy THEN 1
                                WHEN CAST(n AS HUGEINT) * sxy
                                     < CAST(sx AS HUGEINT) * sy THEN -1
                                ELSE 0 END)
                        * (CASE WHEN CAST(tn AS HUGEINT) * tsxy
                                     > CAST(tsx AS HUGEINT) * tsy THEN 1
                                WHEN CAST(tn AS HUGEINT) * tsxy
                                     < CAST(tsx AS HUGEINT) * tsy THEN -1
                                ELSE 0 END) < 0
                     THEN 1 ELSE 0 END AS BIGINT) AS flipped
    FROM w
    """,
    description=(
        "Simpson's-paradox audit of the weekend→value association: "
        "per event type AND pooled, the association sign is the exact "
        "integer sign of the covariance numerator n·Σxy − Σx·Σy "
        "(weekend is 0/1, value in cents — the comparison runs in "
        "128-bit INSIDE the CTE, every final column BIGINT), and a "
        "type is flagged when its within-group sign opposes the "
        "pooled sign — the confounding alarm that says a pooled lift "
        "number is not to be trusted. Weekend = Saturday/Sunday "
        "pinned across the engines' dayofweek conventions. Shape: one "
        "map-side indicator pass + one type agg; pooled totals are "
        "window-lifted over the 5-row group frame (no second scan)"
    ),
    tags=("events", "statistics", "experimentation"),
)
def evt_simpson_paradox_audit(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    # Spark dayofweek: 1=Sunday, 7=Saturday; oracle (DuckDB) is 0/6
    x = (
        F.when(F.dayofweek(F.to_date("ts")).isin(1, 7), 1)
        .otherwise(0)
        .alias("x")
    )
    s = ev.select("event_type", x, F.col("value_c").alias("y"))
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    wall = Window.partitionBy()
    w = g.select(
        "*",
        F.sum("n").over(wall).alias("tn"),
        F.sum("sx").over(wall).alias("tsx"),
        F.sum("sy").over(wall).alias("tsy"),
        F.sum("sxy").over(wall).alias("tsxy"),
    )
    dec = "decimal(38,0)"

    def sign(n_, sxy_, sx_, sy_):
        lhs = F.col(n_).cast(dec) * F.col(sxy_)
        rhs = F.col(sx_).cast(dec) * F.col(sy_)
        return (
            F.when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0)
        )

    a = sign("n", "sxy", "sx", "sy")
    p = sign("tn", "tsxy", "tsx", "tsy")
    return w.select(
        "event_type",
        "n",
        "sx",
        "sy",
        "sxy",
        a.cast("bigint").alias("assoc_sign"),
        p.cast("bigint").alias("pooled_sign"),
        F.when(a * p < 0, 1).otherwise(0).cast("bigint").alias("flipped"),
    )
