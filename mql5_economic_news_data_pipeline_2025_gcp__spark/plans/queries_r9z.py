"""Round-9 batch z: control-chart run rules and the ordered-alternative
trend test.

``evt_nelson_rules`` — the Western-Electric/Nelson RUN rules over each
type's daily series: rule 2 (nine consecutive days on the same side of
the series median) and rule 3 (six consecutive strictly
monotone days).  Point rules (`evt_xbar_r_chart`'s limit violations,
`evt_hampel_filter`) catch spikes; RUN rules catch small persistent
shifts and drifts long before any single point crosses a limit —
they're the sensitivity half of SPC.  Runs are detected with rolling
min=max window tests over integer signs (no state machine, no fold).

``evt_jonckheere_terpstra`` — the Jonckheere–Terpstra test for an
ORDERED alternative across weekday groups (Mon < Tue < … < Sun): the
sum over ordered group pairs of Mann-Whitney "less-than" counts.
`evt_kruskal_wallis` asks "are weekdays different at all?";
JT asks the sharper, more powerful question "do values INCREASE along
the week?" — the right test when the grouping carries an order.
Strict-less and tie pair counts are emitted separately with the exact
null-moment numerators; the gate assembles the tie-free z.

Determinism: medians are nearest-rank order statistics
(cross-multiplied 2·r ≥ n); signs and pair comparisons are strict
integer comparisons; weekday parity is epoch-anchored with day ≥ epoch
enforced in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_EPOCH_DAY = "2024-01-01"  # fixture start — a Monday
_RUN_SIDE = 9
_RUN_TREND = 6


@register(
    "evt_nelson_rules",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    med AS (
      SELECT event_type, CAST(min(x) AS BIGINT) AS med FROM (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY x, day) AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM d) WHERE 2 * r >= n GROUP BY event_type),
    s AS (
      SELECT d.event_type, d.day, d.x, m.med,
             CASE WHEN d.x > m.med THEN 1
                  WHEN d.x < m.med THEN -1 ELSE 0 END AS side,
             CASE WHEN d.x > lag(d.x) OVER (PARTITION BY d.event_type
                                            ORDER BY d.day) THEN 1
                  WHEN d.x < lag(d.x) OVER (PARTITION BY d.event_type
                                            ORDER BY d.day) THEN -1
                  ELSE 0 END AS dir
      FROM d JOIN med m USING (event_type)),
    runs AS (
      SELECT event_type, day, med,
             CASE WHEN count(*) OVER w{_RUN_SIDE} = {_RUN_SIDE}
                   AND min(side) OVER w{_RUN_SIDE}
                       = max(side) OVER w{_RUN_SIDE}
                   AND min(side) OVER w{_RUN_SIDE} <> 0
                  THEN 1 ELSE 0 END AS r_side,
             CASE WHEN count(*) OVER w{_RUN_TREND} = {_RUN_TREND}
                   AND min(dir) OVER w{_RUN_TREND}
                       = max(dir) OVER w{_RUN_TREND}
                   AND min(dir) OVER w{_RUN_TREND} <> 0
                  THEN 1 ELSE 0 END AS r_trend
      FROM s
      WINDOW w{_RUN_SIDE} AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_RUN_SIDE - 1} PRECEDING AND CURRENT ROW),
             w{_RUN_TREND} AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_RUN_TREND - 1} PRECEDING AND CURRENT ROW))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(med) AS BIGINT) AS med,
           CAST(sum(r_side) AS BIGINT) AS n_rule_side,
           CAST(sum(r_trend) AS BIGINT) AS n_rule_trend
    FROM runs GROUP BY event_type
    """,
    description=(
        f"Nelson/Western-Electric run rules per event_type daily "
        f"series: rule 2 fires on {_RUN_SIDE} consecutive days on the "
        "same side of the series MEDIAN (nearest-rank, 2·r ≥ n), rule "
        f"3 on {_RUN_TREND} consecutive strictly monotone days — both "
        "detected as rolling min=max≠0 window tests over integer "
        "signs (completion-position counts; no state machine). The "
        "sensitivity half of SPC: small persistent shifts and drifts "
        "that never cross a point limit. Shape: one (type, day) "
        "rollup, a rank window for the median, sign lags + two "
        "bounded ROWS windows, one fold — all on the ≤366-row day "
        "frame"
    ),
    tags=("events", "statistics", "ops", "drift"),
)
def evt_nelson_rules(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    ).localCheckpoint()  # feeds the median rank AND the run windows
    wt = Window.partitionBy("event_type")
    ranked = d.select(
        "event_type",
        "x",
        F.row_number().over(wt.orderBy("x", "day")).alias("r"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    med = (
        ranked.filter(2 * F.col("r") >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("x").cast("bigint").alias("med"))
    )
    w_day = wt.orderBy("day")
    s = d.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day",
        "med",
        F.when(F.col("x") > F.col("med"), 1)
        .when(F.col("x") < F.col("med"), -1)
        .otherwise(0)
        .alias("side"),
        F.when(F.col("x") > F.lag("x").over(w_day), 1)
        .when(F.col("x") < F.lag("x").over(w_day), -1)
        .otherwise(0)
        .alias("dir"),
    )
    w9 = w_day.rowsBetween(-(_RUN_SIDE - 1), 0)
    w6 = w_day.rowsBetween(-(_RUN_TREND - 1), 0)
    runs = s.select(
        "event_type",
        "med",
        (
            (F.count(F.lit(1)).over(w9) == _RUN_SIDE)
            & (F.min("side").over(w9) == F.max("side").over(w9))
            & (F.min("side").over(w9) != 0)
        )
        .cast("int")
        .alias("r_side"),
        (
            (F.count(F.lit(1)).over(w6) == _RUN_TREND)
            & (F.min("dir").over(w6) == F.max("dir").over(w6))
            & (F.min("dir").over(w6) != 0)
        )
        .cast("int")
        .alias("r_trend"),
    )
    return runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("med").cast("bigint").alias("med"),
        F.sum("r_side").cast("bigint").alias("n_rule_side"),
        F.sum("r_trend").cast("bigint").alias("n_rule_trend"),
    )


@register(
    "evt_jonckheere_terpstra",
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
      SELECT a.event_type,
             CASE WHEN a.x < b.x THEN 1 ELSE 0 END AS lt,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.wd < b.wd),
    g AS (
      SELECT event_type, wd, CAST(count(*) AS BIGINT) AS n_g
      FROM d GROUP BY event_type, wd),
    moments AS (
      SELECT event_type,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(n_g) * sum(n_g) - sum(n_g * n_g) AS BIGINT)
               AS mu_num4,
             CAST(sum(n_g) * sum(n_g) * (2 * sum(n_g) + 3)
                  - sum(n_g * n_g * (2 * n_g + 3)) AS BIGINT)
               AS var_num72
      FROM g GROUP BY event_type)
    SELECT m.event_type, m.n, m.mu_num4, m.var_num72,
           CAST(sum(p.lt) AS BIGINT) AS jt_lt,
           CAST(sum(p.tie) AS BIGINT) AS jt_ties
    FROM p JOIN moments m USING (event_type)
    GROUP BY m.event_type, m.n, m.mu_num4, m.var_num72
    """,
    description=(
        "Jonckheere–Terpstra ordered-alternative test per event_type: "
        "weekday groups ordered Mon→Sun (epoch-anchored parity, "
        "day ≥ epoch enforced both sides), JT = Σ over ordered group "
        "pairs of strict-less counts, ties emitted separately, plus "
        "the exact null-moment numerators μ·4 = N²−Σn_g² and "
        "var·72 = N²(2N+3)−Σn_g²(2n_g+3). The gate assembles "
        "z = (JT + ties/2 − μ)/σ — the sharper question than "
        "Kruskal-Wallis when the grouping carries an ORDER (do "
        "values rise along the week?). Shape: one (type, day) "
        "rollup (checkpointed — pair join and group census share "
        "it), one ordered-pair self-join bounded by days² per type, "
        "one broadcast moments join"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_jonckheere_terpstra(spark, sf_dir):
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
    a = d.select(
        F.col("event_type").alias("et"),
        F.col("wd").alias("wa"),
        F.col("x").alias("xa"),
    )
    b = d.select(
        F.col("event_type").alias("et"),
        F.col("wd").alias("wb"),
        F.col("x").alias("xb"),
    )
    p = (
        a.join(b, "et")
        .filter(F.col("wa") < F.col("wb"))
        .groupBy("et")
        .agg(
            F.sum(F.when(F.col("xa") < F.col("xb"), 1).otherwise(0))
            .cast("bigint")
            .alias("jt_lt"),
            F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
            .cast("bigint")
            .alias("jt_ties"),
        )
    )
    g = d.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g")
    )
    moments = g.groupBy("event_type").agg(
        F.sum("n_g").cast("bigint").alias("n"),
        (F.sum("n_g") * F.sum("n_g") - F.sum(F.col("n_g") * F.col("n_g")))
        .cast("bigint")
        .alias("mu_num4"),
        (
            F.sum("n_g") * F.sum("n_g") * (2 * F.sum("n_g") + 3)
            - F.sum(
                F.col("n_g") * F.col("n_g") * (2 * F.col("n_g") + 3)
            )
        )
        .cast("bigint")
        .alias("var_num72"),
    )
    return (
        moments.join(
            p, moments["event_type"] == p["et"]
        )
        .select(
            "event_type",
            "n",
            "mu_num4",
            "var_num72",
            "jt_lt",
            "jt_ties",
        )
    )
