"""Round-9 batch ad: nonparametric change-point detection and partial
correlation.

``evt_pettitt_test`` — Pettitt's rank-based change-point test per
event_type: Uₜ = Σᵢ≤ₜ Σⱼ>ₜ sign(xⱼ − xᵢ), K = max|Uₜ|.  The SSE splits
(`evt_changepoint_sse`, `evt_changepoint_binseg2`) find mean shifts in
SQUARED-ERROR terms — one wild day can drag the split; Pettitt is the
rank version that survives outliers.  The quadratic double sum becomes
LINEAR work via the interval-delta trick: a pair (i < j) contributes
its sign to every boundary t ∈ [i, j−1], so each pair emits +s at t=i
and −s at t=j and Uₜ is one cumulative sum over boundaries.

``evt_partial_correlation`` — the partial correlation of daily
purchase and view values CONTROLLING for click volume, from exact
integer second moments: r_ab·c = (r_ab − r_ac·r_bc)/√((1−r_ac²)(1−r_bc²)).
`evt_correlation_matrix` reads raw dependence; the partial version
answers "do purchases and views co-move beyond what overall traffic
explains" — the confounder-adjusted number.  All second moments ship
as 2²⁰-split component sums (daily cent totals are non-negative, so
the per-row split divisions never see a signed operand).

Determinism: signs are strict integer comparisons; boundary indexes
come from a rank window; every emitted column is BIGINT; the gates own
the one square root and all divisions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_S20 = 1048576
_TRIPLE = ("purchase", "view", "click")


@register(
    "evt_pettitt_test",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    deltas AS (
      SELECT a.event_type, a.t AS bt,
             CASE WHEN b.x > a.x THEN 1
                  WHEN b.x < a.x THEN -1 ELSE 0 END AS s
      FROM r a JOIN r b
        ON a.event_type = b.event_type AND a.t < b.t
      UNION ALL
      SELECT a.event_type, b.t AS bt,
             -(CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END) AS s
      FROM r a JOIN r b
        ON a.event_type = b.event_type AND a.t < b.t),
    u AS (
      SELECT event_type, bt,
             sum(sum(s)) OVER (PARTITION BY event_type ORDER BY bt
                               ROWS UNBOUNDED PRECEDING) AS u_t
      FROM deltas GROUP BY event_type, bt),
    nn AS (
      SELECT event_type, CAST(max(t) AS BIGINT) AS n FROM r
      GROUP BY event_type)
    SELECT u.event_type, nn.n,
           CAST(max(abs(u.u_t)) AS BIGINT) AS k_stat,
           CAST(min(CASE WHEN abs(u.u_t) = mk.k THEN u.bt END) AS BIGINT)
             AS t_star,
           CAST(min(CASE WHEN abs(u.u_t) = mk.k THEN u.u_t END) AS BIGINT)
             AS u_at_star
    FROM u
    JOIN (SELECT event_type, max(abs(u_t)) AS k FROM u
          GROUP BY event_type) mk USING (event_type)
    JOIN nn USING (event_type)
    WHERE u.bt < nn.n
    GROUP BY u.event_type, nn.n
    """,
    description=(
        "Pettitt rank-based change-point test per event_type: "
        "Uₜ = ΣᵢΣⱼ sign pairs straddling boundary t, computed LINEARLY "
        "via the interval-delta trick (each day pair emits +s at its "
        "start index and −s at its end index; one cumulative sum over "
        "boundaries recovers every Uₜ — no per-boundary rescan). "
        "Emits K = max|Uₜ|, the earliest argmax boundary, and the "
        "signed U there; the gate brute-forces the double sum and "
        "assembles the approximate p ≈ 2·exp(−6K²/(n³+n²)) — the "
        "outlier-proof companion to the SSE change-point family. "
        "Shape: one (type, day) rollup (checkpointed; both pair-join "
        "sides), a days²-bounded pair join, one boundary fold + "
        "cumsum on the ≤366-row boundary frame"
    ),
    tags=("events", "statistics", "drift", "timeseries"),
)
def evt_pettitt_test(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    wt = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "x",
        F.row_number().over(wt.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(wt).alias("n"),
    ).localCheckpoint()  # feeds both pair-join sides + the n readout
    a = r.select(
        F.col("event_type").alias("et"),
        F.col("t").alias("ta"),
        F.col("x").alias("xa"),
    )
    b = r.select(
        F.col("event_type").alias("et"),
        F.col("t").alias("tb"),
        F.col("x").alias("xb"),
    )
    s = (
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
    )
    # one pass over the pair join emits BOTH interval deltas per pair
    # (explode of a 2-struct array — a union form re-ran the join and
    # doubled the plan: 6 exchanges measured → 2)
    deltas = (
        a.join(F.broadcast(b), "et")
        .filter(F.col("ta") < F.col("tb"))
        .select(
            "et",
            F.explode(
                F.array(
                    F.struct(F.col("ta").alias("bt"), s.alias("s")),
                    F.struct(
                        F.col("tb").alias("bt"), (-s).alias("s")
                    ),
                )
            ).alias("d"),
        )
        .select("et", "d.bt", "d.s")
    )
    u = (
        deltas.groupBy("et", "bt")
        .agg(F.sum("s").alias("ds"))
        .select(
            "et",
            "bt",
            F.sum("ds")
            .over(
                Window.partitionBy("et")
                .orderBy("bt")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("u_t"),
        )
    )
    nn = r.groupBy("event_type").agg(F.max("t").cast("bigint").alias("n"))
    ub = u.join(
        F.broadcast(nn), u["et"] == nn["event_type"]
    ).filter(F.col("bt") < F.col("n"))
    # window-lift the per-type max instead of agg + join-back: the ub
    # lineage was consumed twice, duplicating the whole delta pipeline
    # (6 exchanges measured → 3); the lift rides the cumsum's exchange
    ub = ub.withColumn(
        "k", F.max(F.abs(F.col("u_t"))).over(Window.partitionBy("et"))
    )
    return ub.groupBy(F.col("event_type"), F.col("n")).agg(
        F.max(F.abs(F.col("u_t"))).cast("bigint").alias("k_stat"),
        F.min(F.when(F.abs(F.col("u_t")) == F.col("k"), F.col("bt")))
        .cast("bigint")
        .alias("t_star"),
        F.min(F.when(F.abs(F.col("u_t")) == F.col("k"), F.col("u_t")))
        .cast("bigint")
        .alias("u_at_star"),
    )


def _split_sum(prod, name):
    return [
        F.sum(F.expr(f"({prod}) DIV {_S20}")).cast("bigint").alias(
            f"{name}_h"
        ),
        F.sum(F.expr(f"({prod}) % {_S20}")).cast("bigint").alias(
            f"{name}_l"
        ),
    ]


@register(
    "evt_partial_correlation",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             {", ".join(
                 "CAST(sum(CASE WHEN event_type = '" + t + "' THEN "
                 "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)"
                 " AS " + c
                 for t, c in zip(_TRIPLE, ("a", "b", "c")))}
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE))
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a) AS BIGINT) AS sa,
           CAST(sum(b) AS BIGINT) AS sb,
           CAST(sum(c) AS BIGINT) AS sc,
           {", ".join(
               f"CAST(sum(({p}) // {_S20}) AS BIGINT) AS {m}_h, "
               f"CAST(sum(({p}) % {_S20}) AS BIGINT) AS {m}_l"
               for p, m in (
                   ("a * a", "saa"), ("b * b", "sbb"), ("c * c", "scc"),
                   ("a * b", "sab"), ("a * c", "sac"), ("b * c", "sbc")))}
    FROM d
    """,
    description=(
        "partial correlation of daily purchase and view cent totals "
        "CONTROLLING for click volume: exact integer second moments "
        "over the global day frame, each product shipped as 2²⁰-split "
        "component sums (daily totals are non-negative, so the "
        "per-row split divisions never see a sign). The gate "
        "reassembles the moment matrix in Python bigints, forms the "
        "three Pearson r's, and computes r_ab·c = (r_ab − r_ac·r_bc)/"
        "√((1−r_ac²)(1−r_bc²)) with its [−1, 1] range pinned — the "
        "confounder-adjusted co-movement the raw correlation matrix "
        "can't give. Shape: one day rollup + ONE 1-row fold"
    ),
    tags=("events", "statistics"),
)
def evt_partial_correlation(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        *[
            F.sum(
                F.when(F.col("event_type") == tname, F.col("value_c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias(col)
            for tname, col in zip(_TRIPLE, ("a", "b", "c"))
        ]
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum("c").cast("bigint").alias("sc"),
    ]
    for prod, name in (
        ("a * a", "saa"),
        ("b * b", "sbb"),
        ("c * c", "scc"),
        ("a * b", "sab"),
        ("a * c", "sac"),
        ("b * c", "sbc"),
    ):
        aggs.extend(_split_sum(prod, name))
    return d.agg(*aggs)
