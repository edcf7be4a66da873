"""Round-9 batch g: intermittent-demand forecasting.

Slow-moving parts break classical smoothing: most weeks have ZERO
demand, so an EWMA of the raw series collapses toward zero and then
spikes.  The standard toolkit is (1) classify each part's demand
pattern (Syntetos-Boylan ADI × CV² quadrant), then (2) forecast the
intermittent/lumpy ones with Croston's method — separate exponential
smoothing of demand SIZES and inter-demand INTERVALS, updated only on
demand weeks.

``rel_intermittency_profile`` — the quadrant classifier per part with
exact cross-multiplied boundaries (ADI ⋛ 1.32, CV² ⋛ 0.49 — never a
float ratio).

``rel_croston_intermittent`` — Croston size/interval estimates and the
per-week demand-rate forecast, α = 1/8, milli-unit integer updates via
floor-consistent folds (``floor(x/8.0)`` written identically in both
engines — the signed-operand DIV-vs-// divergence class the round-9
parity work documented cannot arise).

Oracle machinery: sorted-array left folds (`list_reduce` with
`list_prepend` init == Spark `aggregate` HOF), SINGLE-accumulator folds
only (the DuckDB 1.0 multi-field struct-accumulator defect documented
in queries_r8c), lockstep `range`/`element_at` for intervals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import t
from .registry import register

#: week index epoch (shipdates span 1995-2001) — shared literal
_W_EPOCH = "1995-01-01"


def _weekly_sql() -> str:
    return f"""
    w AS (
      SELECT l_partkey AS pk,
             (CAST(l_shipdate AS DATE) - DATE '{_W_EPOCH}') // 7 AS wi,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem
      GROUP BY 1, 2)
    """


def _weekly_spark(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_partkey").alias("pk"),
            F.floor(
                F.datediff(
                    F.to_date("l_shipdate"), F.lit(_W_EPOCH).cast("date")
                )
                / 7
            )
            .cast("bigint")
            .alias("wi"),
            F.round("l_quantity").cast("bigint").alias("qr"),
        )
        .groupBy("pk", "wi")
        .agg(F.sum("qr").cast("bigint").alias("q"))
    )


@register(
    "rel_intermittency_profile",
    oracle=f"""
    WITH {_weekly_sql()},
    p AS (
      SELECT pk,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS qq,
             CAST(min(wi) AS BIGINT) AS first_wi,
             CAST(max(wi) AS BIGINT) AS last_wi
      FROM w GROUP BY pk)
    SELECT pk, m, s, qq, first_wi, last_wi,
           CASE WHEN 100 * (last_wi - first_wi) >= 132 * (m - 1)
                THEN CASE WHEN 100 * (m * qq - s * s) >= 49 * s * s
                          THEN 'lumpy' ELSE 'intermittent' END
                ELSE CASE WHEN 100 * (m * qq - s * s) >= 49 * s * s
                          THEN 'erratic' ELSE 'smooth' END
           END AS demand_class
    FROM p WHERE m >= 2
    """,
    description=(
        "Syntetos-Boylan demand-pattern quadrant per part: ADI (mean "
        "inter-demand interval, (last−first)/(m−1) weeks) and CV² of "
        "demand sizes ((m·Σq²−S²)/S²) classified against the 1.32 / "
        "0.49 boundaries with exact cross-multiplication — "
        "100·span ⋛ 132·(m−1) and 100·(m·Σq²−S²) ⋛ 49·S², never a "
        "float ratio, so boundary parts cannot diverge. The router "
        "that decides which parts get classical smoothing "
        "(rel_forecast_revenue) vs Croston "
        "(rel_croston_intermittent). Shape: one (part, week) rollup + "
        "one part aggregate — two hash aggs on the same key family"
    ),
    tags=("relational", "forecasting", "supplychain"),
)
def rel_intermittency_profile(spark, sf_dir):
    w = _weekly_spark(spark, sf_dir)
    p = w.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("qq"),
        F.min("wi").cast("bigint").alias("first_wi"),
        F.max("wi").cast("bigint").alias("last_wi"),
    ).filter(F.col("m") >= 2)
    adi_hi = 100 * (F.col("last_wi") - F.col("first_wi")) >= 132 * (
        F.col("m") - 1
    )
    cv_hi = 100 * (
        F.col("m") * F.col("qq") - F.col("s") * F.col("s")
    ) >= 49 * F.col("s") * F.col("s")
    cls = (
        F.when(adi_hi & cv_hi, "lumpy")
        .when(adi_hi, "intermittent")
        .when(cv_hi, "erratic")
        .otherwise("smooth")
    )
    return p.select(
        "pk", "m", "s", "qq", "first_wi", "last_wi",
        cls.alias("demand_class"),
    )


_FOLD_STEP = "acc + CAST(floor((x * 1000 - acc) / 8.0) AS BIGINT)"


@register(
    "rel_croston_intermittent",
    oracle=f"""
    WITH {_weekly_sql()},
    arr AS (
      SELECT pk,
             CAST(count(*) AS BIGINT) AS m,
             list(q ORDER BY wi) AS qs,
             list(wi ORDER BY wi) AS ws
      FROM w GROUP BY pk),
    f AS (
      SELECT pk, m,
             list_reduce(
               list_prepend(qs[1] * 1000, qs[2:]),
               (acc, x) -> {_FOLD_STEP}) AS z_milli,
             list_reduce(
               list_prepend((ws[2] - ws[1]) * 1000,
                 list_transform(range(3, CAST(m AS INTEGER) + 1),
                                i -> ws[i] - ws[i - 1])),
               (acc, x) -> {_FOLD_STEP}) AS p_milli
      FROM arr WHERE m >= 2)
    SELECT pk, m,
           CAST(z_milli AS BIGINT) AS z_milli,
           CAST(p_milli AS BIGINT) AS p_milli,
           CAST(z_milli * 1000000 // p_milli AS BIGINT) AS forecast_micro
    FROM f
    """,
    description=(
        "Croston's intermittent-demand forecast per part (α = 1/8): "
        "demand sizes and inter-demand intervals smoothed SEPARATELY, "
        "updated only on demand weeks, in exact milli-unit integers — "
        "each update is acc += floor((x·1000 − acc)/8.0) with the "
        "floor written identically in both engines (signed operands, "
        "so the truncating-DIV form is exactly the round-9 parity "
        "hazard and is avoided by construction). Forecast = size/"
        "interval emitted as floored micro-units per week — the "
        "number a replenishment planner orders against for lumpy "
        "parts. Folds are sorted-array left folds with prepended "
        "init and a SINGLE accumulator each (sizes and intervals "
        "fold independently — the DuckDB 1.0 struct-accumulator "
        "defect never applies). Shape: one (part, week) rollup, one "
        "collect-sort per part (≤357 weeks), map-side folds"
    ),
    tags=("relational", "forecasting", "supplychain"),
)
def rel_croston_intermittent(spark, sf_dir):
    w = _weekly_spark(spark, sf_dir)
    arr = w.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.expr(
            "transform(array_sort(collect_list(struct(wi, q))), s -> s.q)"
        ).alias("qs"),
        F.expr(
            "transform(array_sort(collect_list(struct(wi, q))), s -> s.wi)"
        ).alias("ws"),
    ).filter(F.col("m") >= 2)
    z = F.expr(
        "aggregate(slice(qs, 2, size(qs) - 1),"
        f" element_at(qs, 1) * 1000L, (acc, x) -> {_FOLD_STEP})"
    )
    p = F.expr(
        "aggregate(transform(sequence(3, CAST(m AS INT)),"
        " i -> element_at(ws, i) - element_at(ws, i - 1)),"
        " (element_at(ws, 2) - element_at(ws, 1)) * 1000L,"
        f" (acc, x) -> {_FOLD_STEP})"
    )
    f = arr.select(
        "pk",
        "m",
        z.cast("bigint").alias("z_milli"),
        p.cast("bigint").alias("p_milli"),
    )
    return f.select(
        "pk",
        "m",
        "z_milli",
        "p_milli",
        F.expr("z_milli * 1000000 DIV p_milli").alias("forecast_micro"),
    )
