"""Round-9 batch l: KPSS stationarity partial sums and geometric
adstock carryover.

``evt_kpss_partial_sums`` — the KPSS level-stationarity test's exact
sufficient statistics: the n-scaled partial sums of demeaned daily
values, Sₜ = Σᵢ≤ₜ (n·yᵢ − Σy).  The gate assembles the KPSS statistic
η = (ΣSₜ²/n²)/(n·σ̂²-ish denominator, lag-0 long-run variance) and pins
the telescoping invariant Sₙ = 0.  The null here is STATIONARITY —
the opposite orientation from `evt_mann_kendall` / `evt_cusum_check`
(which hunt for trends): a unit-root series fails KPSS while passing
trend tests, and pipelines run both before differencing a series.

``evt_adstock_carryover`` — the marketing-science adstock transform
(geometric carryover with λ = 1/2) replayed in exact integers over
per-type daily event counts: aₜ = ⌊aₜ₋₁/2⌋ + cₜ.  Emits each type's
final and peak adstock level and the total carried exposure Σaₜ — the
effective-pressure numbers a media-mix model regresses on instead of
raw daily counts.  Flooring makes the recursion non-linear, so it is a
genuine sequential fold, run map-side over ≤366-element sorted arrays
(the r9g Croston machinery).

Determinism: KPSS emits only BIGINT partial sums (|Sₜ| ≤ n²·ȳ ≈ 2·10¹³
at sf1 — comfortably int64).  Adstock folds keep TWO accumulators
(running level + peak / + total) packed into one BIGINT (level·2²⁰ +
peak, level·2³² + total) because DuckDB 1.0's struct-accumulator fold
is defective (r9g finding); the pack is safe while daily counts stay
below 2¹⁹ (sf1 measures ~5.5k/day/type; the pytest gate asserts the
bound).  Every operand is non-negative, so truncating DIV == flooring
// throughout.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: pack bases for the two-accumulator adstock folds
_BP = 1048576  # 2^20: level·_BP + peak
_BT = 4294967296  # 2^32: level·_BT + total


@register(
    "evt_kpss_partial_sums",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(y) OVER (PARTITION BY event_type) AS sy
      FROM d)
    SELECT event_type, CAST(t AS BIGINT) AS t,
           CAST(sum(n * y - sy) OVER (PARTITION BY event_type ORDER BY t
                                      ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS s_t,
           CAST(n AS BIGINT) AS n,
           CAST(sy AS BIGINT) AS sy
    FROM r
    """,
    description=(
        "KPSS level-stationarity sufficient statistics per event_type: "
        "the N-SCALED partial sums Sₜ = Σᵢ≤ₜ(n·yᵢ − Σy) of the demeaned "
        "daily cent series — multiplying through by n keeps every "
        "partial sum an exact BIGINT (no mean division inside the "
        "cumsum). The gate assembles η = ΣSₜ²/(n²·Σ(n·y−Σy)²/n²) — "
        "the test whose NULL is stationarity, run alongside the "
        "trend-hunting tests before differencing — and pins the "
        "telescoping invariant Sₙ = 0. Output is days-bounded "
        "(≤366 rows/type at ANY input scale). Shape: one (type, day) "
        "rollup, one type window stack (rank, lift, cumsum) on the "
        "day frame"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_kpss_partial_sums(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("y")
    )
    wt = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "y",
        F.row_number().over(wt.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("y").over(wt).alias("sy"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return r.select(
        "event_type",
        F.col("t").cast("bigint").alias("t"),
        F.sum(F.col("n") * F.col("y") - F.col("sy"))
        .over(w_cum)
        .cast("bigint")
        .alias("s_t"),
        F.col("n").cast("bigint").alias("n"),
        F.col("sy").cast("bigint").alias("sy"),
    )


#: adstock fold steps — level decays by half then absorbs the day's
#: count; peak/total ride the same accumulator via the pack bases.
#: (acc // B) is the running level, (acc % B) the carried statistic.
_STEP_PEAK = (
    f"((acc // {_BP}) // 2 + x) * {_BP} "
    f"+ greatest(acc % {_BP}, (acc // {_BP}) // 2 + x)"
)
_STEP_TOT = (
    f"((acc // {_BT}) // 2 + x) * {_BT} "
    f"+ (acc % {_BT}) + ((acc // {_BT}) // 2 + x)"
)
#: Spark twins: DIV is truncating, but every operand here is
#: non-negative (counts and their floored halves), so DIV == //.
_STEP_PEAK_S = (
    f"((acc DIV {_BP}) DIV 2 + x) * {_BP} "
    f"+ greatest(acc % {_BP}, (acc DIV {_BP}) DIV 2 + x)"
)
_STEP_TOT_S = (
    f"((acc DIV {_BT}) DIV 2 + x) * {_BT} "
    f"+ (acc % {_BT}) + ((acc DIV {_BT}) DIV 2 + x)"
)


@register(
    "evt_adstock_carryover",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    arr AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             list(c ORDER BY day) AS cs
      FROM d GROUP BY event_type),
    f AS (
      SELECT event_type, n_days,
             list_reduce(
               list_prepend(cs[1] * {_BP} + cs[1], cs[2:]),
               (acc, x) -> {_STEP_PEAK}) AS fp,
             list_reduce(
               list_prepend(cs[1] * {_BT} + cs[1], cs[2:]),
               (acc, x) -> {_STEP_TOT}) AS ft
      FROM arr)
    SELECT event_type, n_days,
           CAST(fp // {_BP} AS BIGINT) AS final_adstock,
           CAST(fp % {_BP} AS BIGINT) AS peak_adstock,
           CAST(ft % {_BT} AS BIGINT) AS total_exposure
    FROM f
    """,
    description=(
        "geometric adstock carryover (λ = 1/2) over per-type daily "
        "event counts in exact integers: aₜ = ⌊aₜ₋₁/2⌋ + cₜ — the "
        "media-pressure transform a marketing-mix model regresses on. "
        "Flooring makes the recursion non-linear (no closed form), so "
        "it runs as a map-side left fold over each type's ≤366-element "
        "day array; peak and total ride the SAME single-BIGINT "
        "accumulator as packed low bits (level·2²⁰+peak, "
        "level·2³²+total — DuckDB 1.0's struct-accumulator fold is "
        "defective, the r9g finding), safe while daily counts < 2¹⁹ "
        "(gate-asserted; sf1 ≈ 5.5k). All operands non-negative ⇒ "
        "truncating DIV == flooring //. Emits final/peak adstock and "
        "total carried exposure Σaₜ. Shape: one (type, day) rollup, "
        "one ≤366-element collect-sort per type, map-side folds"
    ),
    tags=("events", "timeseries", "forecasting"),
)
def evt_adstock_carryover(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    arr = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, c))), s -> s.c)"
        ).alias("cs"),
    )
    fp = F.expr(
        f"aggregate(slice(cs, 2, size(cs) - 1),"
        f" element_at(cs, 1) * {_BP} + element_at(cs, 1),"
        f" (acc, x) -> {_STEP_PEAK_S})"
    )
    ft = F.expr(
        f"aggregate(slice(cs, 2, size(cs) - 1),"
        f" element_at(cs, 1) * {_BT} + element_at(cs, 1),"
        f" (acc, x) -> {_STEP_TOT_S})"
    )
    f = arr.select("event_type", "n_days", fp.alias("fp"), ft.alias("ft"))
    return f.select(
        "event_type",
        "n_days",
        F.expr(f"fp DIV {_BP}").cast("bigint").alias("final_adstock"),
        (F.col("fp") % _BP).cast("bigint").alias("peak_adstock"),
        (F.col("ft") % _BT).cast("bigint").alias("total_exposure"),
    )
