"""Round-9 batch i: higher-moment shape statistics and the Hill tail
index.

``evt_moment_skew_kurtosis`` — exact integer raw-moment sufficient
statistics (Σv..Σv⁴) per event type, from which the pytest gate
assembles skewness g₁, excess kurtosis g₂, and the Jarque-Bera
normality statistic.  Nothing in the registry carried 3rd/4th moments
before — the shape readout that decides whether z-score anomaly rules
(`evt_anomaly_zscore`) are even applicable.

``evt_hill_tail_index`` — the Hill estimator over the top-k order
statistics per type, computed from the VALUE HISTOGRAM (cumulative
counts from the top — no fact-table sort): the tail-INDEX maximum-
likelihood companion to the GPD moment fits (`evt_pot_gpd_tail`,
`evt_peaks_over_threshold`).

Determinism: values are non-negative cents (fixtures: 0..~56k), so
every power and every hi/lo split stays non-negative — Spark's
truncating DIV equals DuckDB's flooring `//` throughout.  v⁴ overflows
int64 PER ROW, so the oracle never forms it: a = v² is split at 2¹⁷
(a = ah·2¹⁷ + al) and a² is emitted as the three BIGINT sums
Σah² / Σ2·ah·al / Σal² — the pytest gate reassembles
q₄ = Σah²·2³⁴ + Σ2ah·al·2¹⁷ + Σal² in Python bigints.  v³ sums ride
the standard 2²⁰ hi/lo halves.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_LN_U = 1000000
_HALF = 1048576
#: v² split point (a = ah·2¹⁷ + al keeps all three quartic sums int64)
_S17 = 131072
#: Hill estimator order-statistic depth
_HILL_K = 100


@register(
    "evt_moment_skew_kurtosis",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    p AS (
      SELECT event_type, v, v * v AS a,
             (v * v) // {_S17} AS ah, (v * v) % {_S17} AS al
      FROM s)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS s1,
           CAST(sum(a) AS BIGINT) AS s2,
           CAST(sum((v * a) // {_HALF}) AS BIGINT) AS s3_hi,
           CAST(sum((v * a) % {_HALF}) AS BIGINT) AS s3_lo,
           CAST(sum(ah * ah) AS BIGINT) AS q40,
           CAST(sum(2 * ah * al) AS BIGINT) AS q21,
           CAST(sum(al * al) AS BIGINT) AS q00
    FROM p GROUP BY event_type
    """,
    description=(
        "exact raw-moment sufficient statistics per event type up to "
        "the 4th power: Σv and Σv² directly, Σv³ as 2²⁰ hi/lo BIGINT "
        "halves, and Σv⁴ — which overflows int64 PER ROW — as the "
        "three split sums Σah²/Σ2·ah·al/Σal² of a = v² = ah·2¹⁷ + al "
        "(reassembled q₄ = Σah²·2³⁴ + Σ2ah·al·2¹⁷ + Σal² by the "
        "pytest gate in Python bigints; every operand non-negative, "
        "so DIV == //). The gate converts raw to central moments, "
        "assembles skewness g₁ = m₃/m₂^1.5, excess kurtosis "
        "g₂ = m₄/m₂² − 3, and Jarque-Bera n/6·(g₁² + g₂²/4) against "
        "a float reference — the shape diagnostics that gate z-score "
        "anomaly rules. Shape: map-side integer powers + ONE hash "
        "aggregate (mergeable moments — the same two-level "
        "combine-reduce at 100 TB)"
    ),
    tags=("events", "statistics"),
)
def evt_moment_skew_kurtosis(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    p = ev.select(
        "event_type",
        F.col("value_c").alias("v"),
    ).select(
        "event_type",
        "v",
        (F.col("v") * F.col("v")).alias("a"),
        F.expr(f"(v * v) DIV {_S17}").alias("ah"),
        ((F.col("v") * F.col("v")) % _S17).alias("al"),
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s1"),
        F.sum("a").cast("bigint").alias("s2"),
        F.sum(F.expr(f"(v * a) DIV {_HALF}")).cast("bigint").alias("s3_hi"),
        F.sum((F.col("v") * F.col("a")) % _HALF)
        .cast("bigint")
        .alias("s3_lo"),
        F.sum(F.col("ah") * F.col("ah")).cast("bigint").alias("q40"),
        F.sum(2 * F.col("ah") * F.col("al")).cast("bigint").alias("q21"),
        F.sum(F.col("al") * F.col("al")).cast("bigint").alias("q00"),
    )


@register(
    "evt_hill_tail_index",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    hist AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY event_type, v),
    cum AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v DESC
                          ROWS UNBOUNDED PRECEDING) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM hist),
    head AS (
      -- buckets intersecting the top-(k+1); v >= x_(k+1) > 0 here, so
      -- ln(v) is always defined on this frame
      SELECT event_type, v, c, cc, n,
             CAST(round(ln(CAST(v AS DOUBLE)) * {_LN_U}) AS BIGINT)
               AS lnv_u
      FROM cum WHERE cc - c < {_HILL_K} + 1),
    thr AS (
      SELECT event_type,
             CAST(max(CASE WHEN cc >= {_HILL_K} + 1 THEN v END)
                  AS BIGINT) AS x_k1,
             CAST(max(CASE WHEN cc >= {_HILL_K} + 1 THEN lnv_u END)
                  AS BIGINT) AS lnx_u
      FROM head GROUP BY event_type),
    takes AS (
      SELECT h.event_type,
             least(greatest({_HILL_K} - (h.cc - h.c), 0), h.c)
               * (h.lnv_u - t.lnx_u) AS term,
             h.n, t.x_k1
      FROM head h JOIN thr t USING (event_type))
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST({_HILL_K} AS BIGINT) AS k,
           CAST(max(x_k1) AS BIGINT) AS x_k1,
           CAST(sum(term) AS BIGINT) AS hill_num_u
    FROM takes GROUP BY event_type
    """,
    description=(
        f"Hill tail-index estimator over the top-{_HILL_K} order "
        "statistics per event type, from the value HISTOGRAM: "
        "cumulative counts FROM THE TOP give each bucket's membership "
        "in the top-k (take = clamp(k − above, 0, c)) and the "
        "(k+1)-th order statistic is the threshold — no fact-table "
        "sort, the head frame is the ≤(k+1) largest distinct values. "
        "hill_num = Σ take·(ln v − ln x_{{k+1}}) in micro-nats (every "
        "term non-negative since v ≥ x_{{k+1}} on the head frame); "
        "the gate assembles H = num/(k·10⁶) and the tail index "
        "α = 1/H against a float reference, and pins the Pareto-"
        "consistency bound α > 0. The MLE companion to the GPD "
        "moment fits. Shape: one histogram agg + histogram windows + "
        "a k-sized head join — fact rows shuffle once, as ints"
    ),
    tags=("events", "statistics", "risk"),
)
def evt_hill_tail_index(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    s = ev.select("event_type", F.col("value_c").alias("v"))
    hist = s.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(wn).alias("n"),
    )
    head = (
        cum.filter(F.col("cc") - F.col("c") < _HILL_K + 1)
        .withColumn(
            "lnv_u",
            F.round(F.log(F.col("v").cast("double")) * _LN_U).cast("bigint"),
        )
        # ≤(k+1) rows per type; feeds the threshold agg AND the take
        # join — without the checkpoint both lineages re-run the fact
        # histogram (2 scans / 4 exchanges measured → 1 fact pass)
        .localCheckpoint()
    )
    thr = head.groupBy("event_type").agg(
        F.max(F.when(F.col("cc") >= _HILL_K + 1, F.col("v")))
        .cast("bigint")
        .alias("x_k1"),
        F.max(F.when(F.col("cc") >= _HILL_K + 1, F.col("lnv_u")))
        .cast("bigint")
        .alias("lnx_u"),
    )
    takes = head.join(F.broadcast(thr), "event_type").select(
        "event_type",
        "n",
        "x_k1",
        (
            F.least(
                F.greatest(_HILL_K - (F.col("cc") - F.col("c")), F.lit(0)),
                F.col("c"),
            )
            * (F.col("lnv_u") - F.col("lnx_u"))
        ).alias("term"),
    )
    return takes.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.lit(_HILL_K).cast("bigint").alias("k"),
        F.max("x_k1").cast("bigint").alias("x_k1"),
        F.sum("term").cast("bigint").alias("hill_num_u"),
    )
