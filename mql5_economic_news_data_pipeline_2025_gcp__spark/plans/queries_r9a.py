"""Round-9 batch a: inequality and market-structure statistics.

Three readouts a spend/revenue analytics surface ships next to the
existing concentration family (`evt_gini_value`, `rel_abc_xyz`,
`evt_gains_table`):

``evt_theil_inequality`` — Theil-T sufficient statistics per event
type.  Unlike Gini, Theil decomposes exactly into within-group +
between-group terms, which is why inequality dashboards prefer it for
"is the spend skew inside each segment or across segments?".

``evt_atkinson_stats`` — Atkinson(ε=1) sufficient statistics (the
geometric-vs-arithmetic-mean welfare index) per event type.

``rel_herfindahl_market`` — supplier revenue concentration per nation:
HHI, CR1 and CR4 in exact basis points from floored integer shares.

Determinism: every per-row transcendental is quantized to integer
micro-nats (``round(ln(x)·10⁶)`` — the `doc_unigram_logprob` pattern,
driver-green since round 5); every sum that could leave int64 rides the
2²⁰ hi/lo BIGINT-halves split introduced by the round-9 parity
hardening (`evt_levene_median`); the only float the oracle emits is
composed from single int→double casts.  No HUGEINT/decimal ever reaches
a final projection (scripts/parity_lint.py enforces this).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

#: micro-nat quantization for per-row logs (shared literal both sides)
_LN_U = 1000000
#: hi/lo split for 128-bit-safe BIGINT sums (evt_levene_median pattern)
_HALF = 1048576


@register(
    "evt_theil_inequality",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
      WHERE value IS NOT NULL AND CAST(round(value * 100) AS BIGINT) >= 1),
    q AS (
      SELECT event_type, v,
             CAST(round(ln(CAST(v AS DOUBLE)) * {_LN_U}) AS BIGINT) AS lnv_u
      FROM s)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS s,
           CAST(sum((v * lnv_u) // {_HALF}) AS BIGINT) AS tnum_hi,
           CAST(sum((v * lnv_u) % {_HALF}) AS BIGINT) AS tnum_lo
    FROM q GROUP BY event_type
    """,
    description=(
        "Theil-T inequality sufficient statistics per event type: "
        "positive integer-cent values x contribute micro-nat-quantized "
        "x·ln(x) terms, emitted as exact BIGINT hi/lo halves "
        "(tnum = tnum_hi·2²⁰ + tnum_lo — the levene-median render-safe "
        "cut) alongside n and Σx. T = tnum/(10⁶·S) − ln(S/n) and the "
        "exact within/between decomposition T_total = Σ(S_g/S)·T_g + "
        "T_between are assembled (and pinned against a float reference) "
        "by the pytest gate — the one non-integer step stays out of the "
        "differential surface. Shape: map-side quantized-log exprs + "
        "ONE hash aggregate on event_type; no window, no join — the "
        "same single shuffle at any SF"
    ),
    tags=("events", "statistics", "inequality"),
)
def evt_theil_inequality(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull() & (F.col("value_c") >= 1)
    )
    lnv_u = F.round(F.log(F.col("value_c").cast("double")) * _LN_U).cast(
        "bigint"
    )
    q = ev.select(
        "event_type",
        F.col("value_c").alias("v"),
        lnv_u.alias("lnv_u"),
    ).withColumn("term", F.col("v") * F.col("lnv_u"))
    return q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.expr(f"term DIV {_HALF}")).cast("bigint").alias("tnum_hi"),
        F.sum(F.col("term") % _HALF).cast("bigint").alias("tnum_lo"),
    )


@register(
    "evt_atkinson_stats",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
      WHERE value IS NOT NULL AND CAST(round(value * 100) AS BIGINT) >= 1)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS s,
           CAST(sum(CAST(round(ln(CAST(v AS DOUBLE)) * {_LN_U}) AS BIGINT))
                AS BIGINT) AS sum_ln_u
    FROM s GROUP BY event_type
    """,
    description=(
        "Atkinson(ε=1) welfare-index sufficient statistics per event "
        "type: n, Σx and the micro-nat-quantized Σln(x) over positive "
        "integer-cent values. A = 1 − GM/AM = 1 − exp(Σln(x)/n·10⁻⁶)/"
        "(S/n) is assembled by the pytest gate (exp is the one "
        "transcendental whose JVM-vs-libm rounding is NOT pinned — the "
        "0.95-grid lesson — so it stays out of the oracle surface "
        "entirely; the emitted stats are pure integers). Σln_u is "
        "≤ ~1.2·10⁷ per row — int64-safe past 10¹¹ rows, no halves "
        "needed. Shape: map-side exprs + one hash aggregate"
    ),
    tags=("events", "statistics", "inequality"),
)
def evt_atkinson_stats(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull() & (F.col("value_c") >= 1)
    )
    lnv_u = F.round(F.log(F.col("value_c").cast("double")) * _LN_U).cast(
        "bigint"
    )
    return (
        ev.select("event_type", F.col("value_c").alias("v"), lnv_u.alias("lnv_u"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
            F.sum("lnv_u").cast("bigint").alias("sum_ln_u"),
        )
    )


@register(
    "rel_herfindahl_market",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    sh AS (
      SELECT nationkey, suppkey, rev_c,
             sum(rev_c) OVER (PARTITION BY nationkey) AS tot_c,
             row_number() OVER (PARTITION BY nationkey
                                ORDER BY rev_c DESC, suppkey ASC) AS rk
      FROM rev),
    b AS (
      SELECT nationkey, rk, tot_c,
             (rev_c * 10000) // tot_c AS share_bp
      FROM sh),
    agg AS (
      SELECT nationkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(max(tot_c) AS BIGINT) AS revenue_c,
             CAST(sum(share_bp * share_bp) // 10000 AS BIGINT) AS hhi_bp,
             CAST(max(CASE WHEN rk = 1 THEN share_bp END) AS BIGINT)
               AS cr1_bp,
             CAST(sum(CASE WHEN rk <= 4 THEN share_bp ELSE 0 END)
                  AS BIGINT) AS cr4_bp
      FROM b GROUP BY nationkey)
    SELECT n.n_name AS nation, a.n_suppliers, a.revenue_c,
           a.hhi_bp, a.cr1_bp, a.cr4_bp
    FROM agg a JOIN nation n ON n.n_nationkey = a.nationkey
    """,
    description=(
        "supplier revenue concentration per nation — the antitrust/"
        "sourcing-risk readout: Herfindahl-Hirschman index, CR1 and "
        "CR4 in exact basis points. The hash-exact INTEGER TWIN of "
        "`rel_supplier_hhi` (whose Σshare² is a round-6 float on "
        "discounted revenue) extended with the concentration RATIOS "
        "(CR1/CR4) that index alone can't give. Shares are FLOORED "
        "integer bp "
        "(rev·10⁴ // total — the defined statistic, so no float ratio "
        "ever exists to diverge) and HHI = Σshare_bp² // 10⁴ stays "
        "≤ 10⁴·|suppliers| at any SF — intermediate DuckDB HUGEINT "
        "widening is confined to CTEs, every final column CAST BIGINT "
        "(scripts/parity_lint.py). Shape: broadcast supplier dim into "
        "the lineitem scan, one (nation, supplier) hash agg, ONE "
        "nation-partitioned window pass (share + rank share the "
        "exchange), final agg grouped on the SAME nation key (exchange "
        "reuse) with the 25-row nation dim broadcast last for names"
    ),
    tags=("relational", "statistics", "concentration"),
)
def rel_herfindahl_market(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    )
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum("price_c").cast("bigint").alias("rev_c"))
    )
    wtot = Window.partitionBy("nationkey")
    wrk = Window.partitionBy("nationkey").orderBy(
        F.col("rev_c").desc(), F.col("suppkey").asc()
    )
    b = rev.select(
        "nationkey",
        F.sum("rev_c").over(wtot).alias("tot_c"),
        F.row_number().over(wrk).alias("rk"),
        "rev_c",
    ).withColumn("share_bp", F.expr("(rev_c * 10000) DIV tot_c"))
    agg = b.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.max("tot_c").cast("bigint").alias("revenue_c"),
        F.expr("CAST(sum(share_bp * share_bp) DIV 10000 AS BIGINT)").alias(
            "hhi_bp"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("share_bp")))
        .cast("bigint")
        .alias("cr1_bp"),
        F.sum(F.when(F.col("rk") <= 4, F.col("share_bp")).otherwise(0))
        .cast("bigint")
        .alias("cr4_bp"),
    )
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return agg.join(
        F.broadcast(nat), agg.nationkey == nat.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        "revenue_c",
        "hhi_bp",
        "cr1_bp",
        "cr4_bp",
    )
