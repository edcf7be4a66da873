"""Round-7 batch b: second statistics suite — nonparametric two-sample
comparison, robust variance homogeneity, serial-correlation diagnostics,
outlier testing, and binary repeated-measures — all with the registry's
integer-exact determinism contract.

Every query reduces the fact stream to exact integer sufficient
statistics before any division; the only doubles emitted are single
identical expression trees over those integers (bit-equal across
engines).  Patterns reused from rounds 5-6: value-HISTOGRAM ranks (the
Mann-Whitney U and group medians never sort the fact table), n-cleared
cross products, and the life-table artifact cut (Brown-Forsythe emits
the per-group sufficient statistics; the F assembly is pinned by the
pytest gate).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_mann_whitney_u",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
    hist AS (
      SELECT v,
             CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS a,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS b
      FROM s GROUP BY v),
    cum AS (
      SELECT a, b,
             coalesce(sum(b) OVER (ORDER BY v
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS b_below
      FROM hist),
    agg AS (
      SELECT CAST(sum(a) AS BIGINT) AS n1,
             CAST(sum(b) AS BIGINT) AS n2,
             CAST(sum(a * (2 * b_below + b)) AS BIGINT) AS u2,
             CAST(sum((a + b) * ((a + b) * (a + b) - 1)) AS BIGINT)
               AS tie_term
      FROM cum)
    SELECT n1, n2, u2, tie_term,
           CAST(u2 - n1 * n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)
             AS cliffs_delta
    FROM agg
    """,
    description=(
        "Mann-Whitney U between the view and purchase value "
        "distributions, exactly — U is computed from the VALUE "
        "HISTOGRAM (per-cent counts a/b, cumulative b below each "
        "value), never by ranking fact rows: 2U = Σ a·(2·cum_b + b) "
        "counts wins twice and ties once, so it stays integer. Output "
        "is one row of integer sufficient statistics (n1, n2, 2U, and "
        "the Σt(t²−1) tie-correction term the normal approximation "
        "needs) plus Cliff's delta = 2U/(n1·n2) − 1 as one identical "
        "division tree. Shape: one fact pass → histogram agg (bounded "
        "by distinct cent values, not rows), one ordered integer "
        "window over that histogram, one scalar fold"
    ),
    tags=("events", "statistics"),
)
def evt_mann_whitney_u(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("view", "purchase")
    )
    hist = ev.groupBy(F.col("value_c").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "a", "b", F.coalesce(F.sum("b").over(w), F.lit(0)).alias("b_below")
    )
    t = F.col("a") + F.col("b")
    agg = cum.agg(
        F.sum("a").cast("bigint").alias("n1"),
        F.sum("b").cast("bigint").alias("n2"),
        F.sum(F.col("a") * (2 * F.col("b_below") + F.col("b")))
        .cast("bigint")
        .alias("u2"),
        F.sum(t * (t * t - 1)).cast("bigint").alias("tie_term"),
    )
    return agg.select(
        "n1",
        "n2",
        "u2",
        "tie_term",
        (
            (F.col("u2") - F.col("n1") * F.col("n2")).cast("double")
            / (F.col("n1") * F.col("n2")).cast("double")
        ).alias("cliffs_delta"),
    )


@register(
    "evt_levene_median",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    hist AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY event_type, v),
    cum AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM hist),
    med AS (
      SELECT event_type,
             min(CASE WHEN cc >= (n + 1) // 2 THEN v END)
             + min(CASE WHEN cc >= (n + 2) // 2 THEN v END) AS med2
      FROM cum GROUP BY event_type)
    SELECT s.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(abs(2 * s.v - m.med2)) AS BIGINT) AS sz,
           CAST(sum((abs(2 * s.v - m.med2) * abs(2 * s.v - m.med2))
                    // 1048576) AS BIGINT) AS qz_hi,
           CAST(sum((abs(2 * s.v - m.med2) * abs(2 * s.v - m.med2))
                    % 1048576) AS BIGINT) AS qz_lo
    FROM s JOIN med m USING (event_type)
    GROUP BY s.event_type
    """,
    description=(
        "Brown-Forsythe (median-based Levene) variance-homogeneity "
        "sufficient statistics per event type: the group median comes "
        "from the value HISTOGRAM (doubled-median trick med2 = "
        "x_((n+1)/2) + x_((n+2)/2), so odd/even groups both stay "
        "integer), deviations are the doubled |2v − med2|, and each "
        "group emits exact n / Σz / Σz² — the life-table artifact cut: "
        "the F ratio over these 5 rows is assembled (and pinned "
        "against a numpy reference) by the pytest gate, because its "
        "between/within division is the only non-integer step. Σz² is "
        "emitted as two BIGINT halves (qz = qz_hi·2²⁰ + qz_lo, both "
        "per-row terms and their sums provably in int64 to ≥2⁴³ rows) "
        "so the final projection never carries a HUGEINT/decimal(38,0) "
        "column — the round-8 driver-red showed 128-bit outputs take "
        "environment-sensitive render paths. Shape: "
        "one histogram agg + per-type integer cumsum window (histogram"
        "-sized), broadcast the 5-row median table back, one agg"
    ),
    tags=("events", "statistics"),
)
def evt_levene_median(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    s = ev.select("event_type", F.col("value_c").alias("v"))
    hist = s.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "v",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(wn).alias("n"),
    )
    lo_rank = F.floor((F.col("n") + 1) / 2)
    hi_rank = F.floor((F.col("n") + 2) / 2)
    med = cum.groupBy("event_type").agg(
        (
            F.min(F.when(F.col("cc") >= lo_rank, F.col("v")))
            + F.min(F.when(F.col("cc") >= hi_rank, F.col("v")))
        ).alias("med2")
    )
    z = F.abs(2 * F.col("v") - F.col("med2"))
    # z <= ~2^19 for cent-scaled values, so z*z <= ~2^38 fits BIGINT
    # per row; the 2^20 hi/lo split keeps BOTH running sums in int64
    # out to >= 2^43 rows — no 128-bit column ever reaches the output
    z2 = (z * z).cast("bigint")
    return (
        s.join(F.broadcast(med), "event_type")
        .select("event_type", z.alias("z"), z2.alias("z2"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("z").cast("bigint").alias("sz"),
            F.sum(F.expr("z2 DIV 1048576")).cast("bigint").alias("qz_hi"),
            F.sum(F.col("z2") % 1048576).cast("bigint").alias("qz_lo"),
        )
    )


@register(
    "evt_durbin_watson",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    lagd AS (
      SELECT user_id, event_type, v,
             v - lag(v) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS d
      FROM s),
    agg AS (
      SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS qv,
             CAST(coalesce(sum(CAST(d AS HUGEINT) * d), 0) AS HUGEINT)
               AS num
      FROM lagd GROUP BY user_id, event_type)
    SELECT user_id, event_type, n,
           CAST(num AS BIGINT) AS dw_num,
           CAST(n * qv - CAST(sv AS HUGEINT) * sv AS BIGINT) AS dw_den_n,
           CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
             / CAST(n * qv - CAST(sv AS HUGEINT) * sv AS DOUBLE) AS dw
    FROM agg
    WHERE n >= 3 AND n * qv - CAST(sv AS HUGEINT) * sv > 0
    """,
    description=(
        "Durbin-Watson serial-correlation statistic per (user, "
        "event_type) series: DW = Σ(Δv)² / Σ(v − v̄)² with the mean "
        "cleared by n (denominator n·Σv² − S², numerator the exact "
        "integer sum of squared lag-1 differences — the mean cancels "
        "in Δ). DW ≈ 2 means no serial correlation, → 0 positive, → 4 "
        "negative; the training-data readout for whether a series' "
        "residual noise is exchangeable before windowed features are "
        "trusted. Integer numerator/denominator emitted alongside the "
        "one-tree double. Shape: one lag window and one aggregate, "
        "both on the (user, event_type) series key — the same single "
        "shuffle every series operator shares"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_durbin_watson(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    s = ev.select(
        "user_id", "event_type", "ts", "event_id", F.col("value_c").alias("v")
    )
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lagd = s.select(
        "user_id",
        "event_type",
        "v",
        (F.col("v") - F.lag("v").over(wo)).alias("d"),
    )
    dec = "decimal(38,0)"
    agg = lagd.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("v").cast(dec) * F.col("v")).cast(dec).alias("qv"),
        F.coalesce(F.sum(F.col("d").cast(dec) * F.col("d")), F.lit(0))
        .cast(dec)
        .alias("num"),
    )
    den = F.col("n") * F.col("qv") - F.col("sv").cast(dec) * F.col("sv")
    return agg.filter((F.col("n") >= 3) & (den > 0)).select(
        "user_id",
        "event_type",
        "n",
        F.col("num").cast("bigint").alias("dw_num"),
        den.cast("bigint").alias("dw_den_n"),
        (
            F.col("n").cast("double")
            * F.col("num").cast("double")
            / den.cast("double")
        ).alias("dw"),
    )


@register(
    "evt_grubbs_outlier",
    oracle="""
    WITH s AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    wstats AS (
      SELECT event_type, event_id, v,
             CAST(count(*) OVER p AS BIGINT) AS n,
             CAST(sum(v) OVER p AS BIGINT) AS sv,
             CAST(sum(CAST(v AS HUGEINT) * v) OVER p AS HUGEINT) AS qv
      FROM s WINDOW p AS (PARTITION BY event_type)),
    dev AS (
      SELECT event_type, event_id, v, n, sv, qv,
             abs(n * CAST(v AS HUGEINT) - sv) AS adev
      FROM wstats),
    best AS (
      SELECT event_type, event_id, v, n, adev, sv, qv,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY adev DESC, event_id ASC) AS rnk
      FROM dev)
    SELECT event_type, n,
           event_id AS outlier_event_id,
           v AS outlier_v,
           CAST(adev AS BIGINT) AS dev_n,
           (CAST(n - 1 AS DOUBLE)
            * (CAST(adev AS DOUBLE) * CAST(adev AS DOUBLE)))
           / (CAST(n AS DOUBLE)
              * CAST(n * qv - CAST(sv AS HUGEINT) * sv AS DOUBLE)) AS g2
    FROM best WHERE rnk = 1
    """,
    description=(
        "Grubbs single-outlier test per event type: the candidate is "
        "the exact integer argmax of |n·v − S| (mean-cleared by n, so "
        "no float mean ever exists; ties to the lower event_id), and "
        "G² = (n−1)·dev² / (n·(n·Σv² − S²)) is one identical tree over "
        "integer sufficient statistics — G² > ((n−1)²/n)·t²/(n−2+t²) "
        "is the textbook rejection readout. Shape: NO sort anywhere — "
        "a 5-row moment aggregate broadcasts back, and the argmax is a "
        "map-side-combined max(struct(adev, -event_id, ...)) hash "
        "aggregate (a window-lift rank here would sort the whole fact "
        "table by a 5-valued key; probed 2.3x at sf1 before the "
        "struct-argmax, flat after)"
    ),
    tags=("events", "statistics"),
)
def evt_grubbs_outlier(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    s = ev.select("event_type", "event_id", F.col("value_c").alias("v"))
    dec = "decimal(38,0)"
    moments = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("v").cast(dec) * F.col("v")).cast(dec).alias("qv"),
    )
    dev = s.join(F.broadcast(moments), "event_type").withColumn(
        "adev", F.abs(F.col("n") * F.col("v").cast(dec) - F.col("sv"))
    )
    # exact argmax without a sort: struct comparison picks max adev,
    # then (via the negated id) the LOWEST event_id among ties
    best = (
        dev.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.col("adev"),
                    (-F.col("event_id")).alias("neg_id"),
                    F.col("v"),
                    F.col("n"),
                    F.col("sv"),
                    F.col("qv"),
                )
            ).alias("b")
        )
        .select("event_type", "b.*")
    )
    den_n = F.col("n") * F.col("qv") - F.col("sv").cast(dec) * F.col("sv")
    return best.select(
        "event_type",
        "n",
        (-F.col("neg_id")).cast("bigint").alias("outlier_event_id"),
        F.col("v").alias("outlier_v"),
        F.col("adev").cast("bigint").alias("dev_n"),
        (
            (F.col("n") - 1).cast("double")
            * (F.col("adev").cast("double") * F.col("adev").cast("double"))
            / (F.col("n").cast("double") * den_n.cast("double"))
        ).alias("g2"),
    )


@register(
    "evt_cochran_q",
    oracle="""
    WITH x AS (
      SELECT DISTINCT user_id, week(CAST(ts AS DATE)) AS wk, event_type
      FROM events),
    r AS (
      SELECT user_id, wk, CAST(count(*) AS BIGINT) AS ri
      FROM x GROUP BY user_id, wk),
    rs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(ri) AS BIGINT) AS sum_r,
             CAST(sum(ri * ri) AS BIGINT) AS sum_r2
      FROM r),
    c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS cj
      FROM x GROUP BY event_type),
    cs AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(cj * cj) AS BIGINT) AS sum_c2
      FROM c)
    SELECT cs.k, rs.n_blocks, rs.sum_r, rs.sum_r2, cs.sum_c2,
           CAST((cs.k - 1) * (cs.k * cs.sum_c2 - rs.sum_r * rs.sum_r)
                AS BIGINT) AS q_num,
           CAST(cs.k * rs.sum_r - rs.sum_r2 AS BIGINT) AS q_den,
           CAST((cs.k - 1) * (cs.k * cs.sum_c2 - rs.sum_r * rs.sum_r)
                AS DOUBLE)
             / CAST(cs.k * rs.sum_r - rs.sum_r2 AS DOUBLE) AS q
    FROM rs, cs
    """,
    description=(
        "Cochran's Q for k related binary treatments: blocks are "
        "(user, ISO week) periods, treatments are the event types, "
        "x_ij = block i produced type j that week (user-level blocks "
        "saturate — every user eventually touches all 5 surfaces — "
        "which zeroes the Q denominator; weekly blocks keep real "
        "variation). Q = (k−1)·(k·ΣC_j² − (ΣC)²) / (k·ΣR_i − ΣR_i²) "
        "is a ratio of exact integers (column totals C_j, row totals "
        "R_i) — chi-square with k−1 df under exchangeability; the "
        "repeated-measures sibling of McNemar that asks whether usage "
        "mixes differ across surfaces within the same user-week. "
        "Shape: one distinct(user,week,type) pass feeds BOTH marginal "
        "aggregates; the two 1-row frames meet in a scalar cross join "
        "(scale-safe)"
    ),
    tags=("events", "statistics"),
)
def evt_cochran_q(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    x = ev.select(
        "user_id", F.weekofyear(F.to_date("ts")).alias("wk"), "event_type"
    ).distinct()
    r = x.groupBy("user_id", "wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("ri")
    )
    rs = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("ri").cast("bigint").alias("sum_r"),
        F.sum(F.col("ri") * F.col("ri")).cast("bigint").alias("sum_r2"),
    )
    c = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cj")
    )
    cs = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("cj") * F.col("cj")).cast("bigint").alias("sum_c2"),
    )
    j = rs.crossJoin(cs)
    q_num = (F.col("k") - 1) * (
        F.col("k") * F.col("sum_c2") - F.col("sum_r") * F.col("sum_r")
    )
    q_den = F.col("k") * F.col("sum_r") - F.col("sum_r2")
    return j.select(
        "k",
        "n_blocks",
        "sum_r",
        "sum_r2",
        "sum_c2",
        q_num.cast("bigint").alias("q_num"),
        q_den.cast("bigint").alias("q_den"),
        (q_num.cast("double") / q_den.cast("double")).alias("q"),
    )
