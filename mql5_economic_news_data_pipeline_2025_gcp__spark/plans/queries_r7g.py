"""Round-7 batch g: experimentation operations — the four checks an
A/B platform runs around every test: sample-ratio-mismatch detection,
power/MDE sizing, frequency-cap suppression simulation, and the
attribution-window sensitivity sweep.

Determinism: assignment reuses `evt_ab_assignment`'s salted md5 bucket
(identical digests both engines); the SRM rejection is an exact
integer cross-multiplied inequality (no float threshold); power/MDE
formulas are single identical trees over integer counts with quantile
constants as shared 17-digit literals.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: same salted-bucket rule as evt_ab_assignment (queries_r6b).
_SQL_BUCKET = """
      ('0x' || substr(md5('exp42:' || CAST(user_id AS VARCHAR)),
                      1, 8))::BIGINT % 100
"""


def _bucket_col():
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp42:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )


@register(
    "evt_srm_check",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id,
             CASE WHEN {_SQL_BUCKET} < 50 THEN 'A' ELSE 'B' END AS variant
      FROM events),
    c AS (
      SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM u)
    SELECT na, nb,
           CAST((na - nb) * (na - nb) AS DOUBLE)
             / CAST(na + nb AS DOUBLE) AS chi2,
           CAST(CASE WHEN 1000 * (na - nb) * (na - nb)
                          > 3841 * (na + nb)
                     THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM c
    """,
    description=(
        "sample-ratio-mismatch check for the 50/50 salted-md5 "
        "assignment (the guardrail that invalidates an experiment "
        "BEFORE anyone reads its metrics): χ² = (nA−nB)²/(nA+nB) "
        "with 1 df, and the α=0.05 rejection is the EXACT integer "
        "inequality 1000·(nA−nB)² > 3841·(nA+nB) (3.841 as a "
        "rational, no float threshold at the boundary). Shape: one "
        "distinct-user pass, one 1-row fold"
    ),
    tags=("events", "experimentation", "statistics"),
)
def evt_srm_check(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    u = ev.select("user_id").distinct().select(
        F.when(_bucket_col() < 50, "A").otherwise("B").alias("variant")
    )
    c = u.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
    )
    d = F.col("na") - F.col("nb")
    tot = F.col("na") + F.col("nb")
    return c.select(
        "na",
        "nb",
        (d.cast("double") * d.cast("double") / tot.cast("double")).alias(
            "chi2"
        ),
        F.when(1000 * d * d > 3841 * tot, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("srm_flag"),
    )


@register(
    "evt_power_analysis",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      FROM events),
    t AS (SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_total
          FROM ud),
    w AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_with
      FROM ud GROUP BY event_type),
    b AS (SELECT w.event_type, w.n_with, t.n_total,
                 CAST(w.n_with AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS p
          FROM w, t)
    SELECT event_type, n_with, n_total, p,
           ((1.9599639845400545 * sqrt(2.0 * ((p + p * 1.1) / 2.0)
                 * (1.0 - (p + p * 1.1) / 2.0))
             + 0.8416212335729143 * sqrt(p * (1.0 - p)
                 + (p * 1.1) * (1.0 - p * 1.1)))
            * (1.9599639845400545 * sqrt(2.0 * ((p + p * 1.1) / 2.0)
                 * (1.0 - (p + p * 1.1) / 2.0))
             + 0.8416212335729143 * sqrt(p * (1.0 - p)
                 + (p * 1.1) * (1.0 - p * 1.1))))
           / ((p * 1.1 - p) * (p * 1.1 - p)) AS n_required_per_arm,
           (1.9599639845400545 + 0.8416212335729143)
             * sqrt(2.0 * p * (1.0 - p)
                    / (CAST(n_total AS DOUBLE) / 2.0)) AS mde_at_n
    FROM b
    """,
    description=(
        "two-proportion power analysis per event type over (user, day) "
        "exposure units: with the observed daily-adoption rate p as "
        "baseline (user-level adoption saturates at 1.0 on this "
        "surface, which is exactly the degenerate case a sizing tool "
        "must avoid), the required units per arm to detect a 10% "
        "relative lift at α=0.05 / power 0.8 (z quantiles as shared "
        "17-digit literals), and the inverse — the minimum detectable "
        "effect at the CURRENT population split 50/50. Every number is "
        "one identical tree over two integer distinct counts; the "
        "experiment-sizing readout that prevents launching "
        "underpowered tests. Shape: one distinct pass feeds both "
        "aggregates, scalar cross join"
    ),
    tags=("events", "experimentation", "statistics"),
)
def evt_power_analysis(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    t_ = ud.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    w = ud.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_with")
    )
    b = w.crossJoin(t_).withColumn(
        "p", F.col("n_with").cast("double") / F.col("n_total").cast("double")
    )
    za = F.lit(1.9599639845400545)
    zb = F.lit(0.8416212335729143)
    p = F.col("p")
    p2 = p * F.lit(1.1)
    pbar = (p + p2) / F.lit(2.0)
    num_root = za * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar)) + zb * F.sqrt(
        p * (F.lit(1.0) - p) + p2 * (F.lit(1.0) - p2)
    )
    n_req = (num_root * num_root) / ((p2 - p) * (p2 - p))
    mde = (za + zb) * F.sqrt(
        F.lit(2.0)
        * p
        * (F.lit(1.0) - p)
        / (F.col("n_total").cast("double") / F.lit(2.0))
    )
    return b.select(
        "event_type",
        "n_with",
        "n_total",
        "p",
        n_req.alias("n_required_per_arm"),
        mde.alias("mde_at_n"),
    )


@register(
    "evt_frequency_cap_sim",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, user_id, CAST(ts AS DATE))
    SELECT event_type,
           CAST(sum(n) AS BIGINT) AS n_exposures,
           CAST(sum(least(n, 1)) AS BIGINT) AS kept_cap1,
           CAST(sum(least(n, 2)) AS BIGINT) AS kept_cap2,
           CAST(sum(least(n, 3)) AS BIGINT) AS kept_cap3,
           CAST(sum(least(n, 5)) AS BIGINT) AS kept_cap5,
           CAST(sum(n) - sum(least(n, 5)) AS DOUBLE)
             / CAST(sum(n) AS DOUBLE) AS suppressed_at_5
    FROM c GROUP BY event_type
    """,
    description=(
        "frequency-cap suppression simulation: with a per-(user, day) "
        "cap of k exposures, the kept volume is Σ min(c, k) over the "
        "per-user-day counts — evaluated for caps 1/2/3/5 in ONE pass "
        "so the ops team reads the whole suppression curve (and the "
        "fraction a cap of 5 would suppress) before choosing a policy. "
        "Exact integers end to end. Shape: one (type, user, day) "
        "count agg, one per-type fold — both map-side combined"
    ),
    tags=("events", "experimentation"),
)
def evt_frequency_cap_sim(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    c = ev.groupBy(
        "event_type", "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    kept = lambda k: F.sum(F.least(F.col("n"), F.lit(k))).cast("bigint")  # noqa: E731
    return c.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_exposures"),
        kept(1).alias("kept_cap1"),
        kept(2).alias("kept_cap2"),
        kept(3).alias("kept_cap3"),
        kept(5).alias("kept_cap5"),
        (
            (F.sum("n") - F.sum(F.least(F.col("n"), F.lit(5)))).cast("double")
            / F.sum("n").cast("double")
        ).alias("suppressed_at_5"),
    )


@register(
    "evt_conversion_window_sweep",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_type IN ('view', 'purchase')),
    nxt AS (
      SELECT user_id, event_type, ts,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_us
      FROM s),
    v AS (
      SELECT next_purchase_us - epoch_us(ts) AS delta_us
      FROM nxt WHERE event_type = 'view')
    SELECT CAST(count(*) AS BIGINT) AS n_views,
           CAST(sum(CASE WHEN delta_us <= 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS conv_1h,
           CAST(sum(CASE WHEN delta_us <= 21600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS conv_6h,
           CAST(sum(CASE WHEN delta_us <= 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS conv_24h
    FROM v
    """,
    description=(
        "attribution-window sensitivity sweep: for every view, the "
        "time to the user's NEXT purchase (one ordered window over the "
        "merged per-user stream — the as-of union trick, no pair "
        "join), then conversion counts under 1 h / 6 h / 24 h windows "
        "in one fold. The sweep is what reveals whether a reported "
        "conversion rate is an artifact of the window choice. Exact "
        "integer µs deltas. Shape: one series shuffle, one 1-row fold"
    ),
    tags=("events", "experimentation", "attribution"),
)
def evt_conversion_window_sweep(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        )
        .over(w)
        .alias("next_purchase_us"),
    )
    v = nxt.filter(F.col("event_type") == "view").select(
        (F.col("next_purchase_us") - F.col("ts_us")).alias("delta_us")
    )
    conv = lambda us: F.sum(  # noqa: E731
        F.when(F.col("delta_us") <= us, 1).otherwise(0)
    ).cast("bigint")
    return v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views"),
        conv(3_600_000_000).alias("conv_1h"),
        conv(21_600_000_000).alias("conv_6h"),
        conv(86_400_000_000).alias("conv_24h"),
    )
