"""Round-8 batch g: uplift evaluation.

``evt_qini_uplift`` — the Qini curve, the standard offline evaluation
for uplift/targeting models (did treating the users the model ranks
highest actually CAUSE more conversions than treating at random?).
Treatment is an md5 coin per user (engine-portable assignment), the
targeting score is each user's view count (rank by engagement), and
the curve reads cumulative treated/control conversions per decile.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_qini_uplift",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':qini'),
                                     1, 4)) AS BIGINT) % 2 AS treated,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS score,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY score DESC, user_id ASC) AS rk,
             count(*) OVER () AS n
      FROM u),
    b AS (SELECT *, (rk - 1) * 10 // n AS decile FROM r),
    g AS (
      SELECT decile,
             sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS nt,
             sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS nc,
             sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS yt,
             sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS yc
      FROM b GROUP BY decile),
    c AS (
      SELECT decile,
             CAST(sum(nt) OVER w AS BIGINT) AS cum_nt,
             CAST(sum(nc) OVER w AS BIGINT) AS cum_nc,
             CAST(sum(yt) OVER w AS BIGINT) AS cum_yt,
             CAST(sum(yc) OVER w AS BIGINT) AS cum_yc
      FROM g
      WINDOW w AS (ORDER BY decile))
    SELECT CAST(decile AS BIGINT) AS decile,
           cum_nt, cum_nc, cum_yt, cum_yc,
           round(CAST(cum_yt AS DOUBLE)
                 - CAST(cum_yc AS DOUBLE) * cum_nt / cum_nc, 6) AS qini
    FROM c
    """,
    description=(
        "Qini uplift curve — the offline evaluation an uplift/"
        "targeting model ships with: users ranked by the targeting "
        "score (view count here — rank-by-engagement, ties to "
        "user_id), md5-coin treatment assignment (engine-portable, "
        "balanced, reproducible), and per cumulative decile the Qini "
        "statistic q(k) = Yt(k) − Yc(k)·Nt(k)/Nc(k) — treated "
        "conversions in the model's top-k beyond what the control "
        "arm predicts at the same depth; a curve hugging zero means "
        "the model targets nobody persuadable. Integer cumulative "
        "counts carry all information; the one float term is an "
        "identical three-op sequence both engines. Shape: one "
        "per-user aggregate, a rank window over the USER frame "
        "(users-sized — the gains_table presentation contract), a "
        "10-row decile fold and cumulative windows on it"
    ),
    tags=("events", "experimentation", "evaluation"),
)
def evt_qini_uplift(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "score"
        ),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    ).withColumn(
        "treated",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":qini"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2,
    )
    wr = Window.orderBy(F.col("score").desc(), F.col("user_id").asc())
    r = u.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    b = r.withColumn("decile", F.expr("(rk - 1) * 10 div n"))
    g = b.groupBy("decile").agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0)).alias(
            "yt"
        ),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0)).alias(
            "yc"
        ),
    )
    wc = Window.orderBy("decile")
    c = g.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.sum("nt").over(wc).cast("bigint").alias("cum_nt"),
        F.sum("nc").over(wc).cast("bigint").alias("cum_nc"),
        F.sum("yt").over(wc).cast("bigint").alias("cum_yt"),
        F.sum("yc").over(wc).cast("bigint").alias("cum_yc"),
    )
    return c.select(
        "decile",
        "cum_nt",
        "cum_nc",
        "cum_yt",
        "cum_yc",
        F.round(
            F.col("cum_yt").cast("double")
            - F.col("cum_yc").cast("double") * F.col("cum_nt") / F.col("cum_nc"),
            6,
        ).alias("qini"),
    )
