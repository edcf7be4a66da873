"""Round-8 batch h: two-level binary segmentation.

``evt_changepoint_binseg2`` — the recursive step `evt_changepoint_sse`
documents but does not execute: after the best global split, each half
is split again by the same between-segment SSE criterion, yielding the
depth-2 segmentation tree (up to 4 regimes). The recursion stays
O(|days|) per level with the fact table touched ONCE — the property
that makes binary segmentation the 100 TB changepoint method.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_changepoint_binseg2",
    oracle=r"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS s_c,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    c AS (
      SELECT day,
             sum(s_c) OVER (ORDER BY day) AS lsum,
             sum(n) OVER (ORDER BY day) AS lcnt,
             sum(s_c) OVER () AS tsum,
             sum(n) OVER () AS tcnt
      FROM d),
    b1 AS (
      SELECT day AS k1, lsum AS s1, lcnt AS n1,
             tsum - lsum AS rs1, tcnt - lcnt AS rn1
      FROM c WHERE tcnt - lcnt > 0
      ORDER BY CAST(lsum AS DOUBLE) * lsum / lcnt
               + CAST(tsum - lsum AS DOUBLE) * (tsum - lsum)
                 / (tcnt - lcnt) DESC, day ASC
      LIMIT 1),
    lefts AS (
      SELECT c.day, c.lsum, c.lcnt, b1.s1, b1.n1
      FROM c, b1 WHERE c.day < b1.k1 AND b1.n1 - c.lcnt > 0),
    bl AS (
      SELECT day AS split_day,
             CAST(lsum AS BIGINT) AS left_sum_c,
             CAST(lcnt AS BIGINT) AS left_n,
             CAST(s1 - lsum AS BIGINT) AS right_sum_c,
             CAST(n1 - lcnt AS BIGINT) AS right_n,
             CAST(lsum AS DOUBLE) * lsum / lcnt
               + CAST(s1 - lsum AS DOUBLE) * (s1 - lsum) / (n1 - lcnt)
                 AS objective
      FROM lefts
      ORDER BY objective DESC, split_day ASC LIMIT 1),
    rights AS (
      SELECT c.day, c.lsum - b1.s1 AS lsum, c.lcnt - b1.n1 AS lcnt,
             b1.rs1, b1.rn1
      FROM c, b1
      WHERE c.day > b1.k1 AND c.lcnt - b1.n1 > 0
        AND b1.rn1 - (c.lcnt - b1.n1) > 0),
    br AS (
      SELECT day AS split_day,
             CAST(lsum AS BIGINT) AS left_sum_c,
             CAST(lcnt AS BIGINT) AS left_n,
             CAST(rs1 - lsum AS BIGINT) AS right_sum_c,
             CAST(rn1 - lcnt AS BIGINT) AS right_n,
             CAST(lsum AS DOUBLE) * lsum / lcnt
               + CAST(rs1 - lsum AS DOUBLE) * (rs1 - lsum) / (rn1 - lcnt)
                 AS objective
      FROM rights
      ORDER BY objective DESC, split_day ASC LIMIT 1)
    SELECT 'root' AS segment, k1 AS split_day,
           CAST(s1 AS BIGINT) AS left_sum_c, CAST(n1 AS BIGINT) AS left_n,
           CAST(rs1 AS BIGINT) AS right_sum_c, CAST(rn1 AS BIGINT) AS right_n,
           round(CAST(s1 AS DOUBLE) * s1 / n1
                 + CAST(rs1 AS DOUBLE) * rs1 / rn1, 6) AS objective
    FROM b1
    UNION ALL
    SELECT 'left', split_day, left_sum_c, left_n, right_sum_c, right_n,
           round(objective, 6) FROM bl
    UNION ALL
    SELECT 'right', split_day, left_sum_c, left_n, right_sum_c, right_n,
           round(objective, 6) FROM br
    """,
    description=(
        "depth-2 binary segmentation of the daily value series — the "
        "recursion evt_changepoint_sse documents: the best global SSE "
        "split, then the best split WITHIN each half by the same "
        "L²/n_l + R²/n_r criterion, yielding up to four regimes (the "
        "CART-style segmentation tree a regime-aware forecaster "
        "consumes). Each level's candidate sweep rides the SAME "
        "day-grain cumulative frame — segment-local sums are "
        "differences of global cumulative sums against the broadcast "
        "1-row parent split, so the fact table is touched ONCE for "
        "the whole tree and each level is O(|days|) window "
        "arithmetic. Exact integer segment sums/counts; objectives "
        "are identical expression trees on identical integers; "
        "argmax ties to the earlier day"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_changepoint_binseg2(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value_c").alias("s_c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    wcum = Window.orderBy("day")
    wall = Window.partitionBy()
    c = d.select(
        "day",
        F.sum("s_c").over(wcum).alias("lsum"),
        F.sum("n").over(wcum).alias("lcnt"),
        F.sum("s_c").over(wall).alias("tsum"),
        F.sum("n").over(wall).alias("tcnt"),
    ).localCheckpoint()  # day-grain frame; feeds the root + both children

    def argmax1(df, obj_col):
        return (
            df.withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(F.desc(obj_col), F.asc("day"))
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    root_obj = (
        F.col("lsum").cast("double") * F.col("lsum") / F.col("lcnt")
        + (F.col("tsum") - F.col("lsum")).cast("double")
        * (F.col("tsum") - F.col("lsum"))
        / (F.col("tcnt") - F.col("lcnt"))
    )
    b1 = argmax1(
        c.filter(F.col("tcnt") - F.col("lcnt") > 0).withColumn(
            "obj", root_obj
        ),
        "obj",
    ).select(
        F.col("day").alias("k1"),
        F.col("lsum").alias("s1"),
        F.col("lcnt").alias("n1"),
        (F.col("tsum") - F.col("lsum")).alias("rs1"),
        (F.col("tcnt") - F.col("lcnt")).alias("rn1"),
    )
    withp = c.crossJoin(F.broadcast(b1))
    child_obj = (
        F.col("ls").cast("double") * F.col("ls") / F.col("ln")
        + F.col("rs").cast("double") * F.col("rs") / F.col("rn_")
    )
    lefts = (
        withp.filter(
            (F.col("day") < F.col("k1")) & (F.col("n1") - F.col("lcnt") > 0)
        )
        .select(
            "day",
            F.col("lsum").alias("ls"),
            F.col("lcnt").alias("ln"),
            (F.col("s1") - F.col("lsum")).alias("rs"),
            (F.col("n1") - F.col("lcnt")).alias("rn_"),
        )
        .withColumn("obj", child_obj)
    )
    rights = (
        withp.filter(
            (F.col("day") > F.col("k1"))
            & (F.col("lcnt") - F.col("n1") > 0)
            & (F.col("rn1") - (F.col("lcnt") - F.col("n1")) > 0)
        )
        .select(
            "day",
            (F.col("lsum") - F.col("s1")).alias("ls"),
            (F.col("lcnt") - F.col("n1")).alias("ln"),
            (F.col("rs1") - (F.col("lsum") - F.col("s1"))).alias("rs"),
            (F.col("rn1") - (F.col("lcnt") - F.col("n1"))).alias("rn_"),
        )
        .withColumn("obj", child_obj)
    )

    def emit(df, seg):
        return df.select(
            F.lit(seg).alias("segment"),
            F.col("day").alias("split_day"),
            F.col("ls").cast("bigint").alias("left_sum_c"),
            F.col("ln").cast("bigint").alias("left_n"),
            F.col("rs").cast("bigint").alias("right_sum_c"),
            F.col("rn_").cast("bigint").alias("right_n"),
            F.round("obj", 6).alias("objective"),
        )

    root = b1.select(
        F.lit("root").alias("segment"),
        F.col("k1").alias("split_day"),
        F.col("s1").cast("bigint").alias("left_sum_c"),
        F.col("n1").cast("bigint").alias("left_n"),
        F.col("rs1").cast("bigint").alias("right_sum_c"),
        F.col("rn1").cast("bigint").alias("right_n"),
        F.round(
            F.col("s1").cast("double") * F.col("s1") / F.col("n1")
            + F.col("rs1").cast("double") * F.col("rs1") / F.col("rn1"),
            6,
        ).alias("objective"),
    )
    return root.unionByName(emit(argmax1(lefts, "obj"), "left")).unionByName(
        emit(argmax1(rights, "obj"), "right")
    )
