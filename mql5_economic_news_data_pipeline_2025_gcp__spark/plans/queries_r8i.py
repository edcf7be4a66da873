"""Round-8 batch i: triplet-mining statistics and forecast scaling.

- ``emb_semihard_triplets`` — the FaceNet semi-hard mining readout an
  embedding-training pipeline runs before picking a margin: for each
  anchor, the positive is its nearest same-label neighbor (exact
  integer L2), and negatives split into hard (closer than the
  positive), semi-hard (within margin past the positive — the ones
  the triplet loss actually learns from), and easy. Anchor set is
  bounded (vec_id < 64 — the twin convention); counts are exact.
- ``evt_mase_backtest`` — MASE, the scale-free forecast error the M
  competitions standardized: seasonal-naive (lag-7) model error
  scaled by the naive (lag-1) random-walk error, both as EXACT
  integer absolute-error sums over the daily series.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register

#: semi-hard margin in milli-L2² units (integer, shared literal).
_TRIPLET_MARGIN = 2_000_000


@register(
    "emb_semihard_triplets",
    oracle=f"""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings),
    lab AS (SELECT vec_id, label FROM embeddings WHERE vec_id < 2048),
    anch AS (SELECT vec_id FROM embeddings WHERE vec_id < 64),
    d AS (
      SELECT a.vec_id AS aid, b.vec_id AS bid,
             sum((va.x - vb.x) * (va.x - vb.x)) AS d2
      FROM anch a
      JOIN lab b ON b.vec_id <> a.vec_id
      JOIN ve va ON va.vec_id = a.vec_id
      JOIN ve vb ON vb.vec_id = b.vec_id AND vb.idx = va.idx
      GROUP BY a.vec_id, b.vec_id),
    dl AS (
      SELECT d.aid, d.bid, d.d2, la.label AS alab, lb.label AS blab
      FROM d
      JOIN lab la ON la.vec_id = d.aid
      JOIN lab lb ON lb.vec_id = d.bid),
    pos AS (
      SELECT aid, CAST(d2 AS BIGINT) AS dp FROM (
        SELECT aid, d2,
               row_number() OVER (PARTITION BY aid
                                  ORDER BY d2 ASC, bid ASC) AS rk
        FROM dl WHERE alab = blab) WHERE rk = 1),
    neg AS (
      SELECT dl.aid,
             CAST(count(*) AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN dl.d2 <= p.dp THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hard,
             CAST(sum(CASE WHEN dl.d2 > p.dp
                            AND dl.d2 <= p.dp + {_TRIPLET_MARGIN}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_semihard
      FROM dl JOIN pos p USING (aid)
      WHERE dl.alab <> dl.blab
      GROUP BY dl.aid)
    SELECT n.aid AS anchor_id, p.dp AS d2_pos,
           n.n_neg, n.n_hard, n.n_semihard,
           CAST(n.n_neg - n.n_hard - n.n_semihard AS BIGINT) AS n_easy
    FROM neg n JOIN pos p USING (aid)
    """,
    description=(
        "FaceNet-style triplet mining statistics — the readout an "
        "embedding-training pipeline reads before committing a "
        "margin: per anchor (bounded set, vec_id < 64 — the twin "
        "convention; production mines within ANN buckets), the "
        "positive is the nearest same-label vector by EXACT integer "
        "L2 (ties to the lower id), and every different-label vector "
        "classifies as hard (d ≤ d_pos: violates the loss outright), "
        "semi-hard (within the margin window past d_pos — the "
        "gradient-bearing band the loss actually mines), or easy. A "
        "margin with an empty semi-hard band trains nothing; a huge "
        "hard count means label noise. All counts exact integers; "
        "margin is a shared integer literal in milli-L2² units. "
        "Shape: one anchors×corpus broadcast distance pass, argmin "
        "per anchor, one classification aggregate"
    ),
    tags=("embeddings", "training", "similarity"),
)
def emb_semihard_triplets(spark, sf_dir):
    emb = (
        t(spark, sf_dir, "embeddings")
        # twin bound on BOTH sides (anchors < 64, candidates < 2048):
        # the distance pass is an interpreted HOF, so the work is held
        # fixed (64x2048) at any SF — production mining rides the
        # Arrow-batched ANN-bucket kernels
        .filter(F.col("vec_id") < 2048)
        .select("vec_id", "label", _qvec().alias("qv"))
    )
    anch = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("alab"),
        F.col("qv").alias("av"),
    )
    cand = emb.select(
        F.col("vec_id").alias("bid"),
        F.col("label").alias("blab"),
        F.col("qv").alias("bv"),
    )
    dl = (
        anch.join(F.broadcast(cand), F.col("aid") != F.col("bid"))
        .select(
            "aid",
            "bid",
            "alab",
            "blab",
            _int_d2_arr(F.col("av"), F.col("bv")).alias("d2"),
        )
        # anchors×corpus distance rows feed the positive argmin AND the
        # negative classification — derive once
        .localCheckpoint()
    )
    wpos = Window.partitionBy("aid").orderBy(F.col("d2").asc(), F.col("bid").asc())
    pos = (
        dl.filter(F.col("alab") == F.col("blab"))
        .withColumn("rk", F.row_number().over(wpos))
        .filter(F.col("rk") == 1)
        .select("aid", F.col("d2").alias("dp"))
    )
    neg = (
        dl.filter(F.col("alab") != F.col("blab"))
        .join(F.broadcast(pos), "aid")
        .groupBy("aid", "dp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_neg"),
            F.sum(F.when(F.col("d2") <= F.col("dp"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hard"),
            F.sum(
                F.when(
                    (F.col("d2") > F.col("dp"))
                    & (F.col("d2") <= F.col("dp") + _TRIPLET_MARGIN),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_semihard"),
        )
    )
    return neg.select(
        F.col("aid").alias("anchor_id"),
        F.col("dp").alias("d2_pos"),
        "n_neg",
        "n_hard",
        "n_semihard",
        (F.col("n_neg") - F.col("n_hard") - F.col("n_semihard"))
        .cast("bigint")
        .alias("n_easy"),
    )


@register(
    "evt_mase_backtest",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS t,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    l AS (
      SELECT event_type, t, x,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY t) AS x1,
             lag(x, 7) OVER (PARTITION BY event_type ORDER BY t) AS x7
      FROM d),
    s AS (
      SELECT event_type,
             CAST(count(CASE WHEN x7 IS NOT NULL THEN 1 END) AS BIGINT)
               AS n_scored,
             CAST(sum(CASE WHEN x7 IS NOT NULL THEN abs(x - x7) END)
                  AS BIGINT) AS sae_model,
             CAST(sum(CASE WHEN x7 IS NOT NULL THEN abs(x - x1) END)
                  AS BIGINT) AS sae_naive
      FROM l GROUP BY event_type)
    SELECT event_type, n_scored, sae_model, sae_naive,
           round(CAST(sae_model AS DOUBLE) / sae_naive, 6) AS mase
    FROM s
    """,
    description=(
        "MASE forecast backtest — the scale-free error the M "
        "competitions standardized, answering 'does seasonality help "
        "at all?': seasonal-naive (lag-7) absolute error scaled by "
        "the random-walk (lag-1) error over the SAME scored days; "
        "MASE < 1 means the weekly pattern beats pure persistence, "
        "> 1 means the 'model' is worse than doing nothing — the "
        "first gate any forecaster must pass before "
        "evt_walk_forward_mae's model comparison makes sense. Both "
        "error sums are EXACT integer cents (abs of integer "
        "differences); one identical division at the end. Shape: one "
        "daily rollup, lag windows on the ≤366-row series frame"
    ),
    tags=("events", "statistics", "evaluation", "timeseries"),
)
def evt_mase_backtest(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("t"),
    ).agg(F.sum("value_c").cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("t")
    l = d.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    s = l.groupBy("event_type").agg(
        F.count(F.when(F.col("x7").isNotNull(), 1))
        .cast("bigint")
        .alias("n_scored"),
        F.sum(
            F.when(F.col("x7").isNotNull(), F.abs(F.col("x") - F.col("x7")))
        )
        .cast("bigint")
        .alias("sae_model"),
        F.sum(
            F.when(F.col("x7").isNotNull(), F.abs(F.col("x") - F.col("x1")))
        )
        .cast("bigint")
        .alias("sae_naive"),
    )
    return s.select(
        "event_type",
        "n_scored",
        "sae_model",
        "sae_naive",
        F.round(
            F.col("sae_model").cast("double") / F.col("sae_naive"), 6
        ).alias("mase"),
    )
