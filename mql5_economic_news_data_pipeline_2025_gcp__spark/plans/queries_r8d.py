"""Round-8 batch d: distributional distance, 1-bit ANN, and PACF.

- ``evt_wasserstein_1d`` — exact 1-D earth-mover's distance between
  the weekend and weekday value distributions per event_type, from
  cross-multiplied integer CDFs over the value histogram (the L1
  companion to evt_ks_drift's sup-norm — KS says IF two cohorts
  differ, W1 says by HOW MUCH in value units).
- ``emb_binary_quantization_topk`` — 1-bit ANN (the
  64×-compression path real vector stores ship alongside PQ): one
  sign bit per dimension packs each vector into a single 64-bit
  word, candidates come from Hamming distance on the words, and the
  top-50 survivors are re-ranked by EXACT integer L2 — the standard
  BQ + rescore pipeline, hash-checkable end to end.
- ``evt_pacf_yw`` — partial autocorrelation at lags 1/2 via
  Yule-Walker on the daily value series: autocovariance sufficient
  statistics computed EXACTLY in decimal (the mean-clearing-by-n²
  recipe), then one identical decimal→double cast per statistic
  before the Durbin ratios — the float sequence is the same five
  ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register


@register(
    "evt_wasserstein_1d",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN EXTRACT(isodow FROM ts) >= 6 THEN 1 ELSE 0 END AS wk
      FROM events WHERE value IS NOT NULL),
    h AS (
      SELECT event_type, v,
             sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS cb
      FROM base GROUP BY event_type, v),
    c AS (
      SELECT event_type, v,
             sum(ca) OVER (PARTITION BY event_type ORDER BY v) AS fa,
             sum(cb) OVER (PARTITION BY event_type ORDER BY v) AS fb,
             sum(ca) OVER (PARTITION BY event_type) AS na,
             sum(cb) OVER (PARTITION BY event_type) AS nb,
             lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nxt
      FROM h),
    agg AS (
      SELECT event_type,
             CAST(max(na) AS BIGINT) AS n_weekend,
             CAST(max(nb) AS BIGINT) AS n_weekday,
             CAST(sum(CASE WHEN nxt IS NULL THEN 0
                           ELSE abs(fa * nb - fb * na) * (nxt - v)
                      END) AS BIGINT) AS w1_num
      FROM c GROUP BY event_type)
    SELECT event_type, n_weekend, n_weekday, w1_num,
           round(CAST(w1_num AS DOUBLE)
                 / (CAST(n_weekend AS DOUBLE) * n_weekday) / 100.0, 6)
             AS w1
    FROM agg
    """,
    description=(
        "exact 1-D Wasserstein (earth-mover's) distance between the "
        "weekend and weekday value distributions per event_type — the "
        "L1 drift magnitude in actual value units that evt_ks_drift's "
        "sup-norm verdict lacks (KS fires on ANY shape difference; W1 "
        "prices it): W1 = Σ |F_A − F_B| over the support, computed as "
        "the INTEGER numerator Σ |fa·nb − fb·na|·gap on the value "
        "HISTOGRAM (cross-multiplied CDFs — no float ranks, no "
        "boundary drift; bigint-safe to ~sf10, the histogram recipe's "
        "documented envelope), one identical division pair at the "
        "end. Shape: one (type, value) count agg collapses facts to "
        "distinct values; cumulative/lead windows run on the "
        "histogram frame, never raw rows — the evt_rank_auc contract"
    ),
    tags=("events", "statistics", "drift"),
)
def evt_wasserstein_1d(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    iso_dow = F.when(F.dayofweek("ts") == 1, 7).otherwise(F.dayofweek("ts") - 1)
    base = ev.select(
        "event_type",
        F.col("value_c").alias("v"),
        F.when(iso_dow >= 6, 1).otherwise(0).alias("wk"),
    )
    h = base.groupBy("event_type", "v").agg(
        F.sum(F.when(F.col("wk") == 1, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("wk") == 0, 1).otherwise(0)).alias("cb"),
    )
    wcum = Window.partitionBy("event_type").orderBy("v")
    wall = Window.partitionBy("event_type")
    c = h.select(
        "event_type",
        "v",
        F.sum("ca").over(wcum).alias("fa"),
        F.sum("cb").over(wcum).alias("fb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
        F.lead("v").over(wcum).alias("nxt"),
    )
    agg = c.groupBy("event_type").agg(
        F.max("na").cast("bigint").alias("n_weekend"),
        F.max("nb").cast("bigint").alias("n_weekday"),
        F.sum(
            F.when(F.col("nxt").isNull(), 0).otherwise(
                F.abs(F.col("fa") * F.col("nb") - F.col("fb") * F.col("na"))
                * (F.col("nxt") - F.col("v"))
            )
        )
        .cast("bigint")
        .alias("w1_num"),
    )
    return agg.select(
        "event_type",
        "n_weekend",
        "n_weekday",
        "w1_num",
        F.round(
            F.col("w1_num").cast("double")
            / (F.col("n_weekend").cast("double") * F.col("n_weekday"))
            / F.lit(100.0),
            6,
        ).alias("w1"),
    )


#: shared milli-quantized component CTE (the r6/r7a vector recipe).
_SQL_VE = """
    ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings)
"""


@register(
    "emb_binary_quantization_topk",
    oracle=f"""
    WITH {_SQL_VE},
    sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN x <= 0 THEN 0
                           WHEN idx = 64 THEN -9223372036854775808
                           ELSE CAST(1 AS BIGINT) << (idx - 1) END)
                  AS BIGINT) AS sg
      FROM ve GROUP BY vec_id),
    q AS (SELECT sg AS qs FROM sig WHERE vec_id = 4),
    cand AS (
      SELECT s.vec_id, bit_count(xor(s.sg, q.qs)) AS hamming
      FROM sig s, q WHERE s.vec_id >= 8
      ORDER BY hamming ASC, s.vec_id ASC LIMIT 50),
    d AS (
      SELECT c.vec_id, c.hamming,
             sum((v.x - qv.x) * (v.x - qv.x)) AS d2
      FROM cand c
      JOIN ve v ON v.vec_id = c.vec_id
      JOIN ve qv ON qv.idx = v.idx AND qv.vec_id = 4
      GROUP BY c.vec_id, c.hamming),
    top AS (
      SELECT vec_id AS neighbor_id, CAST(hamming AS BIGINT) AS hamming,
             CAST(d2 AS BIGINT) AS d2
      FROM d ORDER BY d2 ASC, vec_id ASC LIMIT 10)
    SELECT CAST(row_number() OVER (ORDER BY d2 ASC, neighbor_id ASC)
                AS BIGINT) AS rank,
           neighbor_id, hamming, d2
    FROM top
    """,
    description=(
        "1-bit binary-quantization ANN with exact rescore — the 64× "
        "compression path production vector stores run next to PQ: "
        "each 64-dim vector packs into ONE 64-bit word (sign bit per "
        "dimension over milli-quantized components; bit 64 enters as "
        "−2^63, the two's-complement fold proven by the phash twin), "
        "candidate generation is integer Hamming via bit_count(xor) "
        "against query vec 4's word, and the top-50 Hamming survivors "
        "are re-ranked by EXACT integer L2 — the standard BQ+rescore "
        "pipeline, hash-checkable end to end. Shape: signature build "
        "is map-side (one word per vector — at 100 TB the index is "
        "|vectors|×8 bytes); Hamming is TakeOrdered(50), the exact "
        "rerank touches 50 vectors via broadcast, never the corpus"
    ),
    tags=("embeddings", "similarity", "quantization"),
)
def emb_binary_quantization_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    # signed powers of two as a plan literal (bit 63 enters as −2^63,
    # so the fold lands exactly on the two's-complement word)
    powers = F.array(
        *[
            F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("bigint")
            for i in range(64)
        ]
    )
    word = F.aggregate(
        F.zip_with(
            F.col("qv"),
            powers,
            lambda x, p: F.when(x <= 0, F.lit(0).cast("bigint")).otherwise(p),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    sig = emb.select("vec_id", "qv", word.alias("sg")).localCheckpoint()
    q = sig.filter(F.col("vec_id") == 4).select(
        F.col("sg").alias("qs"), F.col("qv").alias("qvec")
    )
    cand = (
        sig.filter(F.col("vec_id") >= 8)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "qv",
            "qvec",
            F.bit_count(F.col("sg").bitwiseXOR(F.col("qs"))).alias("hamming"),
        )
        .orderBy(F.col("hamming").asc(), F.col("vec_id").asc())
        .limit(50)
    )
    d = cand.select(
        "vec_id",
        F.col("hamming").cast("bigint").alias("hamming"),
        _int_d2_arr(F.col("qv"), F.col("qvec")).alias("d2"),
    )
    top = d.orderBy(F.col("d2").asc(), F.col("vec_id").asc()).limit(10)
    w = Window.orderBy(F.col("d2").asc(), F.col("neighbor_id").asc())
    return (
        top.select(
            F.col("vec_id").alias("neighbor_id"), "hamming", "d2"
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("rank", "neighbor_id", "hamming", "d2")
    )


@register(
    "evt_pacf_yw",
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
             lag(x, 2) OVER (PARTITION BY event_type ORDER BY t) AS x2
      FROM d),
    s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CASE WHEN x1 IS NOT NULL
                           THEN CAST(x AS HUGEINT) * x1 END) AS HUGEINT)
               AS sxy1,
             CAST(sum(CASE WHEN x2 IS NOT NULL
                           THEN CAST(x AS HUGEINT) * x2 END) AS HUGEINT)
               AS sxy2
      FROM l GROUP BY event_type),
    f AS (
      SELECT event_type,
             CAST(n AS BIGINT) AS n_days,
             CAST(n * sxx - sx * sx AS DOUBLE) AS c0,
             CAST(n * sxy1 - sx * sx AS DOUBLE) AS c1,
             CAST(n * sxy2 - sx * sx AS DOUBLE) AS c2
      FROM s)
    SELECT event_type, n_days,
           round(c1 / c0, 6) AS phi11,
           round((c0 * c2 - c1 * c1) / (c0 * c0 - c1 * c1), 6) AS phi22
    FROM f
    """,
    description=(
        "partial autocorrelation at lags 1 and 2 via Yule-Walker / "
        "Durbin on the daily value series — the statistic that "
        "separates a true AR(2) from an AR(1) whose lag-2 "
        "autocorrelation is just φ² echo (what evt_autocorrelation "
        "alone cannot tell), i.e. how many lag features a forecaster "
        "actually needs. Autocovariance sufficient statistics are "
        "EXACT 128-bit integers (HUGEINT / Spark decimal(38,0)) in "
        "the mean-clearing form n·Σxy − (Σx)², then ONE identical "
        "int→double cast per statistic feeds the Durbin ratios — the "
        "float tail is the same five-op sequence in both engines "
        "(circular-ish approximation: the shared Σx is used for both "
        "series ends; documented, identical both sides). Shape: one "
        "daily rollup, lag windows on the ≤366-row series frame, one "
        "5-row readout"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_pacf_yw(spark, sf_dir):
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
        F.lag("x", 2).over(w).alias("x2"),
    )
    dec = "decimal(38,0)"
    s = l.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(
            F.when(
                F.col("x1").isNotNull(), F.col("x").cast(dec) * F.col("x1")
            )
        )
        .cast(dec)
        .alias("sxy1"),
        F.sum(
            F.when(
                F.col("x2").isNotNull(), F.col("x").cast(dec) * F.col("x2")
            )
        )
        .cast(dec)
        .alias("sxy2"),
    )
    f = s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("c0"),
        (F.col("n") * F.col("sxy1") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("c1"),
        (F.col("n") * F.col("sxy2") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("c2"),
    )
    return f.select(
        "event_type",
        "n_days",
        F.round(F.col("c1") / F.col("c0"), 6).alias("phi11"),
        F.round(
            (F.col("c0") * F.col("c2") - F.col("c1") * F.col("c1"))
            / (F.col("c0") * F.col("c0") - F.col("c1") * F.col("c1")),
            6,
        ).alias("phi22"),
    )
