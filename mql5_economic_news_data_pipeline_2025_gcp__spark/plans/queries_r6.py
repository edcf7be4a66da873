"""Round-6 additions.

Opens with the hash-checkable IVF-PQ twin the round-5 verdict asked
for: ``emb_ivfpq_residual_topk`` is rows-only by construction (its
codebooks are k-means-fit), so ``emb_ivfpq_residual_check`` re-runs the
IDENTICAL dataflow — coarse cells, residual encoding, per-(query,
probed-cell) ADC lookup tables, integer scoring, exact top-k — with
DETERMINISTIC data-derived codebooks (donor-vector residuals) and
pure-integer arithmetic end-to-end, so DuckDB can replay it and the
family earns a real hash-matched driver row.

All entries follow the determinism contract in ``registry``.  None
exist in the reference (a pandas/MySQL pipeline); they are Spark-first
extensions of its analytics surface (SURVEY §2.8/§2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register


@register(
    "emb_ivfpq_residual_check",
    oracle="""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings),
    cent AS (SELECT vec_id AS cid, idx, x AS cx FROM ve WHERE vec_id < 8),
    ad AS (
      SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS d2
      FROM ve v JOIN cent c USING (idx)
      WHERE v.vec_id >= 8
      GROUP BY v.vec_id, c.cid),
    cellr AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2 ASC, cid ASC) AS rnk
      FROM ad),
    cella AS (SELECT vec_id, cid AS cell FROM cellr WHERE rnk = 1),
    res AS (
      SELECT v.vec_id, v.idx, v.x - c.cx AS w, a.cell
      FROM ve v
      JOIN cella a ON a.vec_id = v.vec_id
      JOIN cent c ON c.cid = a.cell AND c.idx = v.idx),
    cw AS (
      SELECT CAST((idx - 1) // 8 AS INT) AS j,
             CAST(vec_id - 8 AS INT) AS code, idx, w
      FROM res WHERE vec_id >= 8 AND vec_id < 24),
    encd AS (
      SELECT r.vec_id, k.j, k.code, sum((r.w - k.w) * (r.w - k.w)) AS d2
      FROM res r JOIN cw k USING (idx)
      GROUP BY r.vec_id, k.j, k.code),
    encr AS (
      SELECT vec_id, j, code,
             row_number() OVER (PARTITION BY vec_id, j
                                ORDER BY d2 ASC, code ASC) AS rnk
      FROM encd),
    codes AS (SELECT vec_id, j, code FROM encr WHERE rnk = 1),
    probe AS (
      SELECT vec_id AS query_id, cid AS pcell
      FROM cellr WHERE vec_id >= 8 AND vec_id < 28 AND rnk <= 2),
    qr AS (
      SELECT p.query_id, p.pcell, v.idx, v.x - c.cx AS w
      FROM probe p
      JOIN ve v ON v.vec_id = p.query_id
      JOIN cent c ON c.cid = p.pcell AND c.idx = v.idx),
    lut AS (
      SELECT q.query_id, q.pcell, k.j, k.code,
             sum((q.w - k.w) * (q.w - k.w)) AS d2
      FROM qr q JOIN cw k USING (idx)
      GROUP BY q.query_id, q.pcell, k.j, k.code),
    scored AS (
      SELECT l.query_id, c0.vec_id AS neighbor_id,
             CAST(sum(l.d2) AS BIGINT) AS adc_d2
      FROM codes c0
      JOIN cella a ON a.vec_id = c0.vec_id
      JOIN lut l ON l.pcell = a.cell AND l.j = c0.j AND l.code = c0.code
      WHERE c0.vec_id != l.query_id
      GROUP BY l.query_id, c0.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, adc_d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_d2 ASC, neighbor_id ASC)
               AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    description=(
        "hash-checkable IVF-PQ twin of emb_ivfpq_residual_topk: the "
        "SAME dataflow — 8 coarse cells, residual (v − cell centroid) "
        "encoding into 8 subspaces × 16 codes, nprobe=2 probing, "
        "per-(query, probed-cell) ADC lookup rows on one tiny "
        "broadcast, integer ADC ordering, exact top-5 with id "
        "tie-breaks — but with DETERMINISTIC codebooks (residual "
        "subvectors of donor vectors 8..23 under the same cell "
        "assignment) instead of k-means-fit ones, and every distance "
        "an exact BIGINT (vectors quantized once to milli-units via "
        "round(x·1000), a single IEEE op + identical rounding rule in "
        "both engines; everything after is integer sums — no float "
        "ever enters a ranking). Scale shape is the real one: "
        "centroid/codeword tables ship inside one Arrow-batched "
        "integer numpy kernel (KBs of closure), corpus "
        "cell-assignment + encoding is a single map-only pandas_udf "
        "pass (int64 sums — exact in any order; a pure-literal "
        "expression form measured 10× slower, blowing past codegen "
        "limits into interpreted eval), the LUT broadcast is "
        "|queries|·nprobe rows, candidate scoring is a broadcast join "
        "on cell — the corpus never shuffles until the per-query "
        "top-k window over |candidates|. The production path with "
        "fitted codebooks (operators/pq.py::ivfpq_topk_residual) "
        "keeps its recall gate; this twin proves the ADC mechanics "
        "against an independent engine"
    ),
    tags=("embeddings", "similarity", "pq", "ivf"),
)
def emb_ivfpq_residual_check(spark, sf_dir):
    from ..operators.pq import bounded_collect

    NCELL, NCODE, M, SUB, NPROBE, TOPK = 8, 16, 8, 8, 2, 5
    QMAX = 28  # queries are corpus vectors 8..27

    emb = t(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * F.lit(1000.0), 0).cast("bigint"),
    )
    base = emb.select("vec_id", quant.alias("qv"))

    # centroids + codeword donors + queries: 28 rows, driver-bounded
    small = bounded_collect(
        base.filter(F.col("vec_id") < QMAX), "ivfpq_check head vectors"
    )
    vecs = {r["vec_id"]: list(r["qv"]) for r in small}
    C = [vecs[i] for i in range(NCELL)]

    def d2(a, b):
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    def assign(v):
        ds = [d2(v, c) for c in C]
        return min(range(NCELL), key=lambda i: (ds[i], i))

    # codebooks: donor residuals under the donor's own cell assignment
    books = []
    dres = [
        [vecs[8 + code][i] - C[assign(vecs[8 + code])][i]
         for i in range(M * SUB)]
        for code in range(NCODE)
    ]
    for j in range(M):
        books.append([r[j * SUB : (j + 1) * SUB] for r in dres])

    # ---- corpus: map-only cell assignment + residual + PQ codes.
    # One Arrow-batched integer numpy kernel (a literal-expression form
    # measured 10× slower: 8·64 + 128·8 subtract-squares per row pushed
    # the projection past codegen limits into interpreted eval). int64
    # adds are exact in any order, so the kernel is hash-identical to
    # the oracle's relational form.
    from pyspark.sql.functions import pandas_udf

    C_np = np.asarray(C, dtype=np.int64)          # 8 × 64
    B_np = np.asarray(
        [books[j] for j in range(M)], dtype=np.int64
    )                                             # m × k × sub

    @pandas_udf("array<int>")
    def enc_udf(col: pd.Series) -> pd.Series:
        # element 0 = cell id, elements 1..m = PQ codes
        X = np.array([np.asarray(v, dtype=np.int64) for v in col])
        if not len(X):
            return pd.Series([], dtype=object)
        d2c = ((X[:, None, :] - C_np[None, :, :]) ** 2).sum(axis=2)
        cell = d2c.argmin(axis=1)                 # first min = lowest cid
        R = X - C_np[cell]
        out = np.empty((len(X), M + 1), dtype=np.int32)
        out[:, 0] = cell
        for j in range(M):
            S = R[:, j * SUB : (j + 1) * SUB]
            d2b = ((S[:, None, :] - B_np[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j + 1] = d2b.argmin(axis=1)    # first min = lowest code
        return pd.Series(list(out))

    enc = (
        base.filter(F.col("vec_id") >= NCELL)
        .select("vec_id", enc_udf("qv").alias("e"))
        .select(
            "vec_id",
            F.element_at("e", 1).alias("cell"),
            *[
                F.element_at("e", j + 2).alias(f"code_{j}")
                for j in range(M)
            ],
        )
    )

    # ---- query LUTs: |queries|·nprobe rows of m×k integer tables ----
    luts_rows = []
    for qid in range(NCELL, QMAX):
        v = vecs[qid]
        order = sorted((d2(v, c), i) for i, c in enumerate(C))
        for _, p in order[:NPROBE]:
            qres = [v[i] - C[p][i] for i in range(M * SUB)]
            luts = [
                [d2(qres[j * SUB : (j + 1) * SUB], w) for w in books[j]]
                for j in range(M)
            ]
            luts_rows.append((qid, p, luts))
    lut_df = F.broadcast(
        spark.createDataFrame(
            luts_rows, "query_id long, cell int, luts array<array<bigint>>"
        )
    )

    score = None
    for j in range(M):
        term = F.element_at(
            F.element_at("luts", j + 1), F.col(f"code_{j}") + 1
        )
        score = term if score is None else score + term
    pairs = (
        enc.join(lut_df, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            score.cast("bigint").alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "adc_d2", "rnk")
    )


# ---------------------------------------------------------------------------
# Market-analytics family: the reference pipeline feeds MQL5 economic-news
# series into trading models (SURVEY §1) — these are the standard
# price/flow indicators computed ON the engine rather than in the trading
# terminal: running drawdown, Bollinger bands, RSI, and an event-study
# cumulative abnormal return around high-impact days. All integer-exact:
# rolling sums/counts/extremes are BIGINT cents; every division or sqrt
# is a final presentation step with an IDENTICAL expression tree on both
# engines (sqrt is IEEE-exact, correctly rounded in both JVM and libm).
# ---------------------------------------------------------------------------


@register(
    "evt_drawdown",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    c0 AS (
      SELECT user_id, event_type, ts, event_id,
             sum(v) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM s),
    c AS (
      SELECT user_id, event_type, cum,
             max(cum) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS peak
      FROM c0)
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(peak - cum) AS BIGINT) AS max_drawdown_c,
           CAST(max(peak) AS BIGINT) AS peak_c
    FROM c
    GROUP BY user_id, event_type
    HAVING count(*) >= 5
    """,
    description=(
        "maximum drawdown per series: running cumulative value, its "
        "running peak, and the largest peak-to-trough gap — the "
        "risk-of-ruin statistic every trading-model evaluation needs "
        "next to R² (a model can have good fit and a catastrophic "
        "equity curve). ENTIRELY integer: cumsum, running max, and the "
        "final max-gap are BIGINT cents end-to-end, no float anywhere. "
        "Shape: two stacked windows + one agg, all partitioned on the "
        "series key — a single hash exchange, each series' rows stay "
        "on one partition (series count ≫ cores at 100 TB, skew "
        "bounded by per-series row counts)"
    ),
    tags=("events", "window", "finance"),
)
def evt_drawdown(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum("value_c").over(w).alias("cum"),
    ).select(
        "user_id",
        "event_type",
        "cum",
        F.max("cum")
        .over(
            Window.partitionBy("user_id", "event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("peak"),
    )
    return (
        c.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max(F.col("peak") - F.col("cum")).cast("bigint")
            .alias("max_drawdown_c"),
            F.max("peak").cast("bigint").alias("peak_c"),
        )
        .filter(F.col("n") >= 5)
    )


@register(
    "evt_bollinger_bands",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, event_type, event_id, v,
             row_number() OVER w AS rn,
             sum(v)     OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s20,
             sum(v * v) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS q20
      FROM s
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
    SELECT user_id, event_type, event_id,
           CAST(v AS BIGINT) AS value_c,
           round(CAST(s20 AS DOUBLE) / 20, 6) AS mean_c,
           round(sqrt(CAST(20 * q20 - s20 * s20 AS DOUBLE) / 400), 6) AS sd_c,
           round(CAST(s20 AS DOUBLE) / 20
                 + 2 * sqrt(CAST(20 * q20 - s20 * s20 AS DOUBLE) / 400), 6)
             AS upper_c,
           round(CAST(s20 AS DOUBLE) / 20
                 - 2 * sqrt(CAST(20 * q20 - s20 * s20 AS DOUBLE) / 400), 6)
             AS lower_c,
           CASE WHEN 20 * q20 - s20 * s20 = 0 THEN NULL
                ELSE round((v - (CAST(s20 AS DOUBLE) / 20
                       - 2 * sqrt(CAST(20 * q20 - s20 * s20 AS DOUBLE) / 400)))
                     / (4 * sqrt(CAST(20 * q20 - s20 * s20 AS DOUBLE) / 400)), 6)
           END AS pct_b
    FROM r WHERE rn >= 20
    """,
    description=(
        "Bollinger bands (20-observation SMA ± 2σ, population σ) plus "
        "%B band position per series row — the volatility envelope the "
        "reference's trading consumers chart against news timestamps. "
        "Determinism: rolling Σv and Σv² are exact BIGINT windows over "
        "a fixed 20-row frame (so the divisor is the CONSTANT 20 — no "
        "data-dependent count), variance is the integer identity "
        "(n·Σv² − (Σv)²)/n² evaluated as ONE double division, and "
        "sqrt is correctly rounded by IEEE-754 in both engines; every "
        "emitted float is round(expr, 6) of an identical tree. "
        "Shape: one hash exchange on the series key, two window "
        "passes, map-only arithmetic after"
    ),
    tags=("events", "window", "finance"),
)
def evt_bollinger_bands(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w20 = wo.rowsBetween(-19, Window.currentRow)
    r = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("value_c").alias("v"),
        F.row_number().over(wo).alias("rn"),
        F.sum("value_c").over(w20).alias("s20"),
        F.sum(F.col("value_c") * F.col("value_c")).over(w20).alias("q20"),
    ).filter(F.col("rn") >= 20)
    var_num = F.lit(20) * F.col("q20") - F.col("s20") * F.col("s20")
    mean = F.col("s20").cast("double") / F.lit(20)
    sd = F.sqrt(var_num.cast("double") / F.lit(400))
    return r.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("v").cast("bigint").alias("value_c"),
        F.round(mean, 6).alias("mean_c"),
        F.round(sd, 6).alias("sd_c"),
        F.round(mean + F.lit(2) * sd, 6).alias("upper_c"),
        F.round(mean - F.lit(2) * sd, 6).alias("lower_c"),
        F.when(var_num == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("v") - (mean - F.lit(2) * sd)) / (F.lit(4) * sd), 6
            )
        )
        .alias("pct_b"),
    )


@register(
    "evt_rsi",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    d AS (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER w AS rn,
             v - lag(v) OVER w AS delta
      FROM s
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
    g AS (
      SELECT user_id, event_type, event_id, rn,
             sum(greatest(delta, 0)) OVER (w ROWS BETWEEN 13 PRECEDING
                                           AND CURRENT ROW) AS gain_sum,
             sum(greatest(-delta, 0)) OVER (w ROWS BETWEEN 13 PRECEDING
                                            AND CURRENT ROW) AS loss_sum
      FROM d
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
    SELECT user_id, event_type, event_id,
           CAST(gain_sum AS BIGINT) AS gain_c,
           CAST(loss_sum AS BIGINT) AS loss_c,
           CASE WHEN loss_sum = 0 THEN CAST(100 AS DOUBLE)
                ELSE round(100 - 100 / (1 + CAST(gain_sum AS DOUBLE)
                                            / loss_sum), 6)
           END AS rsi
    FROM g WHERE rn >= 15
    """,
    description=(
        "RSI-14 (simple-average Cutler form — the recursive Wilder "
        "smoothing is order-dependent float; the SMA form is the "
        "standard deterministic variant) per series row: rolling "
        "14-delta gain/loss sums as exact BIGINT windows, RSI emitted "
        "once per row with ≥14 deltas of history. loss=0 pins RSI to "
        "exactly 100 (both engines, no division). One exchange on the "
        "series key, three window passes sharing it"
    ),
    tags=("events", "window", "finance"),
)
def evt_rsi(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w14 = wo.rowsBetween(-13, Window.currentRow)
    d = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.row_number().over(wo).alias("rn"),
        (F.col("value_c") - F.lag("value_c").over(wo)).alias("delta"),
    )
    g = d.select(
        "user_id",
        "event_type",
        "event_id",
        "rn",
        F.sum(F.greatest("delta", F.lit(0))).over(w14).alias("gain_sum"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(w14)
        .alias("loss_sum"),
    ).filter(F.col("rn") >= 15)
    return g.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("gain_sum").cast("bigint").alias("gain_c"),
        F.col("loss_sum").cast("bigint").alias("loss_c"),
        F.when(F.col("loss_sum") == 0, F.lit(100).cast("double"))
        .otherwise(
            F.round(
                F.lit(100)
                - F.lit(100)
                / (
                    F.lit(1)
                    + F.col("gain_sum").cast("double") / F.col("loss_sum")
                ),
                6,
            )
        )
        .alias("rsi"),
    )


@register(
    "evt_event_study_car",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, day),
    w AS (
      SELECT event_type, day, n, s, mx,
             row_number() OVER o AS rn,
             CAST(s AS DOUBLE) / n AS m,
             sum(s) OVER (o ROWS BETWEEN 12 PRECEDING AND 3 PRECEDING)
               AS est_s,
             sum(n) OVER (o ROWS BETWEEN 12 PRECEDING AND 3 PRECEDING)
               AS est_n
      FROM daily
      WINDOW o AS (PARTITION BY event_type ORDER BY day)),
    l AS (
      SELECT event_type, day, n, mx, rn,
             CAST(est_s AS DOUBLE) / est_n AS est,
             lag(m, 2)  OVER o AS m_m2,
             lag(m, 1)  OVER o AS m_m1,
             m          AS m_0,
             lead(m, 1) OVER o AS m_p1,
             lead(m, 2) OVER o AS m_p2
      FROM w
      WINDOW o AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day,
           n AS n_events,
           round(est, 6) AS est_mean_c,
           CAST(round((m_m2 - est) * 1000000) AS BIGINT)
           + CAST(round((m_m1 - est) * 1000000) AS BIGINT)
           + CAST(round((m_0 - est) * 1000000) AS BIGINT)
           + CAST(round((m_p1 - est) * 1000000) AS BIGINT)
           + CAST(round((m_p2 - est) * 1000000) AS BIGINT)
             AS car_micro
    FROM l
    WHERE mx >= 9500 AND rn >= 13 AND m_p2 IS NOT NULL
    """,
    description=(
        "event-study cumulative abnormal return around high-impact "
        "days — the canonical news-impact measurement for the "
        "reference's economic-calendar series: per event_type, daily "
        "mean value; anchor days are those whose daily max reaches "
        "the 95-level (value_c ≥ 9500) with a full estimation window; "
        "the expected level is the trailing 10-OBSERVATION mean "
        "(rows −12..−3, integer Σs/Σn — row-based, gap-robust, "
        "identical both engines); abnormal return per offset "
        "o ∈ [−2, +2] is micro-quantized BEFORE summation "
        "(round((m_o − est)·1e6) per offset, then an integer 5-term "
        "sum — a float CAR would be addition-order-dependent). "
        "Shape: one daily aggregation (map-side combined), then two "
        "window passes over |types|·|days| rows — tiny after the agg; "
        "at 100 TB the only data-sized stage is the first groupBy"
    ),
    tags=("events", "window", "finance", "statistics"),
)
def evt_event_study_car(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("value_c").cast("bigint").alias("s"),
        F.max("value_c").cast("bigint").alias("mx"),
    )
    o = Window.partitionBy("event_type").orderBy("day")
    west = o.rowsBetween(-12, -3)
    w = daily.select(
        "event_type",
        "day",
        "n",
        "mx",
        F.row_number().over(o).alias("rn"),
        (F.col("s").cast("double") / F.col("n")).alias("m"),
        F.sum("s").over(west).alias("est_s"),
        F.sum("n").over(west).alias("est_n"),
    )
    l = w.select(
        "event_type",
        "day",
        "n",
        "mx",
        "rn",
        (F.col("est_s").cast("double") / F.col("est_n")).alias("est"),
        F.lag("m", 2).over(o).alias("m_m2"),
        F.lag("m", 1).over(o).alias("m_m1"),
        F.col("m").alias("m_0"),
        F.lead("m", 1).over(o).alias("m_p1"),
        F.lead("m", 2).over(o).alias("m_p2"),
    )

    def ar(c):
        return F.round((F.col(c) - F.col("est")) * F.lit(1000000), 0).cast(
            "bigint"
        )

    return (
        l.filter(
            (F.col("mx") >= 9500)
            & (F.col("rn") >= 13)
            & F.col("m_p2").isNotNull()
        )
        .select(
            "event_type",
            "day",
            F.col("n").alias("n_events"),
            F.round("est", 6).alias("est_mean_c"),
            (ar("m_m2") + ar("m_m1") + ar("m_0") + ar("m_p1") + ar("m_p2"))
            .alias("car_micro"),
        )
    )


@register(
    "doc_dsir_importance",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS tok
      FROM documents),
    tk AS (SELECT doc_id, source, tok FROM toks WHERE length(tok) > 0),
    hashed AS (
      SELECT doc_id, source, tok,
             CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 1024
               AS bucket
      FROM tk),
    bstats AS (
      SELECT bucket,
             CAST(sum(CASE WHEN source IN ('src0','src1','src2')
                           THEN 1 ELSE 0 END) AS BIGINT) AS tc,
             CAST(sum(CASE WHEN source IN ('src0','src1','src2')
                           THEN 0 ELSE 1 END) AS BIGINT) AS rc
      FROM hashed GROUP BY bucket),
    scored AS (
      SELECT h.doc_id, h.source,
             CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(CAST(round(1000000 * CAST(b.tc + 1 AS DOUBLE)
                                 / (b.tc + b.rc + 2)) AS BIGINT))
                  AS BIGINT) AS score_micro
      FROM hashed h JOIN bstats b ON b.bucket = h.bucket
      WHERE h.source NOT IN ('src0','src1','src2')
      GROUP BY h.doc_id, h.source),
    ranked AS (
      SELECT doc_id, source, n_tok, score_micro,
             round(CAST(score_micro AS DOUBLE) / n_tok / 1000000, 6)
               AS avg_target_share,
             row_number() OVER (
               ORDER BY CAST(score_micro AS DOUBLE) / n_tok DESC,
                        doc_id ASC) AS rnk
      FROM scored)
    SELECT doc_id, source, n_tok, score_micro, avg_target_share,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 200
    """,
    description=(
        "DSIR-style data selection (Xie et al. 2023, 'Data Selection "
        "for Language Models via Importance Resampling'): tokens hash "
        "into 1024 buckets (engine-portable md5-prefix hash — the "
        "paper's hashed n-gram feature space), bucket counts under the "
        "TARGET domain (sources src0-2) vs the RAW pool estimate the "
        "two feature distributions, and each raw-pool document scores "
        "the Laplace-smoothed target share of its tokens; the top-200 "
        "by average share are the resampling selection. LOG-FREE "
        "surrogate: the paper's log-ratio importance weight is a "
        "transcendental (ln differs in the last ulp across libms — "
        "the determinism contract bans it); per-token shares are "
        "micro-quantized after ONE identical division, then summed as "
        "integers. Shape: the 1024-row bucket table is a broadcast; "
        "scoring is one corpus pass + per-doc aggregation; the global "
        "top-200 window ranks |raw docs| score rows (the standard "
        "approx-threshold seam at 100 TB: replace the exact window "
        "with a sampled score-quantile cutoff)"
    ),
    tags=("documents", "text", "sampling", "llm-data"),
)
def doc_dsir_importance(spark, sf_dir):
    from ..operators.dedup import _base_hash
    from .common import fan_out

    TARGET = ("src0", "src1", "src2")
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
            )
        ).alias("tok"),
    ).filter(F.length("tok") > 0)
    hashed = toks.withColumn("bucket", _base_hash(F.col("tok")) % 1024)
    is_target = F.col("source").isin(*TARGET)
    bstats = hashed.groupBy("bucket").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).cast("bigint").alias("tc"),
        F.sum(F.when(is_target, 0).otherwise(1)).cast("bigint").alias("rc"),
    )
    ratio_micro = F.round(
        F.lit(1000000)
        * (F.col("tc") + 1).cast("double")
        / (F.col("tc") + F.col("rc") + 2),
        0,
    ).cast("bigint")
    scored = (
        hashed.filter(~is_target)
        .join(F.broadcast(bstats), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum(ratio_micro).cast("bigint").alias("score_micro"),
        )
    )
    avg = F.col("score_micro").cast("double") / F.col("n_tok")
    ranked = scored.select(
        "doc_id",
        "source",
        "n_tok",
        "score_micro",
        F.round(avg / F.lit(1000000), 6).alias("avg_target_share"),
        F.row_number()
        .over(Window.orderBy(avg.desc(), F.col("doc_id").asc()))
        .cast("bigint")
        .alias("rnk"),
    )
    return ranked.filter(F.col("rnk") <= 200)


#: Milli-unit integer quantization of an embedding column (one IEEE
#: multiply + identical rounding rule in both engines — the r6 vector
#: determinism recipe shared by the check/eval queries below).
def _qvec(col="embedding"):
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(1000.0), 0).cast("bigint")
    )


def _int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _int_d2_arr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


@register(
    "emb_matryoshka_recall",
    oracle="""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             sum(CASE WHEN c.idx <= 16
                      THEN (c.x - q.x) * (c.x - q.x) ELSE 0 END) AS s16,
             sum(CASE WHEN c.idx <= 32
                      THEN (c.x - q.x) * (c.x - q.x) ELSE 0 END) AS s32,
             sum((c.x - q.x) * (c.x - q.x)) AS s64
      FROM ve q JOIN ve c ON c.idx = q.idx
      WHERE q.vec_id < 20 AND c.vec_id != q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s16 ASC, neighbor_id ASC) AS r16,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s32 ASC, neighbor_id ASC) AS r32,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s64 ASC, neighbor_id ASC) AS r64
      FROM pairs)
    SELECT query_id,
           CAST(sum(CASE WHEN r16 <= 5 AND r64 <= 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS hit16,
           CAST(sum(CASE WHEN r32 <= 5 AND r64 <= 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS hit32,
           round(sum(CASE WHEN r16 <= 5 AND r64 <= 5 THEN 1 ELSE 0 END)
                 / CAST(5 AS DOUBLE), 6) AS recall16,
           round(sum(CASE WHEN r32 <= 5 AND r64 <= 5 THEN 1 ELSE 0 END)
                 / CAST(5 AS DOUBLE), 6) AS recall32
    FROM ranked GROUP BY query_id
    """,
    description=(
        "matryoshka-truncation retrieval eval (Kusupati et al. 2022, "
        "MRL): per query, exact L2 top-5 under the FIRST 16 and 32 "
        "dims vs the full-64-dim top-5 ground truth — recall@5 per "
        "truncation width, the measurement that decides how many "
        "dims a serving index can drop. All distances are exact "
        "BIGINT sums over milli-quantized components (prefix sums "
        "s16 ⊂ s32 ⊂ s64 computed in ONE pairwise pass, not three); "
        "ranks tie-break on neighbor id. Shape: queries are a "
        "20-row broadcast against the corpus (map-only pair scoring, "
        "corpus never shuffles), then per-query rank windows over "
        "|corpus| candidate rows — the brute-force eval harness; "
        "production retrieval at truncated dims routes through the "
        "IVF/PQ paths this eval calibrates"
    ),
    tags=("embeddings", "similarity", "eval"),
)
def emb_matryoshka_recall(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    # DISJOINT segment distances (16 + 16 + 32 = 64 element-ops per
    # pair instead of the overlapping 16 + 32 + 64 = 112, r14): the
    # prefix sums are recovered exactly as s32 = s16 + mid,
    # s64 = s32 + tail — integer addition, bit-identical to the
    # overlapping three-pass form. The interpreted aggregate() HOF
    # lambda is the per-pair cost, so fewer elements = proportionally
    # less Python^WJVM-interpreted work; the additions happen ABOVE
    # the window exchange on materialized columns.
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _int_d2_arr(F.slice("qv", 1, 16), F.slice("qq", 1, 16))
            .alias("s16"),
            _int_d2_arr(F.slice("qv", 17, 16), F.slice("qq", 17, 16))
            .alias("_mid"),
            _int_d2_arr(F.slice("qv", 33, 32), F.slice("qq", 33, 32))
            .alias("_tail"),
        )
    )
    wq = Window.partitionBy("query_id")
    s32 = F.col("s16") + F.col("_mid")
    s64 = s32 + F.col("_tail")
    ranked = pairs.select(
        "query_id",
        F.row_number()
        .over(wq.orderBy(F.col("s16").asc(), F.col("neighbor_id").asc()))
        .alias("r16"),
        F.row_number()
        .over(wq.orderBy(s32.asc(), F.col("neighbor_id").asc()))
        .alias("r32"),
        F.row_number()
        .over(wq.orderBy(s64.asc(), F.col("neighbor_id").asc()))
        .alias("r64"),
    )
    hit16 = F.sum(
        F.when((F.col("r16") <= 5) & (F.col("r64") <= 5), 1).otherwise(0)
    ).cast("bigint")
    hit32 = F.sum(
        F.when((F.col("r32") <= 5) & (F.col("r64") <= 5), 1).otherwise(0)
    ).cast("bigint")
    return ranked.groupBy("query_id").agg(
        hit16.alias("hit16"),
        hit32.alias("hit32"),
        F.round(hit16 / F.lit(5).cast("double"), 6).alias("recall16"),
        F.round(hit32 / F.lit(5).cast("double"), 6).alias("recall32"),
    )


@register(
    "emb_rrf_fusion",
    oracle="""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             sum((c.x - q.x) * (c.x - q.x)) AS d2,
             sum(c.x * q.x) AS dot,
             sum(c.x * c.x) AS nc,
             sum(q.x * q.x) AS nq
      FROM ve q JOIN ve c ON c.idx = q.idx
      WHERE q.vec_id < 20 AND c.vec_id != q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2 ASC, neighbor_id ASC) AS ra,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(dot / (sqrt(CAST(nc AS DOUBLE))
                                          * sqrt(CAST(nq AS DOUBLE))), 6) DESC,
                                         neighbor_id ASC) AS rb
      FROM pairs),
    fused AS (
      SELECT query_id, neighbor_id, ra, rb,
             CAST(round(1000000.0 / (60 + ra)) AS BIGINT)
             + CAST(round(1000000.0 / (60 + rb)) AS BIGINT) AS rrf_micro
      FROM ranked),
    top AS (
      SELECT query_id, neighbor_id, rrf_micro,
             CAST(ra AS BIGINT) AS rank_l2, CAST(rb AS BIGINT) AS rank_cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_micro DESC, neighbor_id ASC)
               AS rnk
      FROM fused)
    SELECT query_id, neighbor_id, rrf_micro, rank_l2, rank_cos,
           CAST(rnk AS BIGINT) AS rnk
    FROM top WHERE rnk <= 5
    """,
    description=(
        "reciprocal-rank fusion of two retrievers (Cormack et al. "
        "2009 — the standard hybrid-search combiner): retriever A "
        "ranks by exact integer L2, retriever B by cosine (rounded "
        "to 6 before ranking — unnormalized vs normalized geometry "
        "genuinely disagree on ranks), fused score "
        "Σ 1/(60+rank) in micro-units (each reciprocal is ONE "
        "identical double division then micro-rounded; the fused sum "
        "is integer). Top-5 per query with id tie-breaks. Shape: the "
        "pair frame is computed once (one broadcast of the 20-query "
        "side, corpus map-only), both rank windows and the fusion "
        "window partition on query_id — a single exchange reused "
        "across all three"
    ),
    tags=("embeddings", "similarity", "fusion"),
)
def emb_rrf_fusion(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    # nq depends only on the QUERY row: computed on the 20-row side
    # BELOW its broadcast exchange (materialized once per query), not
    # per pair (r14, guide §4.2-adjacent: the aggregate() HOF lambdas
    # are interpreted per element — 2 of the 4 per-pair 64-element
    # reductions were redundant). d2 ≡ nc + nq − 2·dot EXACTLY in
    # integers (Σ(c−q)² = Σc² + Σq² − 2Σcq), so the pair stage needs
    # only dot and nc; d2/cos are scalar arithmetic ABOVE the window
    # exchange (the shuffle materializes dot/nc/nq, so nothing
    # re-evaluates a HOF).
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qq"),
        _int_dot(F.col("qv"), F.col("qv")).alias("nq"),
    )
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _int_dot(F.col("qv"), F.col("qq")).alias("dot"),
            _int_dot(F.col("qv"), F.col("qv")).alias("nc"),
            "nq",
        )
    )
    wq = Window.partitionBy("query_id")
    d2 = F.col("nc") + F.col("nq") - 2 * F.col("dot")
    cos = F.round(
        F.col("dot")
        / (
            F.sqrt(F.col("nc").cast("double"))
            * F.sqrt(F.col("nq").cast("double"))
        ),
        6,
    )
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        F.row_number()
        .over(wq.orderBy(d2.asc(), F.col("neighbor_id").asc()))
        .alias("ra"),
        F.row_number()
        .over(wq.orderBy(cos.desc(), F.col("neighbor_id").asc()))
        .alias("rb"),
    )
    rec = lambda r: F.round(F.lit(1000000.0) / (F.lit(60) + F.col(r)), 0).cast(
        "bigint"
    )
    fused = ranked.select(
        "query_id",
        "neighbor_id",
        (rec("ra") + rec("rb")).alias("rrf_micro"),
        F.col("ra").cast("bigint").alias("rank_l2"),
        F.col("rb").cast("bigint").alias("rank_cos"),
    )
    return (
        fused.withColumn(
            "rnk",
            F.row_number()
            .over(
                wq.orderBy(F.col("rrf_micro").desc(), F.col("neighbor_id").asc())
            )
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "emb_lloyd_step_check",
    oracle="""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings),
    cent AS (SELECT vec_id AS cid, idx, x AS cx FROM ve WHERE vec_id < 8),
    ad AS (
      SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS d2
      FROM ve v JOIN cent c USING (idx)
      WHERE v.vec_id >= 8
      GROUP BY v.vec_id, c.cid),
    assign AS (
      SELECT vec_id, cid, d2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2 ASC, cid ASC) AS rnk
      FROM ad),
    a1 AS (SELECT vec_id, cid, d2 FROM assign WHERE rnk = 1),
    newc AS (
      SELECT a.cid, v.idx,
             CAST(sum(v.x) AS BIGINT) AS sx,
             CAST(count(*) AS BIGINT) AS n
      FROM a1 a JOIN ve v ON v.vec_id = a.vec_id
      GROUP BY a.cid, v.idx),
    shift AS (
      SELECT n2.cid, n2.n,
             sum(CAST(round((CAST(n2.sx AS DOUBLE) / n2.n - c.cx)
                            * 1000) AS BIGINT)
                 * CAST(round((CAST(n2.sx AS DOUBLE) / n2.n - c.cx)
                              * 1000) AS BIGINT)) AS shift_sq_milli
      FROM newc n2 JOIN cent c ON c.cid = n2.cid AND c.idx = n2.idx
      GROUP BY n2.cid, n2.n),
    inertia AS (
      SELECT cid, CAST(sum(d2) AS BIGINT) AS inertia_c
      FROM a1 GROUP BY cid)
    SELECT s.cid AS centroid_id,
           s.n AS n_assigned,
           i.inertia_c,
           CAST(s.shift_sq_milli AS BIGINT) AS shift_sq_milli
    FROM shift s JOIN inertia i ON i.cid = s.cid
    """,
    description=(
        "hash-checkable single Lloyd iteration — the oracle-paired "
        "twin of the rows-only emb_lloyd_kmeans (whose multi-round "
        "float means are engine-divergent by nature): seeds are "
        "vectors 0..7, assignment minimizes exact BIGINT L2 over "
        "milli-quantized components (ties to the lower seed id), the "
        "update step recomputes each centroid as the integer "
        "mean-numerator pair (Σx, n) — the EXACT sufficient statistic "
        "a distributed Lloyd round shuffles — and reports per-cluster "
        "size, integer inertia, and the squared centroid shift "
        "(each new-minus-old coordinate is ONE identical division "
        "then milli-quantized before the squared sum, so the shift "
        "is integer too). Proves the assignment/update/convergence "
        "mechanics of operators/kmeans.py::lloyd_kmeans against an "
        "independent engine; the production operator keeps its "
        "fixed-point pytest gates for the multi-round float path. "
        "Shape: one |corpus|×8 assignment pass (centroid literals "
        "would be the broadcast at scale), one groupBy(cell) partial "
        "aggregation of (Σx, n) — exactly the Lloyd shuffle, "
        "map-side combined"
    ),
    tags=("embeddings", "clustering", "kmeans"),
)
def emb_lloyd_step_check(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    scored = corpus.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "qv",
        "cid",
        _int_d2_arr(F.col("qv"), F.col("cv")).alias("d2"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("cid").asc()
    )
    a1 = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "cid", "d2", "qv")
    )
    # update step: per-(cell, dim) integer sums — posexplode so the
    # aggregation is the real distributed Lloyd shuffle shape. d2 rides
    # along on every exploded row, so inertia folds into the SAME
    # aggregation (Σ over 64 dims = 64·Σd2 per cell; the /64 integer
    # division is exact) — a separate a1.groupBy would re-derive the
    # whole assignment lineage (no CSE across references: measured 6
    # exchanges / 5 scans before this fold, 3 / 2 after).
    dim = 64
    newc = (
        a1.select("cid", "d2", F.posexplode("qv").alias("idx0", "x"))
        .groupBy("cid", (F.col("idx0") + 1).alias("idx"))
        .agg(
            F.sum("x").cast("bigint").alias("sx"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("d2").cast("bigint").alias("d2_rep"),
        )
    )
    oldc = cent.select("cid", F.posexplode("cv").alias("idx0", "cx")).select(
        "cid", (F.col("idx0") + 1).alias("idx"), "cx"
    )
    delta_milli = F.round(
        (F.col("sx").cast("double") / F.col("n") - F.col("cx"))
        * F.lit(1000),
        0,
    ).cast("bigint")
    return (
        newc.join(F.broadcast(oldc), ["cid", "idx"])
        .groupBy("cid", "n")
        .agg(
            F.sum(delta_milli * delta_milli).alias("shift_sq_milli"),
            (F.sum("d2_rep") / F.lit(dim)).cast("bigint").alias("inertia_c"),
        )
        .select(
            F.col("cid").alias("centroid_id"),
            F.col("n").alias("n_assigned"),
            "inertia_c",
            F.col("shift_sq_milli").cast("bigint").alias("shift_sq_milli"),
        )
    )


@register(
    "evt_cusum_check",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    base AS (
      SELECT user_id, event_type, ts, event_id, v,
             CAST(sum(v) OVER p AS BIGINT) AS sv,
             CAST(count(*) OVER p AS BIGINT) AS n,
             row_number() OVER o AS rn
      FROM s
      WINDOW p AS (PARTITION BY user_id, event_type),
             o AS (PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)),
    c AS (
      SELECT user_id, event_type, n, rn,
             sum(n * v - sv - n * 100) OVER o AS cum_hi,
             sum(sv - n * v - n * 100) OVER o AS cum_lo
      FROM base
      WINDOW o AS (PARTITION BY user_id, event_type
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
    st AS (
      SELECT user_id, event_type, n, rn,
             cum_hi - least(CAST(0 AS BIGINT),
                            min(cum_hi) OVER o) AS hi,
             cum_lo - least(CAST(0 AS BIGINT),
                            min(cum_lo) OVER o) AS lo
      FROM c
      WINDOW o AS (PARTITION BY user_id, event_type
                   ORDER BY rn ROWS UNBOUNDED PRECEDING))
    SELECT user_id, event_type, n,
           round(CAST(max(hi) AS DOUBLE) / n / 100, 6) AS cusum_hi_max,
           round(CAST(max(lo) AS DOUBLE) / n / 100, 6) AS cusum_lo_max,
           CAST(min(CASE WHEN hi >= n * 1000 OR lo >= n * 1000
                         THEN rn END) AS BIGINT) AS first_alarm_rn
    FROM st
    GROUP BY user_id, event_type, n
    HAVING n >= 5
    """,
    description=(
        "hash-checkable tabular CUSUM via the prefix-minimum identity "
        "— the oracle-paired twin of the rows-only evt_cusum_alarms "
        "(whose loop-carried form earns a Python seam): the recursion "
        "s_t = max(0, s_(t-1) + d_t) equals "
        "cum_t − min(0, min_(i≤t) cum_i), so BOTH one-sided statistics "
        "become two stacked windows (running sum, then running min) — "
        "a pure JVM-side, shuffle-once form no recursion needs. "
        "Self-calibration stays integer by scaling through the series "
        "count: d_t = n·x_t − Σx − n·k cancels the mean without a "
        "division (slack k = 1.00, alarm threshold 10.00 units, both "
        "scale-multiplied by n); per-series outputs are the max "
        "statistics (ONE final division, micro-rounded) and the first "
        "alarm row index. Mirrors the mapInPandas operator's "
        "semantics; the identity is also the production recommendation "
        "— the Python-seam form remains for monitors whose recursions "
        "(two-sided resets, adaptive slack) have no prefix identity"
    ),
    tags=("events", "window", "monitoring"),
)
def evt_cusum_check(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    p = Window.partitionBy("user_id", "event_type")
    o = p.orderBy("ts", "event_id")
    ocum = o.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    K, H = 100, 1000  # slack 1.00, threshold 10.00 (cents)
    base = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.col("value_c").alias("v"),
        F.sum("value_c").over(p).cast("bigint").alias("sv"),
        F.count(F.lit(1)).over(p).cast("bigint").alias("n"),
        F.row_number().over(o).alias("rn"),
    )
    c = base.select(
        "user_id",
        "event_type",
        "n",
        "rn",
        F.sum(
            F.col("n") * F.col("v") - F.col("sv") - F.col("n") * F.lit(K)
        ).over(ocum).alias("cum_hi"),
        F.sum(
            F.col("sv") - F.col("n") * F.col("v") - F.col("n") * F.lit(K)
        ).over(ocum).alias("cum_lo"),
    )
    orn = p.orderBy("rn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    st = c.select(
        "user_id",
        "event_type",
        "n",
        "rn",
        (
            F.col("cum_hi")
            - F.least(F.lit(0).cast("bigint"), F.min("cum_hi").over(orn))
        ).alias("hi"),
        (
            F.col("cum_lo")
            - F.least(F.lit(0).cast("bigint"), F.min("cum_lo").over(orn))
        ).alias("lo"),
    )
    alarm = F.when(
        (F.col("hi") >= F.col("n") * F.lit(H))
        | (F.col("lo") >= F.col("n") * F.lit(H)),
        F.col("rn"),
    )
    return (
        st.groupBy("user_id", "event_type", "n")
        .agg(
            F.round(
                F.max("hi").cast("double") / F.col("n") / F.lit(100), 6
            ).alias("cusum_hi_max"),
            F.round(
                F.max("lo").cast("double") / F.col("n") / F.lit(100), 6
            ).alias("cusum_lo_max"),
            F.min(alarm).cast("bigint").alias("first_alarm_rn"),
        )
        .filter(F.col("n") >= 5)
    )


@register(
    "emb_mmr_check",
    oracle="""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings),
    q AS (SELECT idx, x AS qx FROM ve WHERE vec_id = 0),
    relx AS (
      SELECT v.vec_id,
             CAST(round(CAST(sum(v.x * q.qx) AS DOUBLE)
                        / (sqrt(CAST(sum(v.x * v.x) AS DOUBLE))
                           * sqrt(CAST(sum(q.qx * q.qx) AS DOUBLE)))
                        * 1000000) AS BIGINT) AS rel
      FROM ve v JOIN q ON q.idx = v.idx
      WHERE v.vec_id >= 8
      GROUP BY v.vec_id),
    short AS (
      SELECT vec_id, rel,
             row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS rr
      FROM relx QUALIFY rr <= 20),
    ps AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb,
             CAST(round(CAST(sum(va.x * vb.x) AS DOUBLE)
                        / (sqrt(CAST(sum(va.x * va.x) AS DOUBLE))
                           * sqrt(CAST(sum(vb.x * vb.x) AS DOUBLE)))
                        * 1000000) AS BIGINT) AS sim
      FROM short a
      JOIN short b ON a.vec_id != b.vec_id
      JOIN ve va ON va.vec_id = a.vec_id
      JOIN ve vb ON vb.vec_id = b.vec_id AND vb.idx = va.idx
      GROUP BY a.vec_id, b.vec_id),
    sel1 AS (
      SELECT vec_id, 7 * rel AS score
      FROM short ORDER BY 7 * rel DESC, vec_id ASC LIMIT 1),
    sc2 AS (
      SELECT s.vec_id,
             7 * s.rel - 3 * p.sim AS score
      FROM short s
      JOIN ps p ON p.ida = s.vec_id AND p.idb = (SELECT vec_id FROM sel1)
      WHERE s.vec_id != (SELECT vec_id FROM sel1)),
    sel2 AS (SELECT vec_id, score FROM sc2
             ORDER BY score DESC, vec_id ASC LIMIT 1),
    sc3 AS (
      SELECT s.vec_id,
             7 * s.rel - 3 * greatest(p1.sim, p2.sim) AS score
      FROM short s
      JOIN ps p1 ON p1.ida = s.vec_id AND p1.idb = (SELECT vec_id FROM sel1)
      JOIN ps p2 ON p2.ida = s.vec_id AND p2.idb = (SELECT vec_id FROM sel2)
      WHERE s.vec_id NOT IN (SELECT vec_id FROM sel1
                             UNION ALL SELECT vec_id FROM sel2)),
    sel3 AS (SELECT vec_id, score FROM sc3
             ORDER BY score DESC, vec_id ASC LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS rnk, vec_id AS neighbor_id,
           CAST(score AS BIGINT) AS mmr_score FROM sel1
    UNION ALL
    SELECT CAST(2 AS BIGINT), vec_id, CAST(score AS BIGINT) FROM sel2
    UNION ALL
    SELECT CAST(3 AS BIGINT), vec_id, CAST(score AS BIGINT) FROM sel3
    """,
    description=(
        "hash-checkable MMR re-rank — oracle-paired twin of the "
        "rows-only emb_mmr_rerank (whose float greedy loop is gated "
        "by a numpy-reference pytest): single query (vec 0), top-20 "
        "cosine shortlist, greedy k=3 with integer scores "
        "7·rel − 3·max_sim (λ=0.7 scaled by 10 — no float enters a "
        "comparison; rel/sim are micro-quantized cosines, each ONE "
        "identical division+multiply tree in both engines, ties to "
        "the lower id). The Spark side mirrors the production shape: "
        "candidate scoring + top-20 ranking distributed (query row "
        "broadcast, JVM expressions), then the inherently-sequential "
        "greedy runs on the COLLECTED 20-row shortlist — the same "
        "bounded-pool contract as the applyInPandas operator, driver "
        "arithmetic in exact ints + IEEE ops identical to the SQL"
    ),
    tags=("embeddings", "similarity", "fusion"),
)
def emb_mmr_check(spark, sf_dir):
    import math

    from ..operators.pq import bounded_collect

    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    qrow = bounded_collect(
        emb.filter(F.col("vec_id") == 0), "mmr_check query vector"
    )[0]
    qv = list(qrow["qv"])
    qlit = F.lit(qv)
    rel_micro = F.round(
        _int_dot(F.col("qv"), qlit).cast("double")
        / (
            F.sqrt(_int_dot(F.col("qv"), F.col("qv")).cast("double"))
            * F.sqrt(_int_dot(qlit, qlit).cast("double"))
        )
        * F.lit(1000000),
        0,
    ).cast("bigint")
    short = (
        emb.filter(F.col("vec_id") >= 8)
        .select("vec_id", "qv", rel_micro.alias("rel"))
        .withColumn(
            "rr",
            F.row_number().over(
                Window.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
            ),
        )
        .filter(F.col("rr") <= 20)
    )
    rows = bounded_collect(short, "mmr_check shortlist")
    pool = [(r["vec_id"], list(r["qv"]), int(r["rel"])) for r in rows]

    def half_away(y: float) -> int:
        return (
            int(math.floor(y + 0.5))
            if y >= 0
            else -int(math.floor(-y + 0.5))
        )

    def sim(a: list[int], b: list[int]) -> int:
        dot = float(sum(x * y for x, y in zip(a, b)))
        na = math.sqrt(float(sum(x * x for x in a)))
        nb = math.sqrt(float(sum(x * x for x in b)))
        return half_away(dot / (na * nb) * 1000000.0)

    selected: list[tuple[int, int, int]] = []  # (rnk, id, score)
    chosen: list[tuple[int, list[int]]] = []
    for rnk in (1, 2, 3):
        best = None
        for vid, vec, rel in pool:
            if any(vid == c[0] for c in chosen):
                continue
            max_sim = max((sim(vec, cv) for _, cv in chosen), default=0)
            score = 7 * rel - 3 * max_sim
            if best is None or (score, -vid) > (best[2], -best[0]):
                best = (vid, vec, score)
        selected.append((rnk, best[0], best[2]))
        chosen.append((best[0], best[1]))
    return spark.createDataFrame(
        selected, "rnk long, neighbor_id long, mmr_score long"
    )


@register(
    "evt_hll_portable_rollup",
    oracle="""
    WITH u AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
      FROM events),
    h AS (
      SELECT event_type, day,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM u),
    b AS (
      SELECT event_type, day, hv % 256 AS bucket, hv // 256 AS w FROM h),
    r AS (
      SELECT event_type, day, bucket,
             max(CASE WHEN w = 0 THEN 25
                      ELSE 25 - length(bin(w)) END) AS reg
      FROM b GROUP BY event_type, day, bucket),
    m AS (
      SELECT event_type, bucket, max(reg) AS reg
      FROM r GROUP BY event_type, bucket),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(CAST(1 AS BIGINT) << (25 - reg)) AS BIGINT)
               AS sum_present
      FROM m GROUP BY event_type),
    days AS (
      SELECT event_type, CAST(count(DISTINCT day) AS BIGINT) AS n_days
      FROM r GROUP BY event_type),
    ex AS (
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM u GROUP BY event_type)
    SELECT a.event_type, d.n_days,
           CAST(256 - a.n_buckets AS BIGINT) AS zero_registers,
           CAST(a.sum_present
                + (256 - a.n_buckets) * 33554432 AS BIGINT) AS sum_scaled,
           round(1579498136381.3938
                 / (a.sum_present + (256 - a.n_buckets) * 33554432), 6)
             AS hll_estimate,
           e.exact_distinct
    FROM agg a
    JOIN days d ON d.event_type = a.event_type
    JOIN ex e ON e.event_type = a.event_type
    """,
    description=(
        "engine-PORTABLE HyperLogLog rollup — the oracle-paired twin "
        "of evt_hll_rollup_distinct (whose DataSketches binaries are "
        "engine-specific, rows-only by nature): from-scratch HLL over "
        "the md5-prefix hash with m=256 registers, built as ordinary "
        "relational state — rho = 25 − bit_length(w) via the "
        "bin()-string trick (both engines agree exactly; no log2, "
        "whose libm rounding at exact powers of two is the classic "
        "cross-engine trap), daily register tables max-merged to "
        "monthly (the register TABLE is the mergeable artifact — "
        "same max-merge associativity DataSketches relies on, but "
        "queryable, diffable, and portable across engines/jobs), and "
        "the harmonic denominator kept EXACT as Σ 2^(25−reg) in "
        "BIGINT via shiftleft (absent buckets contribute 2^25) — the "
        "only float is the final alpha·m²·2^25 / sum division "
        "(numerator precomputed once, inlined as the same 17-digit "
        "literal in both engines). Raw estimate emitted alongside "
        "zero-register count and exact distinct; the small-range "
        "linear-counting correction needs ln → documented consumer "
        "seam, not computed. At 100 TB: per-day partials are "
        "map-side-combined maxes over ≤ types·256 rows — the rollup "
        "never reshuffles users"
    ),
    tags=("events", "sketch", "aggregate"),
)
def evt_hll_portable_rollup(spark, sf_dir):
    from ..operators.dedup import _base_hash

    M, WBITS = 256, 25
    NUM = 1579498136381.3938  # 0.7213/(1+1.079/256) * 256^2 * 2^25
    ev = keyed_events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    h = ev.select(
        "event_type",
        "day",
        _base_hash(F.col("user_id").cast("string")).alias("hv"),
    )
    b = h.select(
        "event_type",
        "day",
        (F.col("hv") % M).alias("bucket"),
        F.floor(F.col("hv") / M).cast("bigint").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(WBITS)).otherwise(
        F.lit(WBITS) - F.length(F.bin("w"))
    )
    r = b.groupBy("event_type", "day", "bucket").agg(
        F.max(rho).alias("reg")
    )
    m = r.groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
    agg = m.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - reg)"))
        .cast("bigint")
        .alias("sum_present"),
    )
    days = r.groupBy("event_type").agg(
        F.countDistinct("day").cast("bigint").alias("n_days")
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    sum_scaled = F.col("sum_present") + (F.lit(M) - F.col("n_buckets")) * F.lit(
        1 << WBITS
    )
    return (
        agg.join(days, "event_type")
        .join(ex, "event_type")
        .select(
            "event_type",
            "n_days",
            (F.lit(M) - F.col("n_buckets")).cast("bigint")
            .alias("zero_registers"),
            sum_scaled.cast("bigint").alias("sum_scaled"),
            F.round(F.lit(NUM) / sum_scaled, 6).alias("hll_estimate"),
            "exact_distinct",
        )
    )


@register(
    "evt_markov_absorption_check",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    fp AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'purchase' THEN rn END) AS first_p
      FROM seq GROUP BY user_id),
    kept AS (
      SELECT s.user_id, s.event_type, s.rn
      FROM seq s JOIN fp ON fp.user_id = s.user_id
      WHERE fp.first_p IS NULL OR s.rn <= fp.first_p),
    stepped AS (
      SELECT user_id, event_type,
             coalesce(lag(event_type) OVER w, 'START') AS src,
             lead(event_type) OVER w AS nxt
      FROM kept
      WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
    edges AS (
      SELECT src, event_type AS dst FROM stepped
      UNION ALL
      SELECT event_type AS src, 'NULL' AS dst FROM stepped
      WHERE nxt IS NULL AND event_type != 'purchase'),
    counts AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM edges GROUP BY src, dst),
    tot AS (
      SELECT src, CAST(sum(n) AS BIGINT) AS tot FROM counts GROUP BY src),
    it(iter, src, v) AS (
      SELECT 0, src, CAST(0 AS BIGINT) FROM tot
      UNION ALL
      SELECT vv.iter + 1, c.src,
             CAST(sum(c.n * vv.v) // min(t2.tot) AS BIGINT)
      FROM counts c
      JOIN (SELECT iter, src AS state, v FROM it
            UNION ALL
            SELECT DISTINCT iter, 'purchase',
                   CAST(1000000 AS BIGINT) FROM it
            UNION ALL
            SELECT DISTINCT iter, 'NULL', CAST(0 AS BIGINT) FROM it) vv
        ON vv.state = c.dst
      JOIN tot t2 ON t2.src = c.src
      WHERE vv.iter < 60
      GROUP BY vv.iter, c.src)
    SELECT src AS state, CAST(v AS BIGINT) AS absorb_micro
    FROM it WHERE iter = 60
    """,
    description=(
        "hash-checkable Markov absorption probabilities — the "
        "oracle-paired twin of evt_markov_attribution (whose numpy "
        "linear solve is rows-only): the SAME journey semantics "
        "(truncate at first purchase, START source, NULL absorber for "
        "non-converters, one user_id window shuffle for transition "
        "counts), then P(convert | state) by 60 FIXED-POINT value "
        "iterations in EXACT integer arithmetic — v'(s) = "
        "Σ_d n_sd·val(d) // n_s in micro-units with floor division, "
        "so both engines execute the identical integer recurrence "
        "(DuckDB replays it as a recursive CTE with grouped "
        "aggregation; Spark iterates on the driver over the collected "
        "≤(|types|+1)² count matrix — the bounded out-of-band solve "
        "pattern, asserted). Converged to the linear-system solution "
        "within ~1e-4 (gated in tests/test_r6.py against the numpy "
        "solve); the distributed stage scales with the event log, the "
        "iteration is O(|types|²·T) regardless of data size"
    ),
    tags=("events", "sequence", "markov", "driver-solve"),
)
def evt_markov_absorption_check(spark, sf_dir):
    from .queries_r4b import _markov_transition_counts

    counts = _markov_transition_counts(spark, sf_dir)
    rows = counts.collect()  # bounded: ≤ (|types|+1) × (|types|+2)
    assert len(rows) <= 2048, "transition matrix unexpectedly large"
    by_src: dict[str, dict[str, int]] = {}
    for r in rows:
        by_src.setdefault(r["src"], {})[r["dst"]] = int(r["n"])
    tot = {s: sum(d.values()) for s, d in by_src.items()}
    v = {s: 0 for s in by_src}
    for _ in range(60):
        nv = {}
        for s, dsts in by_src.items():
            acc = 0
            for d, n in dsts.items():
                val = (
                    1000000
                    if d == "purchase"
                    else 0 if d == "NULL" else v.get(d, 0)
                )
                acc += n * val
            nv[s] = acc // tot[s]
        v = nv
    return spark.createDataFrame(
        sorted(v.items()), "state string, absorb_micro long"
    )


@register(
    "evt_dtw_check",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT min(user_id) AS uid FROM events),
    a AS (
      SELECT row_number() OVER (ORDER BY ts, event_id) AS i,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events, base
      WHERE user_id = base.uid AND event_type = 'view'
        AND value IS NOT NULL
      ORDER BY ts, event_id LIMIT 32),
    b AS (
      SELECT row_number() OVER (ORDER BY ts, event_id) AS j,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events, base
      WHERE user_id = base.uid AND event_type = 'click'
        AND value IS NOT NULL
      ORDER BY ts, event_id LIMIT 32),
    nn AS (SELECT (SELECT max(i) FROM a) AS n, (SELECT max(j) FROM b) AS m),
    dp(d, i, j, val) AS (
      SELECT 2, 1, 1, abs(a.v - b.v)
      FROM a, b WHERE a.i = 1 AND b.j = 1
      UNION ALL
      SELECT * FROM (
        SELECT cur.d + 1 AS d, a.i, b.j,
               abs(a.v - b.v) + min(nb.val) AS val
        FROM (SELECT max(d) AS d FROM dp) cur, nn, a, b, dp nb
        WHERE a.i + b.j = cur.d + 1
          AND cur.d < nn.n + nn.m
          AND ((nb.i = a.i - 1 AND nb.j = b.j)
               OR (nb.i = a.i AND nb.j = b.j - 1)
               OR (nb.i = a.i - 1 AND nb.j = b.j - 1))
        GROUP BY cur.d, a.i, b.j, a.v, b.v
        UNION ALL
        SELECT p.d, p.i, p.j, p.val
        FROM dp p, (SELECT max(d) AS d FROM dp) cur, nn
        WHERE p.d = cur.d AND cur.d < nn.n + nn.m))
    SELECT nn.n, nn.m, CAST(min(dp.val) AS BIGINT) AS dtw_c
    FROM dp, nn
    WHERE dp.i = nn.n AND dp.j = nn.m
    GROUP BY nn.n, nn.m
    """,
    description=(
        "hash-checkable dynamic time warping — oracle-paired twin of "
        "the rows-only evt_series_dtw (whose per-pair numpy DP is "
        "gated by a reference pytest): the full integer DP "
        "D(i,j) = |a_i − b_j| + min(D(i−1,j), D(i,j−1), D(i−1,j−1)) "
        "between two bounded series (first user's view vs click "
        "values, 32 points each — cents, BIGINT end-to-end), replayed "
        "in DuckDB as a recursive CTE marching anti-diagonals with a "
        "two-diagonal working set (diagonal d needs only d−1 and "
        "d−2 — the same wavefront dependency a blocked/parallel DTW "
        "exploits). Spark mirrors the production contract: series "
        "collect bounded (32 rows each, the applyInPandas operator's "
        "per-group pool), exact-int DP on the driver. Border cells "
        "take the min over their PRESENT neighbors (absent joins = "
        "standard DTW edge semantics). The scale path for corpus-wide "
        "DTW stays evt_series_dtw's grouped Arrow kernel; this twin "
        "proves its recurrence cross-engine"
    ),
    tags=("events", "sequence", "similarity"),
)
def evt_dtw_check(spark, sf_dir):
    from ..operators.pq import bounded_collect

    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    uid_row = ev.agg(F.min("user_id").alias("u")).collect()[0]
    uid = uid_row["u"]

    def series(etype: str, col: str) -> list[int]:
        rows = bounded_collect(
            ev.filter(
                (F.col("user_id") == uid) & (F.col("event_type") == etype)
            )
            .orderBy("ts", "event_id")
            .select("value_c")
            .limit(32),
            f"dtw_check {etype} series",
        )
        return [int(r["value_c"]) for r in rows]

    a, b = series("view", "a"), series("click", "b")
    schema = "n long, m long, dtw_c long"
    if not a or not b:
        return spark.createDataFrame([], schema)
    n, m = len(a), len(b)
    INF = float("inf")
    prev = [INF] * (m + 1)
    curr = [INF] * (m + 1)
    for i in range(1, n + 1):
        curr = [INF] * (m + 1)
        for j in range(1, m + 1):
            cost = abs(a[i - 1] - b[j - 1])
            if i == 1 and j == 1:
                curr[j] = cost
            else:
                best = min(prev[j], curr[j - 1], prev[j - 1])
                curr[j] = cost + best
        prev = curr
    return spark.createDataFrame([(n, m, int(curr[m]))], schema)
