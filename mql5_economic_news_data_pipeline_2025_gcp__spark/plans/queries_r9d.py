"""Round-9 batch d: reliability fitting and embedding-space health.

``evt_weibull_plot_fit`` — Weibull probability-plot (rank-regression)
sufficient statistics over inter-arrival gaps per event type: the
reliability engineer's shape/scale fit (k < 1 bursty/infant-mortality,
k ≈ 1 Poisson, k > 1 regularizing), complementing
`evt_interarrival_cv`'s single dispersion number with an actual
distributional fit.

``emb_anisotropy_spectrum`` — per-dimension first/second moments of the
embedding corpus: the anisotropy probe (‖μ‖²/E‖x‖²) and the diagonal
variance spectrum that flag a collapsed or rogue-dimension embedding
space before any ANN index is built.

``emb_cluster_label_purity`` — assign every vector to its nearest fixed
centroid (vec_id < 8, the `emb_davies_bouldin` convention) by exact
integer L2 and report per-cluster label purity — the external-validity
readout next to the internal indices (Davies-Bouldin, silhouette-free).

Determinism: logs and the Bernard plotting positions are quantized to
integer micro-units; the plotting-position quantity is SHIFTED by a
literal +32 before quantization so every emitted term is non-negative
(signed values would make Spark's truncating DIV disagree with
DuckDB's flooring `//` in the hi/lo halves — the shift cancels in the
regression covariance, proven in the pytest gate).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register

_LN_U = 1000000
_HALF = 1048576
#: literal shift making the Bernard plot quantity positive (y is
#: bounded below by ln(0.7/n) > -32 for n < ~5·10¹³ rows per type)
_W_SHIFT = "32.0"


@register(
    "evt_weibull_plot_fit",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id
      FROM events),
    g AS (
      SELECT event_type, user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap
      FROM s),
    r AS (
      SELECT event_type, gap,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY gap, user_id, event_id) AS i,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM g WHERE gap >= 1),
    q AS (
      SELECT event_type, i, n,
             CAST(round(ln(CAST(gap AS DOUBLE)) * {_LN_U}) AS BIGINT)
               AS x_u,
             CAST(round(({_W_SHIFT} + ln(-ln(1.0 -
                    (CAST(i AS DOUBLE) - 0.3)
                      / (CAST(n AS DOUBLE) + 0.4)))) * {_LN_U})
                  AS BIGINT) AS ys_u
      FROM r)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x_u) AS BIGINT) AS sx,
           CAST(sum(ys_u) AS BIGINT) AS sys,
           CAST(sum((x_u * x_u) // {_HALF}) AS BIGINT) AS sxx_hi,
           CAST(sum((x_u * x_u) % {_HALF}) AS BIGINT) AS sxx_lo,
           CAST(sum((x_u * ys_u) // {_HALF}) AS BIGINT) AS sxys_hi,
           CAST(sum((x_u * ys_u) % {_HALF}) AS BIGINT) AS sxys_lo
    FROM q GROUP BY event_type
    """,
    description=(
        "Weibull probability-plot rank regression per event type over "
        "per-user inter-arrival gaps (µs): gaps get Bernard plotting "
        "positions p = (i−0.3)/(n+0.4) over the pinned total order "
        "(gap, user_id, event_id); x = ln(gap) and the SHIFTED "
        "y' = 32 + ln(−ln(1−p)) are micro-quantized NON-NEGATIVE "
        "integers (the shift keeps every hi/lo half divisible the "
        "same way in both engines and cancels in Cov(x,y)); the five "
        "OLS sums emit exactly, and the pytest gate assembles shape "
        "k = slope and scale = exp(−intercept/k) against numpy "
        "polyfit. Shape: one (user,type) lag shuffle, one per-type "
        "rank window over the gap frame (presentation/parity form — "
        "at 100 TB the positions come from approxQuantile cutoffs, "
        "the evt_value_deciles seam), final fold reuses the type "
        "partition"
    ),
    tags=("events", "statistics", "reliability", "timeseries"),
)
def evt_weibull_plot_fit(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    wlag = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    us = F.unix_micros(F.col("ts"))
    g = ev.select(
        "event_type",
        "user_id",
        "event_id",
        (us - F.lag(us).over(wlag)).alias("gap"),
    ).filter(F.col("gap") >= 1)
    wr = Window.partitionBy("event_type").orderBy(
        "gap", "user_id", "event_id"
    )
    wn = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        "gap",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = r.select(
        "event_type",
        F.round(F.log(F.col("gap").cast("double")) * _LN_U)
        .cast("bigint")
        .alias("x_u"),
        F.expr(
            f"CAST(round(({_W_SHIFT} + ln(-ln(1.0 - "
            f"(CAST(i AS DOUBLE) - 0.3) / (CAST(n AS DOUBLE) + 0.4))))"
            f" * {_LN_U}) AS BIGINT)"
        ).alias("ys_u"),
    )
    return q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_u").cast("bigint").alias("sx"),
        F.sum("ys_u").cast("bigint").alias("sys"),
        F.sum(F.expr(f"(x_u * x_u) DIV {_HALF}"))
        .cast("bigint")
        .alias("sxx_hi"),
        F.sum((F.col("x_u") * F.col("x_u")) % _HALF)
        .cast("bigint")
        .alias("sxx_lo"),
        F.sum(F.expr(f"(x_u * ys_u) DIV {_HALF}"))
        .cast("bigint")
        .alias("sxys_hi"),
        F.sum((F.col("x_u") * F.col("ys_u")) % _HALF)
        .cast("bigint")
        .alias("sxys_lo"),
    )


@register(
    "emb_anisotropy_spectrum",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0)
                                      AS BIGINT)) AS qv
      FROM embeddings),
    e AS (
      SELECT vec_id, unnest(qv) AS x,
             generate_subscripts(qv, 1) AS d
      FROM q)
    SELECT CAST(d AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sd,
           CAST(sum(x * x) AS BIGINT) AS qd
    FROM e GROUP BY d
    """,
    description=(
        "per-dimension moment spectrum of the embedding corpus "
        "(milli-quantized): Σx and Σx² per coordinate — 64 rows of "
        "exact BIGINTs from which the pytest gate assembles the "
        "anisotropy ratio ‖μ‖²/E‖x‖² (≈0 for a healthy centered "
        "space, →1 when the space collapses onto its mean — the "
        "known failure mode that silently ruins cosine ANN) and the "
        "diagonal variance spectrum (rogue dominant dimension, dead "
        "dimensions). Shape: one posexplode + one hash agg keyed on "
        "the 64 dimension ids; the shuffle carries 64·partitions "
        "partial rows regardless of corpus size — the moments are "
        "mergeable, so the 100 TB form is the same two-level "
        "combine-reduce"
    ),
    tags=("embeddings", "statistics", "quality"),
)
def emb_anisotropy_spectrum(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select(_qvec().alias("qv"))
    e = emb.select(F.posexplode("qv").alias("d0", "x")).select(
        (F.col("d0") + 1).cast("bigint").alias("d"), "x"
    )
    return e.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sd"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("qd"),
    )


@register(
    "emb_cluster_label_purity",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0)
                                      AS BIGINT)) AS qv
      FROM embeddings),
    cent AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 8),
    pts AS (SELECT vec_id, label, qv FROM q WHERE vec_id >= 8),
    d AS (
      SELECT p.vec_id, p.label, c.cid,
             list_sum(list_transform(range(1, len(p.qv) + 1),
                      i -> (p.qv[i] - c.cv[i]) * (p.qv[i] - c.cv[i])))
               AS d2
      FROM pts p CROSS JOIN cent c),
    assign AS (
      -- (d2, cid) lexicographic argmin via one monotonic BIGINT key:
      -- d2*8 + cid (cid < 8; DuckDB 1.0 min_by rejects tuple keys)
      SELECT vec_id, label,
             CAST(min(d2 * 8 + cid) % 8 AS BIGINT) AS cid
      FROM d GROUP BY vec_id, label),
    cl AS (
      SELECT cid, label, CAST(count(*) AS BIGINT) AS c
      FROM assign GROUP BY cid, label)
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_labels,
           -- (c DESC, label ASC) argmax via one monotonic key:
           -- c*1024 - label (labels are 0..9 << 1024)
           CAST((1024 - max(c * 1024 - label) % 1024) % 1024 AS BIGINT)
             AS top_label,
           CAST(max(c) AS BIGINT) AS top_count,
           CAST(max(c) * 10000 // sum(c) AS BIGINT) AS purity_bp
    FROM cl GROUP BY cid
    """,
    description=(
        "external cluster validity: every vector (vec_id ≥ 8) is "
        "assigned to its nearest fixed centroid (vec_id < 8, the "
        "emb_davies_bouldin convention) by EXACT integer L2 with ties "
        "to the lower centroid id, then each cluster reports its "
        "label histogram top (ties to the lower label), distinct "
        "label count, and floored basis-point purity — the "
        "label-agreement readout that tells you whether the metric "
        "structure the internal indices score actually aligns with "
        "ground truth. Shape: 8 centroids broadcast into the corpus "
        "scan, argmin as a min-struct hash aggregate (NO rank "
        "window), two more tiny aggs; at 100 TB this is the standard "
        "assign step of a k-means scorer — one pass, no shuffle of "
        "vectors beyond the (vec, cluster, label) ints"
    ),
    tags=("embeddings", "clustering", "quality"),
)
def emb_cluster_label_purity(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _qvec().alias("qv")
    )
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    pts = emb.filter(F.col("vec_id") >= 8)
    d = pts.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "cid",
        _int_d2_arr(F.col("qv"), F.col("cv")).alias("d2"),
    )
    assign = d.groupBy("vec_id", "label").agg(
        F.min(F.struct("d2", "cid")).getField("cid").alias("cid")
    )
    cl = assign.groupBy("cid", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return cl.groupBy(F.col("cid").cast("bigint").alias("cluster_id")).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"), F.col("label")))
        .getField("label")
        .cast("bigint")
        .alias("top_label"),
        F.max("c").cast("bigint").alias("top_count"),
        F.expr("CAST(max(c) * 10000 DIV sum(c) AS BIGINT)").alias(
            "purity_bp"
        ),
    )
