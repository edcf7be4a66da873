"""Round-10m batch: two more ANN-graph diagnostics on the bounded
literal panel — reciprocity and the Lowe margin.

``emb_reciprocal_nn`` — k-NN edge reciprocity within a 64-point
literal panel: of the directed top-k edges q→c (both endpoints in the
panel), how many have the reverse edge c→q? Low reciprocity marks
asymmetric neighborhoods (hub-dominated regions where "my nearest
neighbor doesn't consider me near"), the graph-shape failure mode
`emb_hubness` (in-degree skew) and `emb_trustworthiness` (rank
displacement under truncation) don't directly expose. Mutual-kNN
graphs (the standard dedup/clustering substrate) keep only the
reciprocal edges, so this IS the edge-retention rate of that
construction.

``emb_knn_margin`` — the Lowe ratio profile: for each panel query,
the exact nearest and second-nearest integer-L2 distances over the
FULL corpus (d1, d2, with neighbor ids). The d1/d2 ratio is the
classic match-confidence test (Lowe 2004): ratios near 1 mean the
nearest neighbor is barely better than the runner-up — retrieval and
dedup decisions there are noise. `emb_distance_histogram` shows the
global distance field; the margin is the per-query decision quality.

Determinism: distances are integer-L2 on milli-quantized coordinates;
ranks break ties on neighbor id; the gate assembles ratios/rates.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import t
from .registry import register

_RNN_PANEL = 64
_RNN_K = 5
_MARGIN_QUERIES = 64


@register(
    "emb_reciprocal_nn",
    oracle=f"""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT)
               AS x
      FROM embeddings WHERE vec_id < {_RNN_PANEL}),
    pairs AS (
      SELECT q.vec_id AS src, c.vec_id AS dst,
             sum((c.x - q.x) * (c.x - q.x)) AS d2
      FROM ve q JOIN ve c ON c.idx = q.idx
      WHERE c.vec_id != q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    topk AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY d2, dst)
                 AS rn
        FROM pairs) WHERE rn <= {_RNN_K})
    SELECT CAST(a.src AS BIGINT) AS src,
           CAST(count(*) AS BIGINT) AS k_out,
           CAST(sum(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reciprocal
    FROM topk a LEFT JOIN topk b
      ON b.src = a.dst AND b.dst = a.src
    GROUP BY a.src
    """,
    description=(
        f"k-NN reciprocity within the {_RNN_PANEL}-point literal "
        f"panel: per source, how many of its top-{_RNN_K} integer-L2 "
        "edges have the reverse edge — the mutual-kNN edge-retention "
        "rate, the asymmetric-neighborhood diagnostic hub skew and "
        "rank displacement don't expose; the gate brute-forces the "
        "directed graph and pins the symmetric-pair identity "
        "(Σ reciprocal even). Shape: panel-only pair frame (bounded "
        f"{_RNN_PANEL}² at any corpus size), one rank window, a "
        "self-join on the bounded edge set"
    ),
    tags=("embeddings", "ann", "diagnostics"),
)
def emb_reciprocal_nn(spark, sf_dir):
    from .queries_r6 import _int_d2_arr, _qvec

    emb = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _RNN_PANEL)
        .select("vec_id", _qvec("embedding").alias("q"))
    )
    a = emb.select(F.col("vec_id").alias("src"), F.col("q").alias("qa"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("q").alias("qb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            _int_d2_arr(F.col("qa"), F.col("qb")).alias("d2"),
        )
    )
    topk = (
        pairs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("src").orderBy("d2", "dst")
            ),
        )
        .filter(F.col("rn") <= _RNN_K)
        .select("src", "dst")
        # bounded panel²-derived edge set read by both self-join sides
        .localCheckpoint()
    )
    rev = topk.select(
        F.col("src").alias("r_src"), F.col("dst").alias("r_dst")
    )
    return (
        topk.join(
            rev,
            (F.col("r_src") == F.col("dst"))
            & (F.col("r_dst") == F.col("src")),
            "left",
        )
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_out"),
            F.sum(F.when(F.col("r_src").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_reciprocal"),
        )
        .select(F.col("src").cast("bigint").alias("src"), "k_out", "n_reciprocal")
    )


@register(
    "emb_knn_margin",
    oracle=f"""
    WITH ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT)
               AS x
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             sum((c.x - q.x) * (c.x - q.x)) AS d2
      FROM ve q JOIN ve c ON c.idx = q.idx
      WHERE q.vec_id < {_MARGIN_QUERIES} AND c.vec_id != q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    ranked AS (
      SELECT qid, cid, d2,
             row_number() OVER (PARTITION BY qid ORDER BY d2, cid)
               AS rn
      FROM pairs)
    SELECT a.qid,
           CAST(a.cid AS BIGINT) AS nn1,
           CAST(a.d2 AS BIGINT) AS d1_sq,
           CAST(b.cid AS BIGINT) AS nn2,
           CAST(b.d2 AS BIGINT) AS d2_sq
    FROM ranked a JOIN ranked b
      ON b.qid = a.qid AND a.rn = 1 AND b.rn = 2
    """,
    description=(
        "Lowe margin profile: exact nearest and second-nearest "
        f"integer-L2 distances (with neighbor ids) for the "
        f"{_MARGIN_QUERIES}-query literal panel over the FULL corpus "
        "— the d1/d2 ratio is the classic match-confidence test "
        "(ratios near 1 ⇒ the NN decision is noise); the gate "
        "brute-forces both neighbors and pins d1 ≤ d2 plus the ratio "
        "range. Shape: bounded panel broadcast against one corpus "
        "scan, one rank window, a two-row-per-query self-join"
    ),
    tags=("embeddings", "ann", "diagnostics"),
)
def emb_knn_margin(spark, sf_dir):
    from .queries_r6 import _int_d2_arr, _qvec

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _qvec("embedding").alias("q")
    )
    queries = emb.filter(F.col("vec_id") < _MARGIN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qv")
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("qid")
    )
    ranked = (
        pairs.select(
            "qid",
            F.col("vec_id").alias("cid"),
            _int_d2_arr(F.col("qv"), F.col("q")).alias("d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "cid")
            ),
        )
        .filter(F.col("rn") <= 2)
        # ≤ 2 rows per query feeding both self-join sides
        .localCheckpoint()
    )
    a = ranked.filter(F.col("rn") == 1).select(
        "qid",
        F.col("cid").cast("bigint").alias("nn1"),
        F.col("d2").cast("bigint").alias("d1_sq"),
    )
    b = ranked.filter(F.col("rn") == 2).select(
        "qid",
        F.col("cid").cast("bigint").alias("nn2"),
        F.col("d2").cast("bigint").alias("d2_sq"),
    )
    return a.join(b, "qid").select(
        "qid", "nn1", "d1_sq", "nn2", "d2_sq"
    )
