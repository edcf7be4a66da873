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
