"""Full Lloyd k-means iterations over an embedding column — the
iterative-numeric custom operator class (beyond the single assign step
`emb_kmeans_assign` and the connected-components iterations in dedup).

Reference seam: the reference pipeline trains models OUTSIDE the engine
(SURVEY §2.10); clustering for corpus curation (IVF cell fitting,
semantic dedup buckets, stratification) is the in-engine counterpart a
100 TB training-data pipeline needs.

Scale + determinism design:

- **Assignment is map-only.** Centroids are collected driver-side each
  round (k·d doubles — tiny, the legitimate driver scalar, same class
  as CC's convergence sum) and re-enter the plan as LITERAL arrays, so
  assignment is a zip_with/aggregate Column expression over a broadcast
  of nothing — no join, no shuffle on the corpus.
- **Recompute is one narrow shuffle.** posexplode to (cluster, dim,
  micro-int) rows, integer SUM per (cluster, dim) — coordinate sums are
  EXACT in any aggregation order because inputs are quantized to
  integer micro-units first (the engine-wide contract for
  order-independent float aggregation); the division back to a double
  centroid is one deterministic op per coordinate.
- **Convergence is integer equality** of consecutive centroid vectors
  in micro-space — no epsilon tuning, no float drift across rounds; the
  loop re-plans from literals each round so lineage does NOT grow with
  iterations (nothing to checkpoint).
- Ties (equal cosine to two centroids) break to the lower centroid id
  via struct-max over (rounded cosine, -cid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pq import bounded_collect
from .similarity import _as_double, cosine


def _assign_expr(vec_col: str, centroids: list[list[float]]):
    """argmax-cosine assignment as a pure Column expression over
    literal centroid arrays; ties break to the lower centroid id."""
    scored = [
        F.struct(
            F.round(
                cosine(F.col(vec_col), F.array(*[F.lit(x) for x in c])), 6
            ).alias("cs"),
            F.lit(-j).alias("ncid"),
        )
        for j, c in enumerate(centroids)
    ]
    best = F.array_max(F.array(*scored))
    return (-best["ncid"]).cast("int")


def lloyd_kmeans(
    emb: DataFrame,
    k: int = 8,
    max_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, int]:
    """Run Lloyd iterations to convergence (or ``max_iters``); returns
    (assignments DataFrame [id, cluster, n_iters], iterations run).

    Deterministic init: the embeddings of the k smallest ids.
    """
    # persist the working set for the duration of the loop: every round
    # re-reads it twice (assignment + recompute) and without the cache
    # each iteration re-scans parquet and re-casts the vectors. At test
    # SF the measured win is small — per-round wall time there is
    # dominated by codegen compilation of the fresh literal-centroid
    # expression (~2 s/round, data-independent); at 100 TB the avoided
    # corpus re-scans are the entire cost. Owner-clears on exit
    # (engine cache rule)
    v = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("e")).persist()

    seed_rows = bounded_collect(
        v.filter(F.col(id_col) < k).orderBy(id_col), "lloyd_kmeans seeds"
    )
    centroids = [list(r["e"]) for r in seed_rows]

    def micro(cs: list[list[float]]) -> list[tuple[int, ...]]:
        return [tuple(round(x * 1_000_000) for x in c) for c in cs]

    n_iters = 0
    for _ in range(max_iters):
        n_iters += 1
        assigned = v.select(
            id_col, "e", _assign_expr("e", centroids).alias("cluster")
        )
        # exact integer coordinate sums -> new centroids (k*d rows —
        # the aggregate's cardinality, never the corpus's; the bound
        # enforces that)
        sums = bounded_collect(
            assigned.select(
                "cluster", F.posexplode("e").alias("dim", "x")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.round(F.col("x") * 1_000_000).cast("bigint")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ),
            "lloyd_kmeans centroid sums",
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (
                r["s"] / r["n"]
            ) / 1_000_000.0
        new_centroids = [
            [by_cluster[j][d] for d in sorted(by_cluster[j])]
            if j in by_cluster
            else centroids[j]  # empty cluster keeps its centroid
            for j in range(k)
        ]
        if micro(new_centroids) == micro(centroids):
            centroids = new_centroids
            break
        centroids = new_centroids

    final = v.select(
        id_col,
        _assign_expr("e", centroids).alias("cluster"),
        F.lit(n_iters).alias("n_iters"),
    )
    # materialize the final assignment before releasing the cached
    # working set (localCheckpoint truncates lineage off the cache)
    final = final.localCheckpoint(eager=True)
    v.unpersist()
    return final, n_iters
