"""Round-9 batch o: greedy k-center coreset selection (farthest-point
traversal) over the embedding table.

``emb_kcenter_coreset`` — the classic 2-approximation to the k-center
problem (Gonzalez 1985): seed with one point, then repeatedly add the
candidate FARTHEST from the already-selected set (max–min distance).
The selected points are the coreset a data-curation pipeline uses for
diversity sampling / annotation budgeting, and ``sel_d2`` — the
max–min distance absorbed at each step — is the coverage-radius curve
(monotone non-increasing, pinned by the gate): where it flattens is
where more coreset points stop buying diversity.

Complements the CENTROID family (`emb_lloyd_kmeans` minimizes mean
distortion; k-center minimizes the WORST-case radius — outliers get
covered instead of averaged away) and the sampling family
(`emb_class_downsample` stratifies by label; this stratifies by
geometry).

Determinism: the greedy runs over the bounded anchor frame
(vec_id < 128, the r9f twin convention — 100-TB production seeds
per-ANN-bucket candidates instead), distances are exact integer
milli²-L2, argmax ties break on the smaller vec_id, and the k = 8
rounds are UNROLLED IDENTICALLY on both sides (DataFrame steps vs
generated CTE chain) — a genuinely sequential selection, since each
round's winner changes the next round's distances.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register

_ANCHORS = 128
_K = 8
_SEED_ID = 0


def _kcenter_oracle() -> str:
    # every CTE is MATERIALIZED: the greedy chain references s{k-1}
    # twice per round (membership + exclusion), so DuckDB's default
    # inlined CTEs re-evaluate the whole prefix ~3^k times (measured
    # 81 s at sf0.01); materialization makes each round evaluate once
    ctes = [
        f"""q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0)
                                      AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id < {_ANCHORS})""",
        """p AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_sum(list_transform(range(1, len(a.qv) + 1),
                      i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
               AS d2
      FROM q a JOIN q b ON a.vec_id <> b.vec_id)""",
        f"s0(vec_id) AS MATERIALIZED (SELECT {_SEED_ID})",
    ]
    picks = [f"SELECT 0 AS step, CAST({_SEED_ID} AS BIGINT) AS center_id, "
             f"CAST(0 AS BIGINT) AS sel_d2"]
    for s in range(1, _K):
        prev = f"s{s - 1}"
        ctes.append(
            f"""m{s} AS MATERIALIZED (
      SELECT p.ia AS cand, min(p.d2) AS md
      FROM p
      WHERE p.ib IN (SELECT vec_id FROM {prev})
        AND p.ia NOT IN (SELECT vec_id FROM {prev})
      GROUP BY p.ia)""",
        )
        ctes.append(
            f"""c{s} AS MATERIALIZED (
      SELECT cand, md FROM m{s}
      ORDER BY md DESC, cand ASC LIMIT 1)""",
        )
        ctes.append(
            f"""s{s}(vec_id) AS MATERIALIZED (
      SELECT vec_id FROM {prev} UNION ALL SELECT cand FROM c{s})""",
        )
        picks.append(
            f"SELECT {s} AS step, CAST(cand AS BIGINT) AS center_id, "
            f"CAST(md AS BIGINT) AS sel_d2 FROM c{s}"
        )
    union = "\n    UNION ALL ".join(picks)
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    SELECT CAST(step AS BIGINT)"
        " AS step, center_id, sel_d2 FROM (" + union + ")"
    )


@register(
    "emb_kcenter_coreset",
    oracle=_kcenter_oracle(),
    description=(
        f"greedy k-center coreset (Gonzalez farthest-point, k = {_K}) "
        f"over the bounded anchor frame (vec_id < {_ANCHORS}): seed "
        f"with vec_id {_SEED_ID}, then each round adds the candidate "
        "with the MAXIMUM min-distance to the selected set (exact "
        "integer milli²-L2; ties to the smaller id). Emits the pick "
        "sequence with the coverage radius absorbed at each step — "
        "the monotone non-increasing curve (gate-pinned) whose elbow "
        "sets the diversity-sampling budget. The worst-case-radius "
        "complement to Lloyd's mean-distortion centroids: outliers "
        "get COVERED, not averaged away. Shape: one checkpointed "
        f"{_ANCHORS}²-pair integer matrix, then {_K - 1} unrolled "
        "rounds of (broadcast-membership min-agg → 1-row argmax) on "
        "that matrix — sequential BY NATURE (each winner changes the "
        "next round's distances); production seeds per-ANN-bucket "
        "candidates and runs the same rounds per bucket"
    ),
    tags=("embeddings", "similarity", "sampling"),
)
def emb_kcenter_coreset(spark, sf_dir):
    q = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _ANCHORS)
        .select("vec_id", _qvec().alias("qv"))
    )
    a = q.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa"))
    b = q.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb"))
    # Spark computes the bounded pair matrix (ONE job, map-side HOF
    # distances over the broadcast self-join); the k-round greedy then
    # runs driver-side over the collected artifact — the codebook-fit
    # convention (operators/pq.py): a DataFrame-per-round form was
    # measured at ~10 s of pure job-scheduling overhead for 16k rows
    from ..operators.pq import bounded_collect

    pairs = bounded_collect(
        a.join(F.broadcast(b), F.col("ia") != F.col("ib")).select(
            "ia", "ib", _int_d2_arr("qa", "qb").alias("d2")
        ),
        "emb_kcenter_coreset pair matrix",
        cap=_ANCHORS * _ANCHORS,
    )
    d2 = {(r["ia"], r["ib"]): int(r["d2"]) for r in pairs}
    cands = sorted({ia for ia, _ in d2})
    picks = [(0, _SEED_ID, 0)]
    selected = [_SEED_ID]
    for s in range(1, _K):
        best = None
        for ia in cands:
            if ia in selected:
                continue
            md = min(d2[(ia, ib)] for ib in selected)
            # max md, ties to the smaller id (cands is ascending)
            if best is None or md > best[1]:
                best = (ia, md)
        picks.append((s, best[0], best[1]))
        selected.append(best[0])
    return spark.createDataFrame(
        picks, "step bigint, center_id bigint, sel_d2 bigint"
    )
