"""Distributed logistic regression (batch gradient descent) — the
quality-classifier seam of corpus pipelines (fastText-style keep/drop
scorers, CCNet-style quality heads) expressed in the engine's
deterministic-partials idiom.

Shape per iteration: ONE Arrow-batched pass computes per-partition
gradient partials; every per-row gradient contribution quantizes to
integer micro-units BEFORE summation, so partials are exact int64 and
their merge is order/partitioning-independent (the ``pca.py``
covariance treatment — distributed float sums never appear). The
driver holds only the (d+1)-vector of weights, re-shipped to executors
each round via the task closure; the collect per iteration is d+3
cells, bounded by DIMENSION, never rows.

Determinism contract: given identical inputs, the fitted weights are
bit-identical on any cluster size — pinned by
``test_logreg_matches_sequential_reference`` against a sequential
numpy twin using the same quantization.

At 100 TB: each iteration is a map-side-combined d-cell aggregate
(shuffle volume = partitions × d rows of 3 ints); n_iter passes of the
corpus-resident features. Mini-batching / L-BFGS are out of scope —
this is the engine's GD primitive, not an ML library.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _grad_partials(
    df: DataFrame, w, b: float, vec_col: str, y_col: str
) -> DataFrame:
    """(j, s) integer partials: j∈[0,d) gradient components ·MICRO,
    j=-1 bias gradient, j=-2 total log-loss ·MICRO, j=-3 row count."""
    import numpy as np

    w = np.asarray(w, dtype=np.float64)

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = pdf[y_col].to_numpy().astype(np.float64)
            z = X @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            # per-ROW quantization before any sum → exact int64 partials
            Gq = np.rint((X * r[:, None]) * MICRO).astype(np.int64)
            g = Gq.sum(axis=0)
            gb = int(np.rint(r * MICRO).astype(np.int64).sum())
            eps = 1e-12
            ll = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
            lq = int(np.rint(ll * MICRO).astype(np.int64).sum())
            d = X.shape[1]
            yield pd.DataFrame(
                {
                    "j": list(range(d)) + [-1, -2, -3],
                    "s": list(g) + [gb, lq, len(pdf)],
                }
            )

    return df.mapInPandas(_partial, schema="j int, s long")


def logreg_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    y_col: str = "y",
    n_iter: int = 25,
    lr: float = 2.0,
    l2: float = 1e-3,
):
    """Fit w, b by full-batch GD; returns (w ndarray d, b float,
    losses list). ``df`` must carry ``y_col`` ∈ {0,1} and a float
    vector column."""
    import numpy as np

    first = df.select(F.size(vec_col).alias("d")).first()
    d = int(first["d"])
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    losses: list[float] = []
    src = df.select(vec_col, y_col)
    for _ in range(n_iter):
        rows = (
            _grad_partials(src, w, b, vec_col, y_col)
            .groupBy("j")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        assert len(rows) <= d + 3, "collect exceeds d bound"
        cells = {r["j"]: r["s"] for r in rows}
        n = cells[-3]
        g = np.array([cells[j] for j in range(d)], dtype=np.float64)
        g = g / n / MICRO + l2 * w
        gb = cells[-1] / n / MICRO
        losses.append(cells[-2] / n / MICRO)
        w = w - lr * g
        b = b - lr * gb
    return w, b, losses


def logreg_predict(
    df: DataFrame, w, b: float, vec_col: str = "embedding"
) -> DataFrame:
    """Map-only scoring with the fitted weights as plan literals:
    p = sigmoid(w·x + b), via zip_with/aggregate (JVM, no Python)."""
    wl = F.array(*[F.lit(float(v)) for v in w])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), wl, lambda a, c: a * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    z = dot + F.lit(float(b))
    return df.withColumn("p", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
