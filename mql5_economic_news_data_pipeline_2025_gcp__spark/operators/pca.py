"""Distributed PCA over embedding columns — the covariance-collect
form that is exact, deterministic, and scales.

Shape: ONE Arrow-batched pass computes per-partition covariance
partials as INTEGER micro-unit sums (components quantize to micro
before any product, so partials are exact int64 and their merge is
order-independent — the float-sum nondeterminism that plagues naive
distributed PCA never appears); the driver collects only the d×d Gram
cells (BOUNDED by dimension², never by rows — 64×64 here, the same
out-of-band-fit contract as the PQ codebooks), runs one `numpy.eigh`,
and ships the top-k components back as plan literals for a map-only
projection.

Magnitude budget: |component| ≤ ~4 ⇒ micro ≤ 4e6; per-row product
≤ 1.6e13; int64 holds ~5.8e5 such rows per PARTITION partial — far
above any sane partition row count; the partial merge then happens in
Python ints (arbitrary precision) on the ≤ d² collected cells, so the
TOTAL never overflows at any corpus size.

Determinism: eigh on identical integers is bit-stable per platform;
eigenvector sign is canonicalized (largest-|component| coordinate made
positive) so reruns and the numpy reference agree exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000


def covariance_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, s_micro2, n) integer partials of the uncentered second
    moment plus first-moment sums (j = -1 rows). Upper triangle only."""

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q = np.rint(V * MICRO).astype(np.int64)
            d = Q.shape[1]
            G = Q.T @ Q  # int64 exact within the magnitude budget
            s1 = Q.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(d)]),
                    "j": np.concatenate([ju, np.full(d, -1)]),
                    "s": np.concatenate([G[iu, ju], s1]),
                    "n": np.full(len(iu) + d, len(pdf), dtype=np.int64),
                }
            )

    return df.mapInPandas(_partial, schema="i int, j int, s long, n long")


def pca_fit(
    spark: SparkSession, df: DataFrame, k: int = 8, vec_col: str = "embedding"
):
    """Fit top-k principal components; returns (components ndarray
    k×d, explained_variance ndarray k, mean ndarray d). The collect is
    bounded by d²+d cells (asserted), never by rows."""
    import numpy as np

    parts = (
        covariance_partials(df, vec_col)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    d = max(r["i"] for r in parts) + 1
    assert len(parts) <= d * (d + 1) // 2 + d, "collect exceeds d^2 bound"
    n = max(r["n"] for r in parts)
    G = np.zeros((d, d), dtype=float)
    s1 = np.zeros(d, dtype=float)
    for r in parts:
        if r["j"] == -1:
            s1[r["i"]] = r["s"]
        else:
            G[r["i"], r["j"]] = r["s"]
            G[r["j"], r["i"]] = r["s"]
    mean = s1 / n / MICRO
    cov = G / n / MICRO**2 - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    # canonical sign: the largest-|x| coordinate of each component > 0
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1
    return comps, w[order], mean


def pca_project(
    df: DataFrame, comps, mean, vec_col: str = "embedding"
) -> DataFrame:
    """Map-only projection onto literal components (centered)."""
    d = len(mean)
    centered = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x, i: x - F.element_at(F.array(*[F.lit(float(m)) for m in mean]), i + 1),
    )
    cols = []
    for ci, c in enumerate(comps):
        lit = F.array(*[F.lit(float(x)) for x in c])
        cols.append(
            F.aggregate(
                F.zip_with(centered, lit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"pc{ci}")
        )
    return df.select("vec_id", *cols)
