"""Portable Bloom-filter artifacts — the membership primitive that
makes 100 TB decontamination/blocklist checks a MAP-ONLY pass.

Why an explicit artifact and not a join: the exact-join form of
decontamination (`doc_decontaminate`) shuffles the corpus n-grams
against the benchmark set every run. A Bloom filter is built ONCE from
the benchmark side (KB–MB of bits for millions of entries), ships to
every executor as a broadcast, and each corpus row tests membership
with k bit probes — zero shuffle, zero false negatives, tunable false
positives. Spark's own runtime bloom pruning (session posture) is
transparent and join-scoped; this one is an ARTIFACT: persistable,
reusable across jobs/days, applied far from any join.

Protocol (fixed, engine-portable): bit positions are
``(h1 + i·h2) mod m`` for i in [0,k) with ``h1 = xxhash64(v)`` and
``h2 = xxhash64(v, seed=1)`` — the standard double-hashing scheme;
both hashes compute JVM-SIDE (whole-stage codegen), so Python touches
only packed bitsets:

- build: per-partition numpy bitsets (``m/8`` bytes each) OR-merged
  EXECUTOR-SIDE via ``treeReduce(depth=2)`` — the driver receives only
  the final tree fan-in of fixed-size bitsets, never partitions × m/8,
  so partition count cannot OOM the driver even with m at the 2^29 cap.
- apply: the merged bitset broadcasts; an Arrow-batched pass tests k
  bits per row with numpy indexing.

Determinism: positions are pure functions of the value; the OR-merge
is commutative — the same input set yields the same filter bytes on
any cluster.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: refuse silly sizes: 64 MiB of bits ≈ 5.4e8 entries at 1% fp
MAX_BITS = 1 << 29


def optimal_params(n: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) minimizing size for ``n`` entries at ``fp_rate``."""
    m = max(64, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2)))) if n else 1
    return min(m, MAX_BITS), k


def _hash_cols(col: Column) -> list[Column]:
    return [
        F.xxhash64(col).alias("_h1"),
        F.xxhash64(col, F.lit(1)).alias("_h2"),
    ]


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int) -> bytes:
    """Build the filter from ``df[col]``'s distinct-or-not values
    (duplicates are harmless). Returns the packed little-endian bitset."""
    import numpy as np

    assert m_bits <= MAX_BITS, f"m_bits {m_bits} > {MAX_BITS}"
    hashed = df.select(*_hash_cols(F.col(col)))

    def _partial(batches):
        import pandas as pd

        bits = np.zeros(m_bits // 8 + 1, dtype=np.uint8)
        saw = False
        for pdf in batches:
            if not len(pdf):
                continue
            saw = True
            h1 = pdf["_h1"].to_numpy().astype(np.uint64)
            h2 = pdf["_h2"].to_numpy().astype(np.uint64)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                idx = (pos >> np.uint64(3)).astype(np.int64)
                mask = (
                    np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
                ).astype(np.uint8)
                # MUST be ufunc.at: fancy-index |= silently drops all but
                # one update when several bits land in the same byte
                np.bitwise_or.at(bits, idx, mask)
        if saw:
            yield pd.DataFrame({"b": [bits.tobytes()]})

    parts = hashed.mapInPandas(_partial, schema="b binary").rdd.map(
        lambda r: bytes(r["b"])
    )
    # OR-merge executor-side: treeReduce collapses the P partial bitsets
    # in a 2-level tree, so the driver receives the tree fan-in of
    # fixed-size m/8 bitsets — NOT P × m/8 (a plain collect would be
    # 64 MiB per non-empty partition with m at the cap).
    if parts.isEmpty():
        return np.zeros(m_bits // 8 + 1, dtype=np.uint8).tobytes()
    return parts.treeReduce(
        lambda a, b: (
            np.frombuffer(a, dtype=np.uint8)
            | np.frombuffer(b, dtype=np.uint8)
        ).tobytes(),
        depth=2,
    )


def bloom_contains(
    df: DataFrame, col: str, bloom: bytes, m_bits: int, k: int,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Append a boolean ``out_col``: False is definite, True is
    probabilistic (fp-rate bounded by construction)."""
    import numpy as np

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.frombuffer(bloom, dtype=np.uint8))
    cols = df.columns

    def _test(batches):
        bits = bc.value
        for pdf in batches:
            h1 = pdf["_h1"].to_numpy().astype(np.uint64)
            h2 = pdf["_h2"].to_numpy().astype(np.uint64)
            ok = np.ones(len(pdf), dtype=bool)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
                ok &= (
                    byte
                    & (
                        np.uint8(1)
                        << (pos & np.uint64(7)).astype(np.uint8)
                    )
                ) != 0
            out = pdf.drop(columns=["_h1", "_h2"])
            out[out_col] = ok
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} boolean"
    return df.select(*cols, *_hash_cols(F.col(col))).mapInPandas(
        _test, schema=schema
    )
