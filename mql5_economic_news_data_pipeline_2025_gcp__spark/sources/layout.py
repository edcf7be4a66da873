"""Multi-dimensional data layout: Z-order (Morton) clustering + file
skipping — the OPTIMIZE ZORDER BY idea (Delta/Iceberg) on plain
parquet + the txn manifest's min/max stats.

Why it exists: ``overwrite_with_stats`` sorts on ONE column, so files
hold disjoint ranges of that column and predicates on it prune — but a
predicate on any OTHER column finds every file spanning that column's
whole domain and prunes nothing. Interleaving the bits of k bucketed
dimensions into one Morton key makes file boundaries axis-aligned
rectangles in k-space: a range predicate on ANY clustered dimension
overlaps only ~n^((k-1)/k) of n files instead of all of them.

Everything is JVM Column expressions (shift/mask trees, whole-stage
codegen); the only driver-side data is one 2k-scalar bounds row. At
100 TB the write is one range-repartition on the key (the same shuffle
a single-dim sort pays) and pruning happens at MANIFEST level — the
scan never lists skipped files (``txn.read_pruned_multi``).

Reference parity: extends the S-family sink surface (SURVEY §2.1) the
same way ``save_sorted`` does; no analogue exists in the reference (a
MySQL row store).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, lo, hi, bits: int) -> Column:
    """Affine map of a numeric column onto integer buckets
    [0, 2^bits): floor((x−lo)·(2^bits−1) / (hi−lo)). Bucketing affects
    LAYOUT quality only — pruning correctness comes from real per-file
    min/max footer stats, so the double division here cannot produce a
    wrong query result, only (at absurd ranges) a marginally less tight
    clustering; the writer still asserts the product stays in the
    double-exact regime. Degenerate range (lo == hi) → bucket 0."""
    span = int(hi) - int(lo)
    if span <= 0:
        return F.lit(0).cast("bigint")
    scale = (1 << bits) - 1
    return (
        (col.cast("bigint") - F.lit(int(lo))) * F.lit(scale) / F.lit(span)
    ).cast("bigint")


def morton_key(bucketed: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each bucketed dimension into
    one bigint Morton key: bit i of dimension j lands at position
    i·k + j. A pure shift/mask expression tree (bits·k terms) — no UDF,
    no shuffle of its own."""
    k = len(bucketed)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(bucketed):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def write_zordered(
    df: DataFrame,
    root: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
) -> int:
    """Z-order-cluster ``df`` on ``cols`` and commit with per-file
    min/max stats for every clustered column (txn manifest) — readers
    prune with :func:`txn.read_pruned` / :func:`txn.read_pruned_multi`.

    One bounds aggregate (2k scalars to the driver), one
    range-repartition on the Morton key, per-file sort, one atomic
    manifest commit. Returns the committed version."""
    from .txn import overwrite_with_stats

    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    bucketed = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        assert lo is not None and hi is not None, f"no bounds for {c}"
        assert (int(hi) - int(lo)) < (1 << (53 - bits)), (
            f"{c} range too wide for exact bucket arithmetic at "
            f"bits={bits}; lower bits or pre-scale the column"
        )
        bucketed.append(bucketize(F.col(c), lo, hi, bits))
    d2 = df.withColumn("__z", morton_key(bucketed, bits))
    d2 = (
        d2.repartitionByRange(num_files, "__z")
        if num_files
        else d2.repartitionByRange("__z")
    ).sortWithinPartitions("__z")
    return overwrite_with_stats(
        d2.drop("__z"), root, stat_cols=cols, sort_within=False
    )
