"""Grouped-map operators (``applyInPandas``): whole-group custom logic
the aggregate/window algebra can't express — each (Currency,Event)
series arrives as ONE pandas frame (SURVEY §2.10's grouped processing,
the distributed form of the reference's per-group dict partitioning
TRAIN:184-231).

Scale shape: one hash shuffle on the series key; each group must fit a
worker's memory (economic series are O(10²-10³) rows — trivially). For
monster groups, pre-aggregate or salt upstream; Arrow ships the group
in columnar batches either way.

Determinism contract: inside the UDF all accumulation is int64 over
integer cents and row indexes (exact), with a single final float
division — bit-identical to an oracle computing the same closed form.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame


def series_trend(
    df: DataFrame,
    key: Sequence[str] = ("Currency", "Event"),
    value_col: str = "value_c",
    order: Sequence[str] = ("event_ts",),
) -> DataFrame:
    """Per-series OLS linear trend over row index (x = 0..n-1 in time
    order, y = integer cents): slope, intercept, n — the "is this
    indicator drifting" primitive.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept = (Σy − slope·Σx)/n;
    both denominators integer-exact, n≥2 groups only.
    """
    key = list(key)
    out_schema = ", ".join(
        [f"{k} {dict(df.dtypes)[k]}" for k in key]
        + ["slope double", "intercept double", "n long"]
    )
    sort_cols = [*order, value_col]

    import numpy as np

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=[*key, "slope", "intercept", "n"])
        order_idx = np.lexsort(
            [pdf[c].to_numpy() for c in reversed(sort_cols)]
        )
        # int64 numpy accumulation — exact for |values| within the
        # documented bounds, identical to arbitrary-precision sums
        y = pdf[value_col].to_numpy(np.int64)[order_idx]
        x = np.arange(n, dtype=np.int64)
        sy = int(y.sum())
        sxy = int((x * y).sum())
        sx = n * (n - 1) // 2
        sx2 = (n - 1) * n * (2 * n - 1) // 6
        den = n * sx2 - sx * sx
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
        return pd.DataFrame(
            {
                **{k: [pdf[k].iloc[0]] for k in key},
                "slope": [slope],
                "intercept": [intercept],
                "n": [n],
            }
        )

    return df.groupBy(*key).applyInPandas(_fit, schema=out_schema)


def series_trend_fast(
    df: DataFrame,
    key: Sequence[str] = ("Currency", "Event"),
    value_col: str = "value_c",
    order: Sequence[str] = ("event_ts",),
) -> DataFrame:
    """Same OLS trend as :func:`series_trend`, built for MANY groups.

    ``applyInPandas`` pays per-GROUP overhead (one Arrow round-trip and
    pandas frame per group — measured ~1 ms/group/core even for a no-op
    UDF: fine for 10³ series, wrong for 10⁷). This form pays per-BATCH
    overhead instead: repartition on the key + sortWithinPartitions
    makes every group contiguous inside a partition, then ONE
    ``mapInPandas`` pass reduces each Arrow batch with numpy slices,
    carrying partial sums across batch boundaries. Identical output
    (int64-exact sums, same division tree).
    """
    import numpy as np

    key = list(key)
    out_schema = ", ".join(
        [f"{k} {dict(df.dtypes)[k]}" for k in key]
        + ["slope double", "intercept double", "n long"]
    )
    narrow = df.select(*key, *order, value_col)
    parts = narrow.repartition(*key).sortWithinPartitions(*key, *order, value_col)

    def _finish(kvals, n, sy, sxy):
        if n < 2:
            return None
        sx = n * (n - 1) // 2
        sx2 = (n - 1) * n * (2 * n - 1) // 6
        slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
        intercept = (sy - slope * sx) / n
        return (*kvals, slope, intercept, n)

    def _reduce(batches):
        carry = None  # (key_tuple, n, sy, sxy)
        for pdf in batches:
            out = []
            y = pdf[value_col].to_numpy(np.int64)
            keys = list(zip(*(pdf[k] for k in key)))
            m = len(pdf)
            # group boundaries within the (sorted) batch
            starts = [0] + [i for i in range(1, m) if keys[i] != keys[i - 1]]
            ends = starts[1:] + [m]
            for s_, e_ in zip(starts, ends):
                kv, seg = keys[s_], y[s_:e_]
                ln = e_ - s_
                if carry is not None and carry[0] == kv:
                    _, n0, sy0, sxy0 = carry
                    x = np.arange(n0, n0 + ln, dtype=np.int64)
                    acc = (kv, n0 + ln, sy0 + int(seg.sum()), sxy0 + int((x * seg).sum()))
                else:
                    if carry is not None:
                        row = _finish(*carry)
                        if row:
                            out.append(row)
                    x = np.arange(ln, dtype=np.int64)
                    acc = (kv, ln, int(seg.sum()), int((x * seg).sum()))
                carry = acc
                if e_ != m:  # group closed inside this batch
                    row = _finish(*carry)
                    if row:
                        out.append(row)
                    carry = None
            if out:
                yield pd.DataFrame(out, columns=[*key, "slope", "intercept", "n"])
        if carry is not None:
            row = _finish(*carry)
            if row:
                yield pd.DataFrame([row], columns=[*key, "slope", "intercept", "n"])

    return parts.mapInPandas(_reduce, schema=out_schema)


def series_robust_stats_fast(
    df: DataFrame,
    key: Sequence[str] = ("user_id", "event_type"),
    value_col: str = "value_c",
    tie_col: str = "event_id",
) -> DataFrame:
    """JVM hot-path twin of the nearest-rank median/MAD UDAFs: per-series
    (n, med_c, mad_c) via the double row_number construction — no Python
    worker, whole-stage codegen end to end.

    Rank values within each series (tie-broken by ``tie_col`` for a
    deterministic but value-irrelevant order); the lower nearest-rank
    median — the element at rank ``(n+1) div 2``, never interpolated —
    is then LIFTED ONTO EVERY ROW as a conditional window max
    (``max(case when rn = median_rank then value end) over key``)
    instead of being joined back: the join-back form rescanned and
    re-shuffled the whole table because the broadcast join destroyed
    the window partitioning (measured: 2 scans + 2 exchanges → this
    form: 1 scan + 1 exchange, all four windows share the one
    hash-partitioning). Deviations are then ranked in the same
    partitions (a sort, not a shuffle) and the same nearest rank is
    the MAD.

    Scale shape: ONE hash shuffle on the series key feeds everything;
    cost is two in-partition sorts. Versus the UDAF form this avoids
    per-group Arrow round-trips (~1 ms/group) — the form to use for
    10⁶+ series; the UDAF stays as the API-seam demo
    (tests/test_operators.py compares the two on identical input).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    key = list(key)
    v = df.select(*key, tie_col, value_col)
    w_key = Window.partitionBy(*key)
    w_val = w_key.orderBy(F.col(value_col).asc(), F.col(tie_col).asc())
    ranked = v.select(
        *key,
        value_col,
        tie_col,
        F.row_number().over(w_val).alias("_rn"),
        F.count(F.lit(1)).over(w_key).alias("n"),
    )
    withmed = ranked.withColumn(
        "med_c",
        F.max(
            F.when(
                F.col("_rn") == F.expr("(n + 1) div 2"), F.col(value_col)
            )
        ).over(w_key),
    ).withColumn("_d", F.abs(F.col(value_col) - F.col("med_c")))
    w_dev = w_key.orderBy(F.col("_d").asc(), F.col(tie_col).asc())
    return (
        withmed.withColumn("_rn2", F.row_number().over(w_dev))
        .filter(F.col("_rn2") == F.expr("(n + 1) div 2"))
        .select(*key, "n", "med_c", F.col("_d").alias("mad_c"))
    )


# ---------------------------------------------------------------- UDAF
# Grouped-aggregate pandas UDFs (SURVEY §2.10's UDAF seam): one scalar
# per group, evaluated by AggregateInPandas — multiple UDAFs in one
# agg() share a single shuffle + Arrow pass. Nearest-rank definitions
# keep them integer-exact (no interpolation → engine-portable).


def nearest_rank_median_udaf():
    """GROUPED_AGG pandas_udf: lower nearest-rank median of an int64
    column — sorted[(n-1)//2], an actual element, never interpolated."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _med(v: pd.Series) -> int:
        import numpy as np

        a = np.sort(v.to_numpy(dtype="int64"))
        return int(a[(len(a) - 1) // 2])

    return _med


def nearest_rank_mad_udaf():
    """GROUPED_AGG pandas_udf: median absolute deviation with both
    medians nearest-rank — the robust dispersion the z-score anomaly
    flagger should use when outliers poison mean/stddev."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _mad(v: pd.Series) -> int:
        import numpy as np

        a = np.sort(v.to_numpy(dtype="int64"))
        med = a[(len(a) - 1) // 2]
        d = np.sort(np.abs(a - med))
        return int(d[(len(d) - 1) // 2])

    return _mad


def count_udaf():
    """GROUPED_AGG pandas_udf count — exists because Spark disallows
    mixing pandas UDAFs with JVM aggregates in one agg()
    (INVALID_PANDAS_UDF_PLACEMENT); this lets n ride the same Arrow
    pass as the robust stats."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return len(v)

    return _n
