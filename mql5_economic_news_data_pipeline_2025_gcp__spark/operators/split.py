"""Chronological 70/15/15 split (reference ``split_data_by_time``
TRAIN:131-153 — W3).

Correctness form (used for oracle checks at test SF): global
``row_number`` over the time order with the reference's exact floor
arithmetic — ``n_train = floor(0.7*n)``, ``n_val = floor(0.15*n)``,
remainder → test.

Scale form: a global window serializes through one task. At 100 TB the
engine computes quantile cutoff *timestamps* instead —
``approxQuantile('event_ts', [0.7, 0.85])`` (two tiny jobs) and labels by
comparison, which is a map-only stage. ``split_labels(..., exact=False)``
selects that path; the exact path remains for small-SF parity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RATIOS = (0.70, 0.15, 0.15)


def split_labels(
    df: DataFrame,
    order: Sequence[str] = ("event_ts",),
    label_col: str = "split",
    exact: bool = True,
) -> DataFrame:
    """Attach 'train'/'val'/'test' labels chronologically.

    exact=True  : reference floor-arithmetic parity (global window).
    exact=False : quantile-cutoff scale path (no global sort).
    """
    if exact:
        w = Window.orderBy(*[F.col(c) for c in order])
        n = df.count()
        n_train = int(n * RATIOS[0])
        n_val = int(n * RATIOS[1])
        return df.withColumn("_rn", F.row_number().over(w)).withColumn(
            label_col,
            F.when(F.col("_rn") <= n_train, "train")
            .when(F.col("_rn") <= n_train + n_val, "val")
            .otherwise("test"),
        ).drop("_rn")
    # scale path: cutoffs on the primary order column
    c0 = order[0]
    cuts = df.approxQuantile(c0, [RATIOS[0], RATIOS[0] + RATIOS[1]], 0.001) \
        if dict(df.dtypes)[c0] in ("double", "float", "bigint", "int") else None
    if cuts is None:
        # timestamp column: quantile over epoch seconds
        sec = df.select(F.unix_timestamp(F.col(c0)).alias("_s"))
        q = sec.approxQuantile("_s", [RATIOS[0], RATIOS[0] + RATIOS[1]], 0.001)
        return df.withColumn(
            label_col,
            F.when(F.unix_timestamp(F.col(c0)) <= q[0], "train")
            .when(F.unix_timestamp(F.col(c0)) <= q[1], "val")
            .otherwise("test"),
        )
    return df.withColumn(
        label_col,
        F.when(F.col(c0) <= cuts[0], "train")
        .when(F.col(c0) <= cuts[1], "val")
        .otherwise("test"),
    )
