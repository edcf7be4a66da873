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

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=[*key, "slope", "intercept", "n"])
        y = [int(v) for v in pdf[value_col]]
        sy = sum(y)
        sxy = sum(i * v for i, v in enumerate(y))
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
