"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` within the same key — the time-series join Spark
lacks as a primitive (the reference's high-water-mark filter PUSH:160-167
is its degenerate scalar case).

Scale-correct construction — union + ordered window, NOT a range join:

    tag left/right → unionByName → window per key ordered by (ts, side)
    → last non-null right-payload at-or-before current row → keep left.

One hash shuffle on the key, partition-local sort, zero row expansion.
A naive ``l.key = r.key AND r.ts <= l.ts`` join explodes to the full
per-key cross product before aggregation (O(n·m) per key); the window
form is O(n+m) per key and AQE-splittable on skewed keys.

Tie semantics: a right row at exactly left.ts IS visible (<=), ties
between right rows at the same ts resolve to the one with the larger
tie-break column (deterministic), matching DuckDB's ASOF JOIN on >=.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("value",),
    tie_break: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach, to every ``left`` row, the most recent ``right`` values
    at-or-before its timestamp (per key). Left rows with no prior right
    row get NULLs (left-outer semantics)."""
    lcols = left.columns
    payload = [F.col(c).alias(f"__r_{c}") for c in value_cols]
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[F.col(c) if c in (*key, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.lit(1).alias("__side"),
        *payload,
    )
    both = l_tag.unionByName(r_tag)

    # right rows (side=1) sort BEFORE left rows at equal ts so an
    # exactly-simultaneous right row is visible to the left row (<=)
    order = [F.col(ts_col).asc(), F.col("__side").desc()]
    if tie_break:
        order.append(F.col(tie_break).asc_nulls_first())
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = both
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return out.filter(F.col("__side") == 0).select(
        *lcols, *[F.col(f"{c}{suffix}") for c in value_cols]
    )
