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
    # tie_break is a RIGHT-side column (e.g. a version number): carry it
    # through the union as __tb (NULL on left rows) so the window can
    # order on it — right rows at the same ts resolve to the largest
    # tie_break via F.last over the ascending order
    tb_l = (
        [F.lit(None).cast(right.schema[tie_break].dataType).alias("__tb")]
        if tie_break
        else []
    )
    tb_r = [F.col(tie_break).alias("__tb")] if tie_break else []
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *tb_l,
    )
    r_tag = right.select(
        *[F.col(c) if c in (*key, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.lit(1).alias("__side"),
        *payload,
        *tb_r,
    )
    both = l_tag.unionByName(r_tag)

    # right rows (side=1) sort BEFORE left rows at equal ts so an
    # exactly-simultaneous right row is visible to the left row (<=)
    order = [F.col(ts_col).asc(), F.col("__side").desc()]
    if tie_break:
        order.append(F.col("__tb").asc_nulls_first())
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


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    suffix: str = "_near",
) -> DataFrame:
    """Attach, to every ``left`` row, the ``right`` value whose
    timestamp is NEAREST in either direction (per key); ties (equal
    |Δt| before and after) resolve to the EARLIER right row.

    Same union + ordered-window construction as :func:`asof_join` — and
    the same scale shape: ONE hash shuffle on the key serves BOTH
    directions, because the backward pass (last right at-or-before,
    frame ``(-∞, 0]``) and the forward pass (first right strictly
    after, frame ``[0, +∞)``) are two frames over the SAME window
    ordering, which Catalyst stacks behind a single exchange. A right
    row at exactly left.ts sorts before the left row (side desc), so
    it lands in the backward candidate with Δ = 0 and always wins.

    ``right`` must be unique per (key, ts) — pre-aggregate ties away
    (as the as-of queries do) so both candidates are well-defined.
    """
    lcols = left.columns
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(right.schema[value_col].dataType)
        .alias("__r_v"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
    )
    r_tag = right.select(
        *[
            F.col(c)
            if c in (*key, ts_col)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(1).alias("__side"),
        F.col(value_col).alias("__r_v"),
        F.col(ts_col).alias("__r_ts"),
    )
    both = l_tag.unionByName(r_tag)
    order = [F.col(ts_col).asc(), F.col("__side").desc()]
    wb = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    cand = (
        both.withColumn("__pv", F.last("__r_v", ignorenulls=True).over(wb))
        .withColumn("__pts", F.last("__r_ts", ignorenulls=True).over(wb))
        .withColumn("__nv", F.first("__r_v", ignorenulls=True).over(wf))
        .withColumn("__nts", F.first("__r_ts", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 0)
    )
    d_prev = F.unix_micros(F.col(ts_col)) - F.unix_micros("__pts")
    d_next = F.unix_micros("__nts") - F.unix_micros(F.col(ts_col))
    take_prev = F.col("__nts").isNull() | (
        F.col("__pts").isNotNull() & (d_prev <= d_next)
    )
    return cand.select(
        *lcols,
        F.when(take_prev, F.col("__pv"))
        .otherwise(F.col("__nv"))
        .alias(f"{value_col}{suffix}"),
        F.when(take_prev, F.col("__pts"))
        .otherwise(F.col("__nts"))
        .alias(f"{ts_col}{suffix}"),
    )
