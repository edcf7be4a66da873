"""Property tests for the round-5 numeric operators: invariants that
must hold for ANY input, checked on randomized small frames (the
registry queries pin exact values; these pin the math)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTLE = dict(max_examples=12, deadline=None)


def _gini_reference(values):
    xs = sorted(values)
    n = len(xs)
    tot = sum(xs)
    if tot == 0:
        return None
    rs = sum((i + 1) * x for i, x in enumerate(xs))
    return 2.0 * rs / (n * tot) - (n + 1) / n


@settings(**SETTLE)
@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=2, max_size=60)
)
def test_gini_formula_bounds_and_equality_cases(spark, vals):
    """0 ≤ G < 1 always; all-equal → 0; matches the sorted reference
    regardless of tie-break order (ties share a value, so Σ r·x over
    any rank assignment of equal values is identical)."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "uid long, s long"
    )
    w = Window.orderBy("s", "uid")
    g = (
        df.withColumn("rnk", F.row_number().over(w))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s").alias("tot"),
            F.sum(F.col("rnk") * F.col("s")).alias("rs"),
        )
        .select(
            (
                F.lit(2.0) * F.col("rs")
                / (F.col("n").cast("double") * F.col("tot"))
                - (F.col("n").cast("double") + 1) / F.col("n")
            ).alias("g")
        )
        .first()["g"]
    )
    ref = _gini_reference(vals)
    assert abs(g - ref) < 1e-9
    assert 0.0 - 1e-9 <= g < 1.0
    if len(set(vals)) == 1:
        assert abs(g) < 1e-9


@settings(**SETTLE)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # ts
            st.one_of(st.none(), st.integers(-10**6, 10**6)),  # value
        ),
        min_size=3,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_linear_interpolation_stays_within_bracket(spark, rows):
    """Every filled value lies between its bracketing neighbors (floor
    can undershoot by <1 unit on the low side), and non-null cells pass
    through untouched."""
    df = spark.createDataFrame(
        [(t, v) for t, v in rows], "tus long, vc long"
    )
    order = [F.col("tus")]
    wp = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.orderBy(*order).rowsBetween(1, Window.unboundedFollowing)
    w = (
        df.withColumn("pv", F.last("vc", ignorenulls=True).over(wp))
        .withColumn(
            "pt",
            F.last(F.when(F.col("vc").isNotNull(), F.col("tus")),
                   ignorenulls=True).over(wp),
        )
        .withColumn("nv", F.first("vc", ignorenulls=True).over(wn))
        .withColumn(
            "nt",
            F.first(F.when(F.col("vc").isNotNull(), F.col("tus")),
                    ignorenulls=True).over(wn),
        )
    )
    interp = F.when(F.col("vc").isNotNull(), F.col("vc")).when(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("nt") > F.col("pt")),
        F.col("pv")
        + F.floor(
            (F.col("nv") - F.col("pv")).cast("double")
            * (F.col("tus") - F.col("pt"))
            / (F.col("nt") - F.col("pt"))
        ).cast("bigint"),
    )
    out = w.select("tus", "vc", "pv", "nv", interp.alias("ic")).collect()
    for r in out:
        if r["vc"] is not None:
            assert r["ic"] == r["vc"]
        elif r["ic"] is not None:
            lo = min(r["pv"], r["nv"]) - 1  # floor slack
            hi = max(r["pv"], r["nv"])
            assert lo <= r["ic"] <= hi, r


@settings(**SETTLE)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1000),  # price
            st.integers(min_value=1, max_value=50),    # weight
        ),
        min_size=1,
        max_size=50,
    )
)
def test_weighted_median_halves_the_mass(spark, rows):
    """The weighted nearest-rank median m satisfies
    Σ w[x ≤ m] ≥ W/2 and Σ w[x < m] < W/2 — i.e. m is the FIRST price
    reaching half the cumulative mass."""
    df = spark.createDataFrame(rows, "pc long, w long")
    g = df.groupBy("pc").agg(F.sum("w").alias("w"))
    wc = (
        Window.orderBy("pc")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.withColumn("cw", F.sum("w").over(wc)).withColumn(
        "tw", F.sum("w").over(Window.partitionBy())
    )
    m = c.agg(
        F.min(F.when(F.lit(2) * F.col("cw") >= F.col("tw"), F.col("pc")))
    ).first()[0]
    W = sum(w for _, w in rows)
    le = sum(w for p, w in rows if p <= m)
    lt = sum(w for p, w in rows if p < m)
    assert 2 * le >= W
    assert 2 * lt < W


@settings(**SETTLE)
@given(
    st.lists(st.integers(min_value=-10**6, max_value=10**6),
             min_size=8, max_size=80)
)
def test_iqr_fences_monotone_and_quartiles_ordered(spark, vals):
    """q1 ≤ q3 always, and widening from 1.5·IQR fences can only keep
    MORE points (monotonicity of the fence rule)."""
    df = spark.createDataFrame([(v,) for v in vals], "vc long")
    wr = Window.orderBy("vc")
    r = df.withColumn("rnk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    q = r.agg(
        F.min(F.when(F.col("rnk") * 4 >= F.col("n"), F.col("vc"))).alias("q1"),
        F.min(F.when(F.col("rnk") * 4 >= 3 * F.col("n"), F.col("vc"))).alias(
            "q3"
        ),
    ).first()
    q1, q3 = q["q1"], q["q3"]
    assert q1 <= q3
    iqr = q3 - q1
    out15 = [
        v for v in vals
        if 2 * v < 2 * q1 - 3 * iqr or 2 * v > 2 * q3 + 3 * iqr
    ]
    out30 = [
        v for v in vals
        if 2 * v < 2 * q1 - 6 * iqr or 2 * v > 2 * q3 + 6 * iqr
    ]
    assert len(out30) <= len(out15)
    # sanity: quartiles are actual data points
    assert q1 in vals and q3 in vals
    assert not math.isnan(float(iqr))
