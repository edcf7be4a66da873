"""Round-11k batch: recurrence quantification and economic order
quantity.

``evt_recurrence_quantification`` — RQA (Zbilut & Webber) over each
type's daily cent series: the recurrence RATE (fraction of day pairs
within tolerance ε) and DETERMINISM (fraction of recurrent pairs lying
on a diagonal line of length ≥ 2 — i.e. recurrences that are part of a
repeated TRAJECTORY, not isolated coincidences). This is the
nonlinear-dynamics lens next to `evt_sample_entropy` (template
regularity), `evt_higuchi_fd` (fractal length) and
`evt_permutation_entropy` (ordinal complexity): white noise has
RR > 0 but DET ≈ 0, periodic regimes push DET → 1. All counts are
exact integers on a |days|²-bounded pair frame per type (the
calendar-bounded self-join discipline); ε is a literal in both
engines.

``rel_eoq_components`` — the economic-order-quantity inputs per part
brand: annual demand units and the exact average unit price as a
rational (price cent sum, unit count), with the classical
EOQ = √(2DS/h) assembled in the gate from a literal order cost S and
holding rate. Completes the inventory-theory family next to
`rel_newsvendor_stock` (single-period), `rel_inventory_policy` (s, S)
and `rel_mrp_projection` (time-phased requirements).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

#: RQA tolerance (cents) — literal in both engines, same order as the
#: sample-entropy tolerance (daily totals move in the 1e5-cent range).
_RQA_EPS = 40000


@register(
    "evt_recurrence_quantification",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS i,
             x
      FROM d),
    rec AS (
      SELECT a.event_type, a.i AS i, b.i AS j
      FROM s a JOIN s b
        ON b.event_type = a.event_type AND b.i > a.i
      WHERE abs(a.x - b.x) <= {_RQA_EPS}),
    det AS (
      SELECT r.event_type, r.i, r.j,
             CASE WHEN p.i IS NOT NULL OR n.i IS NOT NULL
                  THEN 1 ELSE 0 END AS on_line
      FROM rec r
      LEFT JOIN rec p ON p.event_type = r.event_type
        AND p.i = r.i - 1 AND p.j = r.j - 1
      LEFT JOIN rec n ON n.event_type = r.event_type
        AND n.i = r.i + 1 AND n.j = r.j + 1),
    pts AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY event_type)
    SELECT p.event_type, p.n,
           CAST(coalesce(sum(1), 0) AS BIGINT) AS rec_n,
           CAST(coalesce(sum(on_line), 0) AS BIGINT) AS det_n
    FROM pts p JOIN det x ON x.event_type = p.event_type
    GROUP BY p.event_type, p.n
    """,
    description=(
        "recurrence quantification (RQA) per event type over daily "
        "cent totals: recurrent day pairs within a literal ε plus the "
        "count lying on diagonal lines of length ≥ 2 — recurrence "
        "RATE and DETERMINISM, the nonlinear-dynamics companions to "
        "sample entropy / Higuchi FD / permutation entropy (noise: "
        "DET≈0; periodic regimes: DET→1). Exact integer counts on a "
        "|days|²-bounded per-type pair frame; diagonal membership via "
        "two point-wise self-joins of the recurrent set"
    ),
    tags=("events", "statistics", "sequence"),
)
def evt_recurrence_quantification(spark, sf_dir):
    from pyspark.sql import Window

    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    s = d.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
        "x",
    # |types|·|days| rows feeding both pair-join sides and the count
    ).localCheckpoint()
    b = s.select(
        F.col("event_type").alias("bt"),
        F.col("i").alias("j"),
        F.col("x").alias("bx"),
    )
    rec = (
        s.join(b, (F.col("bt") == F.col("event_type")) & (F.col("j") > F.col("i")))
        .filter(F.abs(F.col("x") - F.col("bx")) <= _RQA_EPS)
        .select("event_type", "i", "j")
        # the recurrent set feeds THREE consumers (itself + two
        # shifted probes)
        .localCheckpoint()
    )
    p = rec.select(
        F.col("event_type").alias("pt"),
        (F.col("i") + 1).alias("pi"),
        (F.col("j") + 1).alias("pj"),
    )
    n_ = rec.select(
        F.col("event_type").alias("nt"),
        (F.col("i") - 1).alias("ni"),
        (F.col("j") - 1).alias("nj"),
    )
    det = (
        rec.join(
            p,
            (F.col("pt") == F.col("event_type"))
            & (F.col("pi") == F.col("i"))
            & (F.col("pj") == F.col("j")),
            "left",
        )
        .join(
            n_,
            (F.col("nt") == F.col("event_type"))
            & (F.col("ni") == F.col("i"))
            & (F.col("nj") == F.col("j")),
            "left",
        )
        .select(
            "event_type",
            F.when(
                F.col("pi").isNotNull() | F.col("ni").isNotNull(), 1
            )
            .otherwise(0)
            .alias("on_line"),
        )
    )
    pts = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    agg = det.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("rec_n"),
        F.sum("on_line").cast("bigint").alias("det_n"),
    )
    return pts.join(agg, "event_type").select(
        "event_type", "n", "rec_n", "det_n"
    )


@register(
    "rel_eoq_components",
    oracle="""
    SELECT p.p_brand,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
             AS demand_units,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS price_sum_c,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
    description=(
        "economic-order-quantity inputs per part brand: demand units "
        "and the exact average line price as a rational (cent sum, "
        "line count); the gate assembles EOQ = √(2DS/h) with a "
        "literal order cost and holding rate and pins the classical "
        "properties (EOQ > 0, total-cost convexity at the optimum). "
        "Completes the inventory family next to newsvendor, (s,S) "
        "policy and MRP projection. One brand-bucketed fold — "
        "≤|brands| output rows at any scale factor"
    ),
    tags=("relational", "inventory", "aggregate"),
)
def rel_eoq_components(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("price_c"),
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("qty").cast("bigint").alias("demand_units"),
            F.sum("price_c").cast("bigint").alias("price_sum_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
