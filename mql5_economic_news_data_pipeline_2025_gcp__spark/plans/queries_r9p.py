"""Round-9 batch p: FIFO inventory valuation and the energy-distance
two-sample test.

``rel_fifo_cogs`` — first-in-first-out cost matching, the accounting
rule every inventory system implements: each part's returned units are
valued against its receipt lots in ship-date order.  The classic
formulation is a sequential queue depletion; the set-based form used
here is the cumulative-interval identity — lot *i* covers the quantity
interval [cq_{i−1}, cq_i), so the units consumed from it are
clamp(T − cq_{i−1}, 0, q_i) — which turns the "loop over lots" into
one window cumsum + map-side clamps (no fold, no recursion).

``evt_energy_distance`` — Székely's energy distance between the
weekday and weekend daily-value distributions per event type:
E = 2·mean|X−Y| − mean|X−X′| − mean|Y−Y′|.  Unlike KS (sup of CDF gap,
`evt_ks_drift`) or Wasserstein (CDF area, `evt_wasserstein_1d`), energy
distance is a METRIC that extends to multivariate data and weights the
whole distribution; E = 0 iff the distributions are equal.  Emitted as
exact integer |difference| sums over the ≤366-row day frame's
self-join; the gate assembles E.

Determinism: FIFO proration is extendedprice·consumed DIV qty on
non-negative operands (floored identically); weekday parity is epoch-
anchored day arithmetic guarded non-negative (the haar convention —
day ≥ 2024-01-01 enforced in BOTH engines, so DIV/% conventions never
see a negative operand); every emitted column is BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

_EPOCH_DAY = "2024-01-01"  # fixture start — a Monday


@register(
    "rel_fifo_cogs",
    oracle="""
    WITH l AS (
      SELECT l_partkey,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
             l_returnflag, l_shipdate, l_orderkey, l_linenumber,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(round(l_quantity) AS BIGINT)
                           ELSE 0 END)
                  OVER (PARTITION BY l_partkey) AS BIGINT) AS demand_q
      FROM lineitem),
    lots AS (
      SELECT l_partkey, q, ep_c, demand_q,
             sum(q) OVER (PARTITION BY l_partkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) - q AS cq_prev
      FROM l WHERE l_returnflag <> 'R'),
    consumed AS (
      SELECT l_partkey, demand_q,
             least(greatest(demand_q - cq_prev, 0), q) AS c,
             q, ep_c
      FROM lots)
    SELECT l_partkey,
           CAST(max(demand_q) AS BIGINT) AS demand_q,
           CAST(sum(c) AS BIGINT) AS matched_q,
           CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lots_used,
           CAST(sum((ep_c * c) // q) AS BIGINT) AS fifo_cost_c
    FROM consumed
    WHERE demand_q > 0
    GROUP BY l_partkey
    """,
    description=(
        "FIFO cost-of-goods valuation per part: returned units "
        "(l_returnflag = 'R') are valued against the part's receipt "
        "lots in (shipdate, orderkey, linenumber) order via the "
        "cumulative-interval identity — lot i covers "
        "[cq_{i−1}, cq_i), consumed = clamp(T − cq_{i−1}, 0, qᵢ) — "
        "which converts the textbook sequential queue depletion into "
        "ONE window cumsum plus map-side clamps. Lot cost prorates as "
        "ep·c DIV q (non-negative ⇒ floored identically in both "
        "engines). Emits demand, matched units, lots touched, and the "
        "FIFO cents — the inventory-accounting number next to "
        "rel_inventory_policy's stocking decisions. Shape: one "
        "l_partkey exchange shared by the demand window-lift, the "
        "cumsum, and the final fold"
    ),
    tags=("relational", "supplychain", "finance"),
)
def rel_fifo_cogs(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    wp = Window.partitionBy("l_partkey")
    l = li.select(
        "l_partkey",
        F.round("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("ep_c"),
        "l_returnflag",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    ).withColumn(
        "demand_q",
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.col("q")).otherwise(0)
        )
        .over(wp)
        .cast("bigint"),
    )
    w_cum = wp.orderBy("l_shipdate", "l_orderkey", "l_linenumber").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lots = l.filter(F.col("l_returnflag") != "R").select(
        "l_partkey",
        "q",
        "ep_c",
        "demand_q",
        (F.sum("q").over(w_cum) - F.col("q")).alias("cq_prev"),
    )
    consumed = lots.select(
        "l_partkey",
        "demand_q",
        F.least(
            F.greatest(F.col("demand_q") - F.col("cq_prev"), F.lit(0)),
            F.col("q"),
        ).alias("c"),
        "q",
        "ep_c",
    )
    return (
        consumed.filter(F.col("demand_q") > 0)
        .groupBy("l_partkey")
        .agg(
            F.max("demand_q").cast("bigint").alias("demand_q"),
            F.sum("c").cast("bigint").alias("matched_q"),
            F.sum(F.when(F.col("c") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_lots_used"),
            F.sum(F.expr("(ep_c * c) DIV q")).cast("bigint").alias(
                "fifo_cost_c"
            ),
        )
    )


@register(
    "evt_energy_distance",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
             datediff('day', DATE '{_EPOCH_DAY}', CAST(ts AS DATE)) % 7
               AS dow
      FROM events
      WHERE value IS NOT NULL AND CAST(ts AS DATE) >= DATE '{_EPOCH_DAY}'
      GROUP BY event_type, CAST(ts AS DATE),
               datediff('day', DATE '{_EPOCH_DAY}', CAST(ts AS DATE)) % 7),
    g AS (
      SELECT event_type, day, x,
             CASE WHEN dow IN (5, 6) THEN 1 ELSE 0 END AS we
      FROM d),
    pairs AS (
      SELECT a.event_type,
             a.we AS wa, b.we AS wb,
             abs(a.x - b.x) AS ad
      FROM g a JOIN g b
        ON a.event_type = b.event_type AND a.day < b.day)
    SELECT event_type,
           CAST(sum(CASE WHEN wa <> wb THEN ad ELSE 0 END) AS BIGINT)
             AS s_cross,
           CAST(sum(CASE WHEN wa = 0 AND wb = 0 THEN ad ELSE 0 END)
                AS BIGINT) AS s_wk,
           CAST(sum(CASE WHEN wa = 1 AND wb = 1 THEN ad ELSE 0 END)
                AS BIGINT) AS s_we,
           CAST(sum(CASE WHEN wa = 0 THEN 1 ELSE 0 END)
              + sum(CASE WHEN wb = 0 THEN 1 ELSE 0 END)
              - sum(CASE WHEN wa = 0 AND wb = 0 THEN 2 ELSE 0 END)
              AS BIGINT) AS cross_terms_wk
    FROM pairs GROUP BY event_type
    """,
    description=(
        "Székely energy-distance sufficient statistics between the "
        "weekday and weekend daily-value distributions per event "
        "type: exact integer Σ|x−y| over cross / within-weekday / "
        "within-weekend pairs of the day frame's a.day < b.day "
        "self-join (cross pairs appear exactly once, within pairs "
        "n(n−1)/2 times — the gate assembles the V-statistic form "
        "2A/nm − 2B/n² − 2C/m², the one with GUARANTEED E ≥ 0, and "
        "pins it). A true METRIC on "
        "distributions — 0 iff equal — where KS reads only the sup "
        "gap and Wasserstein the CDF area. Weekday parity is "
        "epoch-anchored day arithmetic with day ≥ {_EPOCH_DAY} "
        "ENFORCED in both engines, so %-on-negatives never arises "
        "(the haar convention). Shape: one (type, day) rollup, one "
        "self-join of the ≤366-row-per-type day frame, a 5-row fold"
    ),
    tags=("events", "statistics", "drift"),
)
def evt_energy_distance(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(
        F.col("value").isNotNull()
        & (F.to_date("ts") >= F.lit(_EPOCH_DAY).cast("date"))
    )
    d = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (
            F.datediff(F.to_date("ts"), F.lit(_EPOCH_DAY).cast("date")) % 7
        ).alias("dow"),
    ).agg(F.sum("value_c").cast("bigint").alias("x"))
    g = d.select(
        "event_type",
        "day",
        "x",
        F.when(F.col("dow").isin(5, 6), 1).otherwise(0).alias("we"),
    ).localCheckpoint()  # ≤366-rows-per-type frame feeds both join sides
    a = g.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("da"),
        F.col("x").alias("xa"),
        F.col("we").alias("wa"),
    )
    b = g.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("db"),
        F.col("x").alias("xb"),
        F.col("we").alias("wb"),
    )
    pairs = a.join(b, "et").filter(F.col("da") < F.col("db")).select(
        F.col("et").alias("event_type"),
        "wa",
        "wb",
        F.abs(F.col("xa") - F.col("xb")).alias("ad"),
    )
    return pairs.groupBy("event_type").agg(
        F.sum(F.when(F.col("wa") != F.col("wb"), F.col("ad")).otherwise(0))
        .cast("bigint")
        .alias("s_cross"),
        F.sum(
            F.when((F.col("wa") == 0) & (F.col("wb") == 0), F.col("ad"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_wk"),
        F.sum(
            F.when((F.col("wa") == 1) & (F.col("wb") == 1), F.col("ad"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_we"),
        (
            F.sum(F.when(F.col("wa") == 0, 1).otherwise(0))
            + F.sum(F.when(F.col("wb") == 0, 1).otherwise(0))
            - F.sum(
                F.when((F.col("wa") == 0) & (F.col("wb") == 0), 2).otherwise(
                    0
                )
            )
        )
        .cast("bigint")
        .alias("cross_terms_wk"),
    )
