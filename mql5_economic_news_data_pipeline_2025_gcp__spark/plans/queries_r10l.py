"""Round-10l batch: trailing-digit heaping forensics and assortment
churn dynamics.

``evt_digit_heaping`` — the TRAILING-digit companion to the Benford
leading-digit screens (`evt_benford_audit`, `evt_benford_two_digit`):
the distribution of cent remainders mod 100 per event type. Humans
heap on round numbers (.00, .50, .99 price points); machine-generated
or uniformly-random values don't — heaping where none is expected (or
its absence where pricing should show it) is the forensic signal
trailing digits carry and leading digits cannot. Emits the exact
100-cell remainder histogram per type plus the expected-uniform
numerator; the gate assembles the chi-square and the heap-share of
the canonical cells {0, 50, 99}.

``rel_assortment_churn`` — month-over-month part-type portfolio
dynamics per supplier nation: types ADDED, DROPPED, and KEPT between
consecutive shipping months, from a FULL OUTER self-join of the
(nation, month, type) presence set on adjacent months.
`rel_nation_portfolio_overlap` is the static substitutability matrix;
this is its time derivative — the assortment-velocity view category
managers track. Presence sets are DISTINCT projections over bounded
dimensions (|nations|·|types|·|months|), so every frame past the scan
is dimension-sized at any fact volume.

Determinism: remainders are integer mod on exact cents; months are
INTEGER keys y·12+m (no interval arithmetic); churn counts are exact set-difference counts via the
outer join's null sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register


@register(
    "evt_digit_heaping",
    oracle="""
    WITH v AS (
      SELECT event_type,
             abs(CAST(round(value * 100) AS BIGINT)) % 100 AS r
      FROM events WHERE value IS NOT NULL),
    c AS (
      SELECT event_type, r, CAST(count(*) AS BIGINT) AS c
      FROM v GROUP BY event_type, r),
    n AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n
      FROM c GROUP BY event_type)
    SELECT c.event_type, CAST(c.r AS BIGINT) AS r, c.c, n.n
    FROM c JOIN n ON n.event_type = c.event_type
    """,
    description=(
        "trailing-digit heaping table per type: exact counts of cent "
        "remainders mod 100 next to the type total — the forensic "
        "companion to the Benford LEADING-digit screens (humans heap "
        "on .00/.50/.99; uniform machine values don't); the gate "
        "assembles the 100-cell chi-square vs uniform and the "
        "canonical heap-cell share, and brute-forces every cell. "
        "Shape: map-side integer mod, one (type, remainder) fold, a "
        "|types|-row totals join"
    ),
    tags=("events", "audit", "statistics"),
)
def evt_digit_heaping(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    v = ev.select(
        "event_type", (F.abs(F.col("value_c")) % 100).alias("r")
    )
    c = v.groupBy("event_type", "r").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # ≤|types|·100 rows feeding the totals agg AND
    # the join left side — without it the event scan re-runs per side
    n = c.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    return c.join(F.broadcast(n), "event_type").select(
        "event_type", F.col("r").cast("bigint").alias("r"), "c", "n"
    )


@register(
    "rel_assortment_churn",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT n.n_name AS nation,
             year(CAST(l.l_shipdate AS DATE)) * 12
               + month(CAST(l.l_shipdate AS DATE)) AS mk,
             p.p_type AS ptype
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey),
    mm AS (SELECT DISTINCT mk FROM pres),
    adj AS (
      SELECT mk FROM mm
      WHERE mk - 1 IN (SELECT mk FROM mm)),
    a AS (SELECT * FROM pres WHERE mk IN (SELECT mk FROM adj)),
    b AS (
      SELECT nation, mk + 1 AS mk, ptype FROM pres
      WHERE mk + 1 IN (SELECT mk FROM adj)),
    j AS (
      SELECT coalesce(a.mk, b.mk) AS mk,
             coalesce(a.nation, b.nation) AS nation,
             a.ptype AS pa, b.ptype AS pb
      FROM a FULL OUTER JOIN b
        ON a.mk = b.mk AND a.nation = b.nation AND a.ptype = b.ptype)
    SELECT CAST(mk AS BIGINT) AS month_key, nation,
           CAST(sum(CASE WHEN pa IS NOT NULL AND pb IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN pa IS NULL AND pb IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN pa IS NOT NULL AND pb IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM j GROUP BY mk, nation
    """,
    description=(
        "month-over-month part-type assortment churn per supplier "
        "nation: types added / dropped / kept between consecutive "
        "shipping months (integer month key y·12+m — no interval "
        "arithmetic to drift between engines) from a full-outer "
        "presence-set join — the time derivative of the static "
        "portfolio-overlap matrix. Shape: one DISTINCT "
        "(nation, month, type) projection (bounded dimensions, "
        "checkpointed), an adjacent-month self-join on the "
        "dimension-sized presence frame, one fold"
    ),
    tags=("relational", "dynamics", "audit"),
)
def rel_assortment_churn(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_shipdate"
    )
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    ship = F.to_date("l_shipdate")
    pres = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("n_name").alias("nation"),
            (F.year(ship) * 12 + F.month(ship)).alias("mk"),
            F.col("p_type").alias("ptype"),
        )
        .distinct()
        # dimension-sized presence set feeds FOUR consumers (months,
        # both join sides via adj filters) — checkpoint kills re-derive
        .localCheckpoint()
    )
    mm = pres.select("mk").distinct()
    adj = (
        mm.alias("x")
        .join(
            mm.select((F.col("mk") + 1).alias("mk1")),
            F.col("mk") == F.col("mk1"),
        )
        .select("mk")
    )
    a = pres.join(F.broadcast(adj), "mk")
    b = (
        pres.select(
            "nation", (F.col("mk") + 1).alias("mk"), "ptype"
        ).join(F.broadcast(adj), "mk")
    )
    j = a.alias("a").join(
        b.alias("b"),
        (F.col("a.mk") == F.col("b.mk"))
        & (F.col("a.nation") == F.col("b.nation"))
        & (F.col("a.ptype") == F.col("b.ptype")),
        "full_outer",
    )
    pa, pb = F.col("a.ptype"), F.col("b.ptype")
    return (
        j.select(
            F.coalesce(F.col("a.mk"), F.col("b.mk")).alias("mk"),
            F.coalesce(F.col("a.nation"), F.col("b.nation")).alias(
                "nation"
            ),
            F.when(pa.isNotNull() & pb.isNull(), 1)
            .otherwise(0)
            .alias("added"),
            F.when(pa.isNull() & pb.isNotNull(), 1)
            .otherwise(0)
            .alias("dropped"),
            F.when(pa.isNotNull() & pb.isNotNull(), 1)
            .otherwise(0)
            .alias("kept"),
        )
        .groupBy("mk", "nation")
        .agg(
            F.sum("added").cast("bigint").alias("n_added"),
            F.sum("dropped").cast("bigint").alias("n_dropped"),
            F.sum("kept").cast("bigint").alias("n_kept"),
        )
        .select(
            F.col("mk").cast("bigint").alias("month_key"),
            "nation",
            "n_added",
            "n_dropped",
            "n_kept",
        )
    )
