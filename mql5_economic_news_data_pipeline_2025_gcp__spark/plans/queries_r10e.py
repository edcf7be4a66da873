"""Round-10e batch: assortment-overlap analytics and sample entropy.

``rel_nation_portfolio_overlap`` — pairwise Jaccard overlap between
supplier nations' part-TYPE portfolios (which of the 150 TPC-H part
types each nation's suppliers have shipped, observed from lineitem —
the fixture set carries no partsupp table): the assortment-overlap
matrix procurement uses to answer "which nations are substitutes if
one is embargoed?". The pair space is |nations|² (≤ 300 ordered pairs
at ANY scale factor — nations are a fixed dimension), and the
intersect join buckets on part type, whose per-type nation list is
≤ 25: the classic bounded-dimension self-join that stays tiny while
facts grow. Complements `rel_dominant_suppliers` (concentration
within a part) and `rel_supplier_hhi` (market structure) with the
BETWEEN-nations substitutability view.

``evt_sample_entropy`` — Sample Entropy (Richman & Moorman 2000) of
each type's daily cent series: the template-matching regularity
measure clinical/industrial monitoring uses where
`evt_permutation_entropy` (ordinal patterns) and `evt_higuchi_fd`
(fractal length) are the other two lenses. Counts B = matching
2-templates and A = matching 3-templates under a Chebyshev tolerance
of r cents; SampEn = −ln(A/B) is assembled by the gate. The template
frame is the |types|×|days| daily rollup, so the pairwise match join
is calendar-bounded per type at any event volume.

Determinism: portfolios are DISTINCT (nation, type) sets (exact);
Jaccard is emitted as integer |A|, |B|, |A∩B|; SampEn counts are
integer comparisons on exact cent values with a literal tolerance;
template components come from lead() windows with strict t-ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register

#: SampEn tolerance (cents) — literal in both engines. Daily totals
#: move in the 1e5-cent range on the fixtures; r is deliberately wide
#: so both A and B are populated (the gate pins A ≤ B > 0).
_SE_R = 40000


@register(
    "rel_nation_portfolio_overlap",
    oracle="""
    WITH port AS (
      SELECT DISTINCT n.n_name AS nation, p.p_type AS ptype
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey),
    sizes AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n_types
      FROM port GROUP BY nation),
    common AS (
      SELECT a.nation AS nation_a, b.nation AS nation_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM port a JOIN port b
        ON a.ptype = b.ptype AND a.nation < b.nation
      GROUP BY a.nation, b.nation)
    SELECT c.nation_a, c.nation_b, c.n_common,
           sa.n_types AS n_types_a, sb.n_types AS n_types_b
    FROM common c
    JOIN sizes sa ON sa.nation = c.nation_a
    JOIN sizes sb ON sb.nation = c.nation_b
    """,
    description=(
        "pairwise part-type portfolio overlap between supplier "
        "nations: |A∩B| next to |A| and |B| for every nation pair "
        "(Jaccard/overlap assembled by the gate) — the procurement "
        "substitutability matrix. Shape: one DISTINCT (nation, type) "
        "projection of lineitem⋈supplier⋈part, a type-bucketed "
        "self-join whose buckets are ≤|nations| and whose output is "
        "≤|nations|² rows at ANY scale factor, two broadcast size "
        "joins"
    ),
    tags=("relational", "similarity", "audit"),
)
def rel_nation_portfolio_overlap(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    port = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
        .select(F.col("n_name").alias("nation"), F.col("p_type").alias("ptype"))
        .distinct()
        # ≤ |nations|·|types| rows feeding THREE consumers (sizes + both
        # self-join sides) — without the checkpoint the 4-table join
        # lineage re-runs per consumer (16 scans / 9 exchanges measured)
        .localCheckpoint()
    )
    sizes = port.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types")
    )
    a = port.select(F.col("nation").alias("nation_a"), "ptype")
    b = port.select(F.col("nation").alias("nation_b"), "ptype")
    common = (
        a.join(b, "ptype")
        .filter(F.col("nation_a") < F.col("nation_b"))
        .groupBy("nation_a", "nation_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(
        F.col("nation").alias("nation_a"), F.col("n_types").alias("n_types_a")
    )
    sb = sizes.select(
        F.col("nation").alias("nation_b"), F.col("n_types").alias("n_types_b")
    )
    return common.join(F.broadcast(sa), "nation_a").join(
        F.broadcast(sb), "nation_b"
    ).select(
        "nation_a", "nation_b", "n_common", "n_types_a", "n_types_b"
    )


@register(
    "evt_sample_entropy",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    o AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t
      FROM d),
    tpl AS (
      SELECT event_type, t, x AS x0,
             lead(x, 1) OVER (PARTITION BY event_type ORDER BY t) AS x1,
             lead(x, 2) OVER (PARTITION BY event_type ORDER BY t) AS x2
      FROM o),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN abs(a.x0 - b.x0) <= {_SE_R}
                   AND abs(a.x1 - b.x1) <= {_SE_R}
                  THEN 1 ELSE 0 END AS m2,
             CASE WHEN a.x2 IS NOT NULL AND b.x2 IS NOT NULL
                   AND abs(a.x0 - b.x0) <= {_SE_R}
                   AND abs(a.x1 - b.x1) <= {_SE_R}
                   AND abs(a.x2 - b.x2) <= {_SE_R}
                  THEN 1 ELSE 0 END AS m3
      FROM tpl a JOIN tpl b
        ON a.event_type = b.event_type AND a.t < b.t
      WHERE a.x1 IS NOT NULL AND b.x1 IS NOT NULL)
    SELECT event_type,
           CAST(sum(m2) AS BIGINT) AS b_m2,
           CAST(sum(m3) AS BIGINT) AS a_m3,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY event_type
    """,
    description=(
        "Sample Entropy sufficient statistics per type over the daily "
        "cent series: B = 2-template and A = 3-template match counts "
        f"under a Chebyshev tolerance of {_SE_R} cents (template pairs "
        "i<j, self-matches excluded; the gate assembles SampEn = "
        "−ln(A/B) and pins 0 ≤ A ≤ B) — the regularity lens next to "
        "ordinal patterns (permutation entropy) and fractal length "
        "(Higuchi). Shape: one (type, day) rollup, lead windows "
        "riding the type exchange, a type-bucketed self-join whose "
        "buckets are calendar-bounded at any event volume, one fold"
    ),
    tags=("events", "timeseries", "statistics"),
)
def evt_sample_entropy(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    o = d.select(
        "event_type", "x", F.row_number().over(w).alias("t")
    )
    wt = Window.partitionBy("event_type").orderBy("t")
    tpl = o.select(
        "event_type",
        "t",
        F.col("x").alias("x0"),
        F.lead("x", 1).over(wt).alias("x1"),
        F.lead("x", 2).over(wt).alias("x2"),
    ).filter(F.col("x1").isNotNull()).localCheckpoint()
    # calendar-bounded template frame feeds both self-join sides; the
    # checkpoint stops the rollup+window lineage re-running per side
    a = tpl.select(
        "event_type",
        F.col("t").alias("ta"),
        F.col("x0").alias("a0"),
        F.col("x1").alias("a1"),
        F.col("x2").alias("a2"),
    )
    b = tpl.select(
        "event_type",
        F.col("t").alias("tb"),
        F.col("x0").alias("b0"),
        F.col("x1").alias("b1"),
        F.col("x2").alias("b2"),
    )
    m2 = (
        (F.abs(F.col("a0") - F.col("b0")) <= _SE_R)
        & (F.abs(F.col("a1") - F.col("b1")) <= _SE_R)
    ).cast("int")
    m3 = (
        F.col("a2").isNotNull()
        & F.col("b2").isNotNull()
        & (F.abs(F.col("a0") - F.col("b0")) <= _SE_R)
        & (F.abs(F.col("a1") - F.col("b1")) <= _SE_R)
        & (F.abs(F.col("a2") - F.col("b2")) <= _SE_R)
    ).cast("int")
    pairs = a.join(b, "event_type").filter(F.col("ta") < F.col("tb"))
    return pairs.select(
        "event_type", m2.alias("m2"), m3.alias("m3")
    ).groupBy("event_type").agg(
        F.sum("m2").cast("bigint").alias("b_m2"),
        F.sum("m3").cast("bigint").alias("a_m3"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
