"""Round-6 continuation (batch w): Geary's C.

The local-difference dual of `evt_morans_i` on the same fixed lattice:
Moran correlates a cell with its neighbors (global clustering), Geary
sums SQUARED NEIGHBOR DIFFERENCES (local heterogeneity) — sensitive to
different departures from randomness, which is why spatial audits
report both.  The numerator needs no mean at all (Σw(xᵢ−xⱼ)² over raw
integer counts); the denominator reuses the n-cleared Σz̃² from
Moran, so C is exact integers into one identical tree.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_NLAT, _NLON = 18, 36
_N = _NLAT * _NLON
_W = 2 * (_NLAT * (_NLON - 1) + (_NLAT - 1) * _NLON)


@register(
    "evt_geary_c",
    oracle=rf"""
    WITH pt AS (
      SELECT (CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 180000000 - 90000000) AS lat_u,
             (CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 9, 8))
                   AS BIGINT) % 360000000 - 180000000) AS lon_u
      FROM events),
    occ AS (
      SELECT CAST(floor(lat_u / 10000000.0) AS BIGINT) + 9 AS la,
             CAST(floor(lon_u / 10000000.0) AS BIGINT) + 18 AS lo,
             CAST(count(*) AS BIGINT) AS x
      FROM pt GROUP BY 1, 2),
    lattice AS (
      SELECT la.range AS la, lo.range AS lo
      FROM range({_NLAT}) la, range({_NLON}) lo),
    cells AS (
      SELECT l.la, l.lo, coalesce(o.x, 0) AS x
      FROM lattice l LEFT JOIN occ o ON o.la = l.la AND o.lo = l.lo),
    z AS (
      SELECT la, lo, x,
             CAST({_N} AS HUGEINT) * x - sum(x) OVER () AS zz
      FROM cells),
    nb AS (
      SELECT x, zz,
             lag(x) OVER (PARTITION BY la ORDER BY lo) AS xw,
             lead(x) OVER (PARTITION BY la ORDER BY lo) AS xe,
             lag(x) OVER (PARTITION BY lo ORDER BY la) AS xs,
             lead(x) OVER (PARTITION BY lo ORDER BY la) AS xn
      FROM z),
    agg AS (
      SELECT CAST(sum(
               coalesce((x - xw) * (x - xw), 0)
               + coalesce((x - xe) * (x - xe), 0)
               + coalesce((x - xs) * (x - xs), 0)
               + coalesce((x - xn) * (x - xn), 0)) AS HUGEINT)
               AS sq_diff_sum,
             CAST(sum(zz * zz) AS HUGEINT) AS z2
      FROM nb)
    SELECT CAST({_N} AS BIGINT) AS n_cells,
           CAST({_W} AS BIGINT) AS w_total,
           CAST(sq_diff_sum AS BIGINT) AS sq_diff_sum,
           CAST(z2 AS BIGINT) AS z2_den,
           (CAST({_N} - 1 AS DOUBLE) * CAST(sq_diff_sum AS DOUBLE)
            * CAST({_N} AS DOUBLE) * CAST({_N} AS DOUBLE))
           / (2.0 * CAST({_W} AS DOUBLE) * CAST(z2 AS DOUBLE))
             AS geary_c
    FROM agg
    """,
    description="Geary's C spatial heterogeneity on the fixed 10-degree "
    "lattice: squared neighbor differences of raw integer counts "
    "(no mean needed in the numerator), n-cleared denominator shared "
    "with Moran's I, lattice lag/lead windows instead of an adjacency "
    "join - C near 1 under the md5-uniform null",
    tags=("events", "spatial", "statistics"),
)
def evt_geary_c(spark, sf_dir):
    """Local spatial heterogeneity — Moran's complement (C ≈ 1 random,
    < 1 clustered, > 1 dispersed; Moran weighs global covariance,
    Geary weighs LOCAL squared differences, so they disagree exactly
    when structure is local).

    C = (n−1)·Σw(xᵢ−xⱼ)² / (2W·Σ(xᵢ−x̄)²).  The numerator is exact on
    RAW counts (differences kill the mean); the denominator reuses
    Moran's n-cleared z̃ (Σ(x−x̄)² = Σz̃²/n², the n² resurfacing in the
    final tree).  Same single-lineage plan as `evt_morans_i`: lattice
    windows, one fact scan.
    """
    ev = keyed_events(spark, sf_dir)
    h1 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    h2 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 9, 8), 16, 10
    ).cast("bigint")
    pt = ev.select(
        (h1 % 180000000 - 90000000).alias("lat_u"),
        (h2 % 360000000 - 180000000).alias("lon_u"),
    )
    occ = pt.groupBy(
        (F.floor(F.col("lat_u") / 10000000.0).cast("bigint") + 9).alias(
            "la"
        ),
        (F.floor(F.col("lon_u") / 10000000.0).cast("bigint") + 18).alias(
            "lo"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    lattice = (
        ev.sparkSession.range(_NLAT)
        .select(F.col("id").alias("la"))
        .crossJoin(
            ev.sparkSession.range(_NLON).select(F.col("id").alias("lo"))
        )
    )
    cells = lattice.join(occ, ["la", "lo"], "left").select(
        "la", "lo", F.coalesce("x", F.lit(0)).alias("x")
    )
    dec = "decimal(38,0)"
    wall = Window.partitionBy()
    z = cells.select(
        "la", "lo", "x",
        (
            F.lit(_N).cast(dec) * F.col("x")
            - F.sum("x").over(wall).cast(dec)
        ).alias("zz"),
    )
    wlo = Window.partitionBy("la").orderBy("lo")
    wla = Window.partitionBy("lo").orderBy("la")

    def sq(nbcol):
        d = F.col("x") - nbcol
        return F.coalesce((d * d).cast(dec), F.lit(0).cast(dec))

    nb = z.select(
        "x", "zz",
        F.lag("x").over(wlo).alias("xw"),
        F.lead("x").over(wlo).alias("xe"),
        F.lag("x").over(wla).alias("xs"),
        F.lead("x").over(wla).alias("xn"),
    )
    agg = nb.agg(
        F.sum(
            sq(F.col("xw")) + sq(F.col("xe")) + sq(F.col("xs"))
            + sq(F.col("xn"))
        ).alias("sq_diff_sum"),
        F.sum((F.col("zz") * F.col("zz")).cast(dec)).alias("z2"),
    )
    return agg.select(
        F.lit(_N).cast("bigint").alias("n_cells"),
        F.lit(_W).cast("bigint").alias("w_total"),
        F.col("sq_diff_sum").cast("bigint").alias("sq_diff_sum"),
        F.col("z2").cast("bigint").alias("z2_den"),
        (
            F.lit(float(_N - 1))
            * F.col("sq_diff_sum").cast("double")
            * F.lit(float(_N))
            * F.lit(float(_N))
            / (
                F.lit(2.0)
                * F.lit(float(_W))
                * F.col("z2").cast("double")
            )
        ).alias("geary_c"),
    )
