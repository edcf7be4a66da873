"""Round-6 continuation (batch x): local spatial association (LISA).

Local Moran's Iᵢ decomposes the global I (`evt_morans_i`) into
per-cell contributions and labels each cell's quadrant (HH hotspot,
LL coldspot, HL/LH outliers).  Same single-lineage lattice-window
plan; the quadrant labels compare n-cleared integers, so the
classification is exact, and the per-cell numerators are integers —
only the final normalization is a (shared-tree) double.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

_NLAT, _NLON = 18, 36
_N = _NLAT * _NLON


@register(
    "evt_local_morans",
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
    z1 AS (
      SELECT la, lo,
             CAST({_N} AS HUGEINT) * x - sum(x) OVER () AS zz
      FROM cells),
    z AS (
      SELECT la, lo, zz,
             CAST(sum(zz * zz) OVER () AS HUGEINT) AS z2
      FROM z1),
    nb AS (
      SELECT la, lo, zz, z2,
             coalesce(lag(zz) OVER (PARTITION BY la ORDER BY lo), 0)
               + coalesce(lead(zz) OVER (PARTITION BY la ORDER BY lo), 0)
               + coalesce(lag(zz) OVER (PARTITION BY lo ORDER BY la), 0)
               + coalesce(lead(zz) OVER (PARTITION BY lo ORDER BY la), 0)
               AS nsum,
             CAST((la > 0)::INT + (la < {_NLAT - 1})::INT
                  + (lo > 0)::INT + (lo < {_NLON - 1})::INT AS BIGINT)
               AS n_neighbors
      FROM z),
    lab AS (
      SELECT la, lo, zz, nsum, n_neighbors, z2,
             CASE WHEN zz > 0 AND nsum > 0 THEN 'HH'
                  WHEN zz < 0 AND nsum < 0 THEN 'LL'
                  WHEN zz > 0 AND nsum <= 0 THEN 'HL'
                  WHEN zz < 0 AND nsum >= 0 THEN 'LH'
                  ELSE 'ZZ' END AS quadrant,
             CAST(zz * nsum AS HUGEINT) AS local_num
      FROM nb),
    g AS (
      SELECT quadrant,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(local_num) AS BIGINT) AS local_num_sum,
             CAST(sum(n_neighbors) AS BIGINT) AS neighbor_links,
             CAST(min(z2) AS BIGINT) AS z2c
      FROM lab GROUP BY quadrant)
    SELECT quadrant, n_cells, local_num_sum, neighbor_links,
           CAST(local_num_sum AS DOUBLE) * CAST({_N} AS DOUBLE)
             / CAST(z2c AS DOUBLE) AS local_i_sum
    FROM g
    """,
    description="local Moran's I (LISA) quadrant census on the fixed "
    "10-degree lattice: HH/LL/HL/LH labels from exact n-cleared "
    "integer comparisons, per-quadrant local-I numerator sums as "
    "integers - the per-cell decomposition of evt_morans_i",
    tags=("events", "spatial", "statistics"),
)
def evt_local_morans(spark, sf_dir):
    """WHERE is the clustering — LISA turns the global Moran verdict
    into a hotspot/coldspot map.

    Iᵢ ∝ z̃ᵢ·Σ_j w_ij z̃ⱼ; the sign pair (z̃ᵢ, neighbor sum) labels each
    cell HH (hotspot), LL (coldspot), or HL/LH (spatial outliers) —
    comparisons of EXACT n-cleared integers, so the quadrant census is
    engine-identical by construction.  Output is the bounded quadrant
    summary (counts, integer local-numerator sums, and the normalized
    local-I total whose grand sum reproduces global I up to the n/W
    factor — asserted by the property gate).

    Scale: identical single-lineage lattice-window plan as
    `evt_morans_i` / `evt_geary_c`.
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
    zz = F.lit(_N).cast(dec) * F.col("x") - F.sum("x").over(wall).cast(dec)
    z = cells.select("la", "lo", zz.alias("zz")).withColumn(
        "z2", F.sum((F.col("zz") * F.col("zz")).cast(dec)).over(wall)
    )
    wlo = Window.partitionBy("la").orderBy("lo")
    wla = Window.partitionBy("lo").orderBy("la")
    nsum = (
        F.coalesce(F.lag("zz").over(wlo), F.lit(0).cast(dec))
        + F.coalesce(F.lead("zz").over(wlo), F.lit(0).cast(dec))
        + F.coalesce(F.lag("zz").over(wla), F.lit(0).cast(dec))
        + F.coalesce(F.lead("zz").over(wla), F.lit(0).cast(dec))
    )
    n_neighbors = (
        F.when(F.col("la") > 0, 1).otherwise(0)
        + F.when(F.col("la") < _NLAT - 1, 1).otherwise(0)
        + F.when(F.col("lo") > 0, 1).otherwise(0)
        + F.when(F.col("lo") < _NLON - 1, 1).otherwise(0)
    ).cast("bigint")
    nb = z.select(
        "la", "lo", "zz", "z2",
        nsum.alias("nsum"),
        n_neighbors.alias("n_neighbors"),
    )
    quadrant = (
        F.when((F.col("zz") > 0) & (F.col("nsum") > 0), "HH")
        .when((F.col("zz") < 0) & (F.col("nsum") < 0), "LL")
        .when((F.col("zz") > 0) & (F.col("nsum") <= 0), "HL")
        .when((F.col("zz") < 0) & (F.col("nsum") >= 0), "LH")
        .otherwise("ZZ")
    )
    lab = nb.select(
        quadrant.alias("quadrant"),
        (F.col("zz") * F.col("nsum")).cast(dec).alias("local_num"),
        "n_neighbors", "z2",
    )
    g = lab.groupBy("quadrant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("local_num").cast("bigint").alias("local_num_sum"),
        F.sum("n_neighbors").cast("bigint").alias("neighbor_links"),
        F.min("z2").cast("bigint").alias("z2c"),
    )
    return g.select(
        "quadrant", "n_cells", "local_num_sum", "neighbor_links",
        (
            F.col("local_num_sum").cast("double")
            * F.lit(float(_N))
            / F.col("z2c").cast("double")
        ).alias("local_i_sum"),
    )
