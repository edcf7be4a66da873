"""Round-6 continuation (batch v): spatial autocorrelation and
goodness-of-fit.

`evt_morans_i` runs on the FIXED 18×36 lattice of 10° cells (empty
cells count zero — the population is the lattice, not the occupied
set, so n and the rook-adjacency weight total W are constants of the
geometry).  Mean-centering is cleared by n (``z̃ᵢ = n·xᵢ − S`` — the
`evt_ljung_box` move), making the cross-product numerator and the
denominator exact integers; I itself is one identical tree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: lattice geometry: 18 lat bands x 36 lon bands of 10 degrees.
_NLAT, _NLON = 18, 36
_N = _NLAT * _NLON
#: directed rook-adjacency weight total (no wraparound).
_W = 2 * (_NLAT * (_NLON - 1) + (_NLAT - 1) * _NLON)


@register(
    "evt_morans_i",
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
    s AS (SELECT CAST(sum(x) AS BIGINT) AS stot FROM cells),
    z AS (
      SELECT la, lo,
             CAST({_N} AS HUGEINT) * x - (SELECT stot FROM s) AS zz
      FROM cells),
    num AS (
      SELECT CAST(sum(a.zz * b.zz) AS HUGEINT) AS cross_num
      FROM z a JOIN z b
        ON (abs(a.la - b.la) + abs(a.lo - b.lo)) = 1),
    den AS (
      SELECT CAST(sum(zz * zz) AS HUGEINT) AS den FROM z)
    SELECT CAST({_N} AS BIGINT) AS n_cells,
           CAST({_W} AS BIGINT) AS w_total,
           CAST(cross_num AS BIGINT) AS cross_num,
           CAST(den AS BIGINT) AS z2_den,
           (CAST({_N} AS DOUBLE) / CAST({_W} AS DOUBLE))
             * (CAST(cross_num AS DOUBLE) / CAST(den AS DOUBLE))
             AS morans_i
    FROM num, den
    """,
    description="Moran's I spatial autocorrelation of user-point "
    "counts over the fixed 18x36 lattice of 10-degree cells (rook "
    "adjacency, empty cells zero): mean-centering cleared by n so "
    "numerator and denominator are exact integers; I is one identical "
    "tree",
    tags=("events", "spatial", "statistics"),
)
def evt_morans_i(spark, sf_dir):
    """Is activity spatially CLUSTERED — the global test behind the
    hotspot map (`evt_geo_hotspot_grid` finds where; Moran's I says
    whether the clustering is real at all).

    I = (n/W)·ΣΣ wᵢⱼ zᵢ zⱼ / Σzᵢ² over the FIXED lattice (empty cells
    are zeros, so n = 648 and the rook weight total W = 2·(18·35 +
    17·36) are geometry constants).  Clearing the fractional mean by
    n (z̃ᵢ = n·xᵢ − S) makes both the adjacency cross sum and the
    denominator exact integers; the only floats are the final three
    divisions, as one identical tree.  Under the md5-uniform point
    process I should hover near E[I] = −1/(n−1) ≈ 0 — the query is
    the A/A calibration for real geo data.

    Scale: one fact pass to the occupied-cell histogram; the lattice,
    adjacency join, and sums are constant 648-row work.  The adjacency
    join is |Δla|+|Δlo| = 1 on the lattice frame — fine at 648 rows,
    and at finer grids it becomes the stencil-explode equi-join
    (`evt_geo_hotspot_grid`).
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
    from pyspark.sql import Window

    # the lattice is COMPLETE, so rook neighbors are exactly the
    # lag/lead rows of the two grid orders — four windows over the
    # 648-row frame replace the adjacency self-join, and the fact
    # table keeps a SINGLE lineage (the join form audited 6 scans)
    wall = Window.partitionBy()
    z = cells.select(
        "la", "lo",
        (
            F.lit(_N).cast(dec) * F.col("x")
            - F.sum("x").over(wall).cast(dec)
        ).alias("zz"),
    )
    wlo = Window.partitionBy("la").orderBy("lo")
    wla = Window.partitionBy("lo").orderBy("la")
    neigh = (
        F.coalesce(F.lag("zz").over(wlo), F.lit(0).cast(dec))
        + F.coalesce(F.lead("zz").over(wlo), F.lit(0).cast(dec))
        + F.coalesce(F.lag("zz").over(wla), F.lit(0).cast(dec))
        + F.coalesce(F.lead("zz").over(wla), F.lit(0).cast(dec))
    )
    contrib = z.select(
        "zz", neigh.alias("nsum")
    )
    agg = contrib.agg(
        F.sum((F.col("zz") * F.col("nsum")).cast(dec)).alias("cross_num"),
        F.sum((F.col("zz") * F.col("zz")).cast(dec)).alias("den"),
    )
    return agg.select(
        F.lit(_N).cast("bigint").alias("n_cells"),
        F.lit(_W).cast("bigint").alias("w_total"),
        F.col("cross_num").cast("bigint").alias("cross_num"),
        F.col("den").cast("bigint").alias("z2_den"),
        (
            (F.lit(float(_N)) / F.lit(float(_W)))
            * (
                F.col("cross_num").cast("double")
                / F.col("den").cast("double")
            )
        ).alias("morans_i"),
    )


@register(
    "evt_gof_weekday",
    oracle=r"""
    WITH c AS (
      SELECT dayofweek(ts) AS dow, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY dayofweek(ts)),
    t AS (
      SELECT CAST(sum(x) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k
      FROM c)
    SELECT CAST(c.dow AS BIGINT) AS dow, c.x,
           CAST(t.n AS DOUBLE) / CAST(t.k AS DOUBLE) AS expected,
           (CAST(c.x AS DOUBLE)
             - CAST(t.n AS DOUBLE) / CAST(t.k AS DOUBLE))
           * (CAST(c.x AS DOUBLE)
             - CAST(t.n AS DOUBLE) / CAST(t.k AS DOUBLE))
           / (CAST(t.n AS DOUBLE) / CAST(t.k AS DOUBLE))
             AS chi2_component
    FROM c, t
    """,
    description="chi-square goodness-of-fit of event volume against a "
    "uniform weekday profile: exact integer counts per day-of-week, "
    "per-cell chi-square components via identical trees (the consumer "
    "sums k=7 bounded rows) - the one-way GOF complement to "
    "evt_chisq_independence",
    tags=("events", "statistics"),
)
def evt_gof_weekday(spark, sf_dir):
    """Is traffic uniform across the week? — the one-way
    goodness-of-fit complement to `evt_chisq_independence`'s two-way
    test.

    Emits per-weekday observed counts, the uniform expectation n/7,
    and the per-cell (O−E)²/E component; the k=7-row table is the
    artifact (the consumer sums the bounded components — the
    km_retention cut, avoiding a 7-term float SUM whose order an
    engine could choose, though here a left-assoc sum would also have
    been fine).

    NOTE: DuckDB's ``dayofweek`` is 0=Sunday..6=Saturday and Spark's
    is 1..7, so the Spark side subtracts 1 — the one engine-mapping
    this repo's F5-impact-style functions always make explicit.

    Scale: one fact aggregation to 7 rows.
    """
    ev = keyed_events(spark, sf_dir)
    c = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    from pyspark.sql import Window

    wall = Window.partitionBy()
    t_ = c.select(
        "dow", "x",
        F.sum("x").over(wall).cast("bigint").alias("n"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("k"),
    )
    e = F.col("n").cast("double") / F.col("k").cast("double")
    d = F.col("x").cast("double") - e
    return t_.select(
        "dow", "x",
        e.alias("expected"),
        (d * d / e).alias("chi2_component"),
    )
