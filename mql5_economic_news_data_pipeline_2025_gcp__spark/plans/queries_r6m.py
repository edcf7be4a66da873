"""Round-6 continuation (batch m): threshold-exceedance tail modeling
and symbolic series representation.

`evt_pot_gpd_tail` pairs with `evt_extreme_value_gumbel` as the two
canonical EVT routes (block maxima vs peaks-over-threshold); the
threshold itself is an exact nearest-rank order statistic from the
value histogram.  `evt_sax_words` discretizes each series against
z-score breakpoints computed as identical expression trees, so even
the SYMBOLS (strings) agree bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register


@register(
    "evt_pot_gpd_tail",
    oracle=r"""
    WITH h AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS val,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(round(value * 100) AS BIGINT)),
    u AS (
      SELECT min(val) AS u FROM (
        SELECT val,
               sum(c) OVER (ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
               sum(c) OVER () AS n
        FROM h) WHERE 10 * cum >= 9 * n),
    exc AS (
      SELECT CAST(round(value * 100) AS BIGINT) - (SELECT u FROM u) AS y
      FROM events
      WHERE value IS NOT NULL
        AND CAST(round(value * 100) AS BIGINT) > (SELECT u FROM u)),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exceed,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(y AS HUGEINT) * y) AS qy
      FROM exc),
    mom AS (
      SELECT n_exceed, sy,
             CAST(sy AS DOUBLE) / CAST(n_exceed AS DOUBLE) AS m,
             (CAST(n_exceed AS DOUBLE) * CAST(qy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_exceed AS DOUBLE)
                * (CAST(n_exceed AS DOUBLE) - 1.0)) AS s2
      FROM s)
    SELECT (SELECT CAST(u AS BIGINT) FROM u) AS threshold_c,
           n_exceed,
           m AS mean_excess,
           s2 AS var_excess,
           0.5 * (1.0 - m * m / s2) AS xi,
           0.5 * m * (m * m / s2 + 1.0) AS sigma
    FROM mom
    """,
    description="peaks-over-threshold GPD tail fit: exact nearest-rank "
    "P90 threshold from the value histogram, integer exceedance "
    "sufficient statistics, method-of-moments xi and sigma via "
    "identical expression trees - the POT companion to the Gumbel "
    "block-maxima fit",
    tags=("events", "statistics", "timeseries"),
)
def evt_pot_gpd_tail(spark, sf_dir):
    """Tail shape from threshold exceedances — the second canonical
    EVT route (`evt_extreme_value_gumbel` is the first).

    POT uses every observation above a high threshold instead of one
    maximum per block, so it extracts far more tail information at the
    same data volume.  The threshold is the exact nearest-rank P90
    (smallest v with 10·cum ≥ 9·n over the value histogram — both
    engines select the identical element); exceedance mean and sample
    variance come from integer Σy, Σy²; the generalized-Pareto
    method-of-moments estimates are ``ξ = ½(1 − m²/s²)`` and
    ``σ = ½m(m²/s² + 1)`` — multiplications and divisions only, so no
    engine-varying transcendentals (return levels need pow() with a
    data-dependent exponent, whose last-ulp behavior differs across
    libm implementations — deliberately left to the consumer).

    Scale: one histogram aggregation, one filtered exceedance pass
    (predicate pushes to the scan), one 3-cell aggregation.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    h = ev.groupBy(F.col("value_c").alias("val")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    u = (
        h.select(
            "val",
            F.sum("c").over(wcum).alias("cum"),
            F.sum("c").over(wall).alias("n"),
        )
        .filter(10 * F.col("cum") >= 9 * F.col("n"))
        .agg(F.min("val").alias("u"))
    )
    exc = (
        ev.crossJoin(F.broadcast(u))
        .filter(F.col("value_c") > F.col("u"))
        .select((F.col("value_c") - F.col("u")).alias("y"), "u")
    )
    dec = "decimal(38,0)"
    s = exc.agg(
        F.min("u").cast("bigint").alias("threshold_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_exceed"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("y").cast(dec) * F.col("y")).cast(dec)).alias("qy"),
    )
    nd = F.col("n_exceed").cast("double")
    m = F.col("sy").cast("double") / nd
    s2 = (
        nd * F.col("qy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    ) / (nd * (nd - F.lit(1.0)))
    mom = s.select(
        "threshold_c", "n_exceed",
        m.alias("m"),
        s2.alias("s2"),
    )
    ratio = F.col("m") * F.col("m") / F.col("s2")
    return mom.select(
        "threshold_c", "n_exceed",
        F.col("m").alias("mean_excess"),
        F.col("s2").alias("var_excess"),
        (F.lit(0.5) * (F.lit(1.0) - ratio)).alias("xi"),
        (F.lit(0.5) * F.col("m") * (ratio + F.lit(1.0))).alias("sigma"),
    )


#: SAX breakpoints for a 4-symbol alphabet: N(0,1) quartiles, the SAME
#: literals on both engine sides.
_SAX_BREAKS = ("-0.6744897501960817", "0.0", "0.6744897501960817")


@register(
    "evt_sax_words",
    oracle=rf"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s_c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    idx AS (
      SELECT event_type, s_c,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS i
      FROM d),
    stats AS (
      SELECT event_type, s_c, i,
             CAST(sum(s_c) OVER w AS BIGINT) AS tot,
             CAST(count(*) OVER w AS BIGINT) AS n,
             sum(CAST(s_c AS HUGEINT) * s_c) OVER w AS q
      FROM idx WINDOW w AS (PARTITION BY event_type)),
    z AS (
      SELECT event_type, i // 5 AS seg, s_c,
             CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                   - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               AS sd
      FROM stats),
    paa AS (
      SELECT event_type, seg,
             (CAST(sum(s_c) AS DOUBLE) / 5.0 - min(mu)) / min(sd)
               AS znorm
      FROM z GROUP BY event_type, seg),
    sym AS (
      SELECT event_type, seg,
             CASE WHEN znorm < {_SAX_BREAKS[0]} THEN 'a'
                  WHEN znorm < {_SAX_BREAKS[1]} THEN 'b'
                  WHEN znorm < {_SAX_BREAKS[2]} THEN 'c'
                  ELSE 'd' END AS sym
      FROM paa)
    SELECT event_type,
           string_agg(sym, '' ORDER BY seg) AS sax_word,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM sym GROUP BY event_type
    """,
    description="SAX symbolization of each event-type daily series: "
    "5-day PAA segments z-scored against the series mean/std and "
    "quantized at shared N(0,1) quartile literals into a 4-letter "
    "alphabet - per-series SAX word (string) built with ordered "
    "string_agg, bit-identical across engines",
    tags=("events", "timeseries"),
)
def evt_sax_words(spark, sf_dir):
    """Symbolic Aggregate approXimation — the series-to-string bridge.

    SAX turns a numeric series into a short word (here 6 letters for
    30 days: 5-day PAA means, 4-symbol alphabet at standard-normal
    quartile breakpoints), enabling string-space tooling — hashing,
    motif counting, suffix indexing (`doc_suffix_ranks`), even LSH —
    on time series.  Every step is deterministic across engines: PAA
    means are ``Σ/5`` over exact integers, the z-score uses the
    identical mean/std expression trees, the breakpoints are shared
    literals, and the word is assembled with ORDER-qualified
    concatenation (``string_agg(... ORDER BY seg)`` / sorted
    ``array_join``).

    Scale: one fact pass to the (type, day) frame; per-series stats
    are windows over that calendar-bounded frame; the PAA agg and word
    agg reuse the type partitioning.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("s_c")
    )
    wtype = Window.partitionBy("event_type")
    worder = Window.partitionBy("event_type").orderBy("day")
    dec = "decimal(38,0)"
    idx = d.select(
        "event_type", "s_c",
        (F.row_number().over(worder) - 1).alias("i"),
    )
    stats = idx.select(
        "event_type", "s_c", "i",
        F.sum("s_c").over(wtype).cast("bigint").alias("tot"),
        F.count(F.lit(1)).over(wtype).cast("bigint").alias("n"),
        F.sum((F.col("s_c").cast(dec) * F.col("s_c")).cast(dec))
        .over(wtype)
        .alias("q"),
    )
    nd = F.col("n").cast("double")
    z = stats.select(
        "event_type",
        F.expr("i DIV 5").alias("seg"),
        "s_c",
        (F.col("tot").cast("double") / nd).alias("mu"),
        F.sqrt(
            (
                nd * F.col("q").cast("double")
                - F.col("tot").cast("double") * F.col("tot").cast("double")
            )
            / (nd * (nd - F.lit(1.0)))
        ).alias("sd"),
    )
    # PAA sums stay INTEGER (order-free) and divide once at the end
    paa = z.groupBy("event_type", "seg").agg(
        (
            (F.sum("s_c").cast("double") / F.lit(5.0) - F.min("mu"))
            / F.min("sd")
        ).alias("znorm")
    )
    b0, b1, b2 = (float(x) for x in _SAX_BREAKS)
    sym = paa.select(
        "event_type", "seg",
        F.when(F.col("znorm") < b0, "a")
        .when(F.col("znorm") < b1, "b")
        .when(F.col("znorm") < b2, "c")
        .otherwise("d")
        .alias("sym"),
    )
    return sym.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("seg"), F.col("sym")))
                ),
                lambda s: s["sym"],
            ),
            "",
        ).alias("sax_word"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
    )
