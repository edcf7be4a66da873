"""Round-7 batch k: SimHash threshold calibration + Haar multi-
resolution energy.

- ``doc_simhash_distance_profile`` — the Hamming-distance histogram of
  SimHash signatures over the LSH candidate pairs: the calibration
  readout that picks a SimHash cut-off (how many candidate pairs sit
  at each distance) before `doc_simhash_near_dup` commits to one.
- ``evt_haar_energy`` — Haar wavelet detail energy per dyadic scale
  over the daily value series: the multiresolution variance
  decomposition (which time scale carries the volatility), exact
  integers end to end because Haar details are block-sum differences.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import lsh_candidate_pairs, minhash_signatures_mapside, simhash
from .common import fan_out, keyed_events, t
from .queries_ext import _SQL_MINHASH_AGGS, _SQL_SHINGLES
from .registry import register

#: simhash votes oracle fragment (mirror of operators.dedup.simhash).
_SQL_SIMHASH = r"""
    stoks AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id,
                   unnest(string_split(
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                     ' ')) AS tok
            FROM documents)
      WHERE length(tok) > 0),
    shashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th
      FROM stoks),
    svotes AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (th >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM shashed, (SELECT unnest(range(0, 16)) AS bit) b
      GROUP BY doc_id, b.bit),
    ssig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, bit) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS sh
      FROM svotes GROUP BY doc_id)
"""


@register(
    "doc_simhash_distance_profile",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    hh AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh),
    sig AS (
      SELECT doc_id, {_SQL_MINHASH_AGGS}
      FROM hh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bkey FROM sig
      UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
      UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
      UNION ALL SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
    {_SQL_SIMHASH}
    SELECT CAST(bit_count(xor(sa.sh, sb.sh)) AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN ssig sa ON sa.doc_id = p.id_a
    JOIN ssig sb ON sb.doc_id = p.id_b
    GROUP BY bit_count(xor(sa.sh, sb.sh))
    """,
    description=(
        "SimHash Hamming-distance histogram over the LSH candidate "
        "pairs: joins the 16-bit signatures onto the MinHash-banded "
        "candidate graph and counts pairs per distance — the "
        "calibration curve that picks the SimHash cut-off (a bimodal "
        "histogram separates true near-dups from LSH false positives) "
        "before doc_simhash_near_dup commits to one. popcount(xor) is "
        "exact in both engines. Shape: candidate pairs (LSH-sparse, "
        "checkpointed) + two broadcast signature joins + a ≤17-row "
        "histogram fold — never all-pairs"
    ),
    tags=("documents", "dedup", "simhash"),
)
def doc_simhash_distance_profile(spark, sf_dir):
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    sig = minhash_signatures_mapside(docs, n=3, num_hashes=8)
    pairs = lsh_candidate_pairs(sig, bands=4, rows_per_band=2).localCheckpoint()
    sh = simhash(docs, bits=16)
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    joined = pairs.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
    return (
        joined.select(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(F.col("hamming").cast("bigint").alias("hamming"), "n_pairs")
    )


@register(
    "evt_haar_energy",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    lv AS (SELECT unnest([1, 2, 3]) AS level),
    det AS (
      SELECT d.event_type, lv.level,
             d.day // (1 << lv.level) AS block,
             CAST(sum(CASE WHEN d.day % (1 << lv.level)
                                < (1 << (lv.level - 1))
                           THEN d.x ELSE -d.x END) AS BIGINT) AS detail
      FROM d, lv
      WHERE d.day >= 0
      GROUP BY d.event_type, lv.level, d.day // (1 << lv.level))
    SELECT event_type, CAST(level AS BIGINT) AS level,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CAST(detail AS HUGEINT) * detail) AS BIGINT) AS energy
    FROM det GROUP BY event_type, level
    """,
    description=(
        "Haar wavelet detail energy per dyadic scale (2/4/8-day "
        "blocks) over the daily value series: each block's detail is "
        "first-half-sum minus second-half-sum (exact integer cents — "
        "Haar needs no floats at all), energy = Σ detail² per "
        "(type, scale). The multiresolution variance decomposition: "
        "energy concentrated at scale 1 = day-to-day noise, at scale "
        "3 = week-ish cycles — which window length a denoiser or "
        "feature builder should use. Shape: one (type, day) rollup, a "
        "×3 level explode over the DAY frame (366 rows), block agg, "
        "15-row energy fold"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_haar_energy(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).agg(F.sum("value_c").cast("bigint").alias("x"))
    # epoch precondition: Spark `div` truncates toward zero while the
    # oracle's `//` floors — they agree only for non-negative days, so
    # pre-epoch events (day < 0) are excluded on BOTH sides
    d = d.filter(F.col("day") >= 0)
    lv = spark.range(1, 4).withColumnRenamed("id", "level")
    blk = F.expr("day div (1 << CAST(level AS INT))")
    sign_first = (
        F.col("day") % F.expr("1 << CAST(level AS INT)")
        < F.expr("1 << CAST(level - 1 AS INT)")
    )
    det = (
        d.crossJoin(F.broadcast(lv))
        .groupBy("event_type", "level", blk.alias("block"))
        .agg(
            F.sum(F.when(sign_first, F.col("x")).otherwise(-F.col("x")))
            .cast("bigint")
            .alias("detail")
        )
    )
    dec = "decimal(38,0)"
    return det.groupBy("event_type", "level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        # accumulate in decimal, EMIT as bigint: energies fit int64 by a
        # wide margin (~8e11 at sf0.01, ~8e15 at sf100 vs 9.2e18), and a
        # decimal/HUGEINT output column sorts as str on one side and
        # float on the other in the driver's row-order normalization
        F.sum(F.col("detail").cast(dec) * F.col("detail"))
        .cast("bigint")
        .alias("energy"),
    ).select(
        "event_type",
        F.col("level").cast("bigint").alias("level"),
        "n_blocks",
        "energy",
    )
