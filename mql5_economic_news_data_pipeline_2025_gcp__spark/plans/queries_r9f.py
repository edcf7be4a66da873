"""Round-9 batch f: privacy-preserving estimation, session tuning, and
ANN threshold calibration.

``evt_ldp_frequency`` — local differential privacy via randomized
response: each event reports its type truthfully with p = 3/4, else a
uniform replacement; the collector de-biases the perturbed histogram
back to an unbiased frequency estimate.  The third leg of the privacy
family (`evt_k_anonymity_audit` audits, `evt_dp_contribution_bounds`
bounds, this one ESTIMATES under a formal ε = ln(1 + k·p/(1−p)) LDP
guarantee).

``evt_session_gap_sweep`` — session counts under gap thresholds
30/60/120 min in ONE pass (the tuning curve for `evt_sessionize`'s
single fixed gap — pick the knee before committing a session
definition).

``emb_distance_histogram`` — the pairwise integer-L2 distance
distribution over a bounded anchor set: the calibration table that
turns "pick a dedup/LSH threshold" from a guess into a read-off
(`doc_simhash_distance_profile`'s embedding-space sibling).

Determinism: the randomized-response "coin" is md5(event_id:'ldp') hex
windows (engine-identical digests); the de-bias estimator is kept as an
exact integer numerator (20·c − n, denominator 15 literal); session
counts and histogram buckets are pure integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register

#: sorted category list — a LITERAL in both engines (the RR replacement
#: table); must match the distinct event types of the fixtures
_TYPES = ("click", "error", "purchase", "signup", "view")
#: session gap thresholds swept in one pass (seconds)
_GAPS_S = (1800, 3600, 7200)
#: distance-histogram twin bounds: anchors and bucket geometry
_DH_ANCHORS = 128
_DH_BUCKET = 100000
_DH_CAP = 50


@register(
    "evt_ldp_frequency",
    oracle=f"""
    WITH types(idx, v) AS (VALUES (0, 'click'), (1, 'error'),
                                  (2, 'purchase'), (3, 'signup'),
                                  (4, 'view')),
    r AS (
      SELECT event_type AS true_v,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':ldp'),
                             1, 4))::BIGINT % 4 AS keep,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':ldp'),
                             5, 4))::BIGINT % 5 AS ridx
      FROM events),
    rep AS (
      SELECT CASE WHEN keep <> 0 THEN true_v ELSE t.v END AS reported,
             true_v
      FROM r JOIN types t ON t.idx = r.ridx),
    c AS (
      SELECT ty.v AS event_type,
             CAST(count(rep.reported) FILTER (rep.reported = ty.v)
                  AS BIGINT) AS reported_c,
             CAST(count(rep.true_v) FILTER (rep.true_v = ty.v)
                  AS BIGINT) AS true_c
      FROM rep CROSS JOIN types ty
      GROUP BY ty.v),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
    SELECT c.event_type, c.reported_c, c.true_c, n.n,
           CAST(20 * c.reported_c - n.n AS BIGINT) AS est_num
    FROM c, n
    """,
    description=(
        "local-DP frequency estimation by randomized response: each "
        "event keeps its true type with p = 3/4 (md5 hex window mod 4 "
        "≠ 0 — exactly 3/4, engine-identical) else reports a uniform "
        "replacement from the literal category table (second disjoint "
        "window mod 5). The collector sees only the perturbed counts; "
        "the unbiased estimate n̂_v = (20·c_v − n)/15 is emitted as "
        "its exact integer numerator next to the true counts so the "
        "pytest gate can pin unbiasedness ((Σ estimates) ≡ n exactly — "
        "the estimator is self-normalizing) and the recovery error. "
        "Shape: one map-side perturbation pass (the replacement table "
        "is 5 literal rows broadcast), one count aggregate"
    ),
    tags=("events", "privacy", "statistics"),
)
def evt_ldp_frequency(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    h = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":ldp")))
    keep = F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 4
    ridx = F.conv(F.substring(h, 5, 4), 16, 10).cast("bigint") % 5
    tarr = F.array(*[F.lit(v) for v in _TYPES])
    rep = ev.select(
        F.col("event_type").alias("true_v"),
        F.when(keep != 0, F.col("event_type"))
        .otherwise(F.element_at(tarr, (ridx + 1).cast("int")))
        .alias("reported"),
    )
    # one labeled pass over the 5 literal categories (no per-type scan)
    cat = rep.sparkSession.createDataFrame(
        [(v,) for v in _TYPES], "event_type string"
    )
    agg = rep.crossJoin(F.broadcast(cat)).groupBy("event_type").agg(
        F.sum(F.when(F.col("reported") == F.col("event_type"), 1).otherwise(0))
        .cast("bigint")
        .alias("reported_c"),
        F.sum(F.when(F.col("true_v") == F.col("event_type"), 1).otherwise(0))
        .cast("bigint")
        .alias("true_c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return agg.select(
        "event_type",
        "reported_c",
        "true_c",
        "n",
        (20 * F.col("reported_c") - F.col("n"))
        .cast("bigint")
        .alias("est_num"),
    )


@register(
    "evt_session_gap_sweep",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN gap > CAST({_GAPS_S[0]} AS BIGINT) * 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS b0,
             CAST(sum(CASE WHEN gap > CAST({_GAPS_S[1]} AS BIGINT) * 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             CAST(sum(CASE WHEN gap > CAST({_GAPS_S[2]} AS BIGINT) * 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS b2
      FROM g)
    SELECT CAST(u.gap_s AS BIGINT) AS gap_s,
           CAST(u.breaks + agg.n_users AS BIGINT) AS n_sessions,
           CAST(agg.n_rows * 1000 // (u.breaks + agg.n_users) AS BIGINT)
             AS events_per_session_milli
    FROM agg,
         (SELECT {_GAPS_S[0]} AS gap_s, b0 AS breaks FROM agg
          UNION ALL SELECT {_GAPS_S[1]}, b1 FROM agg
          UNION ALL SELECT {_GAPS_S[2]}, b2 FROM agg) u
    """,
    description=(
        "session-gap tuning curve: session counts under 30/60/120-min "
        "inactivity thresholds computed in ONE pass over the per-user "
        "gap frame (a session count is n_users + #gaps exceeding the "
        "threshold — three conditional sums, no re-sessionization per "
        "candidate), plus floored events-per-session in milli-units. "
        "The knee of this curve is how a platform picks the gap it "
        "then freezes into evt_sessionize. Shape: one user lag "
        "shuffle, one 1-row fold, a 3-row literal unpivot"
    ),
    tags=("events", "window", "sessionization", "tuning"),
)
def evt_session_gap_sweep(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = ev.select(
        "user_id", (us - F.lag(us).over(wlag)).alias("gap")
    )
    agg = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        *[
            F.sum(
                F.when(F.col("gap") > gs * 1000000, 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"b{i}")
            for i, gs in enumerate(_GAPS_S)
        ],
    )
    u = agg.select(
        "n_rows",
        "n_users",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(gs).cast("bigint").alias("gap_s"),
                        F.col(f"b{i}").alias("breaks"),
                    )
                    for i, gs in enumerate(_GAPS_S)
                ]
            )
        ).alias("x"),
    )
    return u.select(
        F.col("x.gap_s").alias("gap_s"),
        (F.col("x.breaks") + F.col("n_users"))
        .cast("bigint")
        .alias("n_sessions"),
        F.expr("n_rows * 1000 DIV (x.breaks + n_users)").alias(
            "events_per_session_milli"
        ),
    )


@register(
    "emb_distance_histogram",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0)
                                      AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id < {_DH_ANCHORS}),
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_sum(list_transform(range(1, len(a.qv) + 1),
                      i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
               AS d2
      FROM q a JOIN q b ON a.vec_id < b.vec_id),
    h AS (
      SELECT least(d2 // {_DH_BUCKET}, {_DH_CAP}) AS bucket, d2
      FROM p)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(d2) AS BIGINT) AS min_d2,
           CAST(max(d2) AS BIGINT) AS max_d2
    FROM h GROUP BY bucket
    """,
    description=(
        "pairwise exact integer-L2 distance histogram over the "
        f"bounded anchor set (vec_id < {_DH_ANCHORS} — the twin "
        "convention; 8128 pairs fixed at any SF): linear milli²-unit "
        "buckets with a cap tail. This is the threshold-calibration "
        "table for emb_near_dup_cosine / emb_semantic_dedup — read "
        "the valley between the duplicate mode and the bulk before "
        "committing a cutoff (doc_simhash_distance_profile's "
        "embedding-space sibling). Shape: one broadcast self-join on "
        "the capped anchor frame, map-side HOF distances, one "
        "~50-row histogram agg; production calibration samples "
        "anchors per ANN bucket instead of globally"
    ),
    tags=("embeddings", "similarity", "tuning"),
)
def emb_distance_histogram(spark, sf_dir):
    q = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _DH_ANCHORS)
        .select("vec_id", _qvec().alias("qv"))
    )
    a = q.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa"))
    b = q.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb"))
    p = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        _int_d2_arr(F.col("qa"), F.col("qb")).alias("d2")
    )
    h = p.select(
        F.least(
            F.expr(f"d2 DIV {_DH_BUCKET}"), F.lit(_DH_CAP).cast("bigint")
        ).alias("bucket"),
        "d2",
    )
    return h.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("d2").cast("bigint").alias("min_d2"),
        F.max("d2").cast("bigint").alias("max_d2"),
    )
