"""Round-9 batch ai: milestone timing and word-level predictability.

``evt_time_to_threshold`` — days from each user's first event until
their CUMULATIVE spend first clears a milestone ($500), as a
days-bucket histogram plus reach counts: the time-to-LTV-milestone
curve a growth team reads next to `evt_time_to_convert` (first event →
first purchase) and `evt_cohort_ltv_curve` (calendar-cohort averages) —
this one is value-cumulative and per-user-anchored.

``doc_word_bigram_entropy`` — the conditional entropy H(w₂|w₁) of the
word stream per source, from the plug-in identity
H = (Σ_{w₁} c·ln c − Σ_{w₁w₂} c·ln c)/N: the WORD-level
predictability gauge next to `doc_char_bigram_entropy` (characters)
and `doc_token_entropy` (unigram surprise).  Low H(w₂|w₁) with normal
unigram entropy is the signature of templated/boilerplate text that
unigram filters miss.  Both c·ln c sums ship as micro-nat-quantized
integers (ln of an INTEGER count, the registry's WOE/Hill idiom).

Determinism: the threshold crossing is a cumulative integer comparison
with (ts, event_id) ordering; bucket arithmetic is flooring division
on non-negative day gaps; entropy sums quantize ln(count) to micro-nats
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .registry import register

_THRESH_C = 50000  # $500 milestone in cents
_BUCKET_DAYS = 7
_LN_U = 1000000


@register(
    "evt_time_to_threshold",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS v
      FROM events),
    c AS (
      SELECT user_id, ts,
             sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
             min(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM e),
    hit AS (
      SELECT user_id,
             min(CASE WHEN cum >= {_THRESH_C} THEN ts END) AS hit_ts,
             min(first_ts) AS first_ts
      FROM c GROUP BY user_id),
    g AS (
      SELECT user_id,
             CASE WHEN hit_ts IS NULL THEN -1
                  ELSE datediff('day', CAST(first_ts AS DATE),
                                CAST(hit_ts AS DATE))
                       // {_BUCKET_DAYS} END AS bucket
      FROM hit)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_users
    FROM g GROUP BY bucket
    """,
    description=(
        f"time-to-milestone histogram: days from each user's first "
        f"event until cumulative spend first clears ${_THRESH_C // 100}"
        f", bucketed by {_BUCKET_DAYS}-day periods (flooring division "
        "on non-negative gaps; bucket −1 = never reached). The "
        "value-cumulative, user-anchored milestone curve next to "
        "time-to-convert (event-based) and cohort LTV (calendar-"
        "based). The crossing is the FIRST row where the (ts, "
        "event_id)-ordered cumulative sum clears the literal — pure "
        "integer comparison. Shape: one user_id exchange shared by "
        "the cumsum window, the first-ts lift, and the crossing "
        "fold; one ≤buckets-row histogram"
    ),
    tags=("events", "funnel", "timeseries"),
)
def evt_time_to_threshold(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    e = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.coalesce(F.col("value_c"), F.lit(0)).alias("v"),
    )
    wu = Window.partitionBy("user_id")
    c = e.select(
        "user_id",
        "ts",
        F.sum("v")
        .over(
            wu.orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum"),
        F.min("ts").over(wu).alias("first_ts"),
    )
    hit = c.groupBy("user_id").agg(
        F.min(
            F.when(F.col("cum") >= _THRESH_C, F.col("ts"))
        ).alias("hit_ts"),
        F.min("first_ts").alias("first_ts"),
    )
    g = hit.select(
        F.when(F.col("hit_ts").isNull(), F.lit(-1))
        .otherwise(
            F.expr(
                "datediff(CAST(hit_ts AS DATE), CAST(first_ts AS DATE))"
                f" DIV {_BUCKET_DAYS}"
            )
        )
        .alias("bucket")
    )
    return g.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    ).select(F.col("bucket").cast("bigint").alias("bucket"), "n_users")


@register(
    "doc_word_bigram_entropy",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split(regexp_replace(lower(trim(text)),
                                         '\s+', ' ', 'g'), ' ') AS ws
      FROM documents),
    bi AS (
      SELECT source,
             ws[i - 1] AS w1, ws[i] AS w2
      FROM toks, LATERAL (
        SELECT unnest(range(2, len(ws) + 1)) AS i)
      WHERE ws[i - 1] <> '' AND ws[i] <> ''),
    cb AS (
      SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM bi GROUP BY source, w1, w2),
    cu AS (
      SELECT source, w1, CAST(sum(c) AS BIGINT) AS c
      FROM cb GROUP BY source, w1)
    SELECT cb.source,
           CAST(sum(cb.c) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(sum(cb.c * CAST(round(ln(CAST(cb.c AS DOUBLE)) * {_LN_U})
                                AS BIGINT)) AS BIGINT) AS s_bi_u,
           (SELECT CAST(sum(cu.c * CAST(round(ln(CAST(cu.c AS DOUBLE))
                                              * {_LN_U}) AS BIGINT))
                        AS BIGINT)
            FROM cu WHERE cu.source = cb.source) AS s_uni_u
    FROM cb GROUP BY cb.source
    """,
    description=(
        "word-level conditional entropy sufficient statistics per "
        "source: Σ c·ln c over (w₁, w₂) bigram counts and over the w₁ "
        "context marginals, ln quantized to micro-nats on INTEGER "
        "counts (the WOE/Hill idiom — both engines round the same "
        "double). The gate assembles H(w₂|w₁) = (Σuni − Σbi)/N and "
        "pins 0 ≤ H(w₂|w₁) ≤ H ceiling — low conditional entropy "
        "with normal unigram entropy is the templated-text signature "
        "unigram quality filters miss. Shape: intra-document bigrams "
        "via array indexing (no token explode beyond the bigram "
        "frame), two nested count aggregates on the same key family"
    ),
    tags=("documents", "text", "quality"),
)
def doc_word_bigram_entropy(spark, sf_dir):
    from ..operators.textops import tokens

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    toks = docs.select("source", tokens("text").alias("ws"))
    bi = toks.select(
        "source",
        # guard: sequence(2, size(ws)) on a 1-token doc yields the
        # DESCENDING [2, 1] and element_at(ws, 2) throws; emit an empty
        # index array instead (matches the oracle's empty range(2, 2))
        F.explode(
            F.expr(
                "filter(transform("
                " CASE WHEN size(ws) >= 2 THEN sequence(2, size(ws))"
                " ELSE CAST(array() AS array<int>) END,"
                " i -> struct(element_at(ws, i - 1) AS w1,"
                " element_at(ws, i) AS w2)),"
                " s -> s.w1 <> '' AND s.w2 <> '')"
            )
        ).alias("b"),
    ).select("source", "b.w1", "b.w2")
    cb = bi.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # Zipf-bounded distinct-bigram frame; feeds BOTH
    # the bigram fold and the context-marginal lineage (without it the
    # token pass re-runs per consumer: 5 exchanges measured)
    lnc = F.round(F.log(F.col("c").cast("double")) * _LN_U).cast("bigint")
    per_bi = cb.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
        F.sum(F.col("c") * lnc).cast("bigint").alias("s_bi_u"),
    )
    cu = cb.groupBy("source", "w1").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    per_uni = cu.groupBy("source").agg(
        F.sum(F.col("c") * lnc).cast("bigint").alias("s_uni_u")
    )
    return per_bi.join(F.broadcast(per_uni), "source").select(
        "source", "n_bigrams", "n_distinct_bigrams", "s_bi_u", "s_uni_u"
    )
