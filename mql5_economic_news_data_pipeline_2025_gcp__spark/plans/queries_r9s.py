"""Round-9 batch s: streaming quantiles from histogram registers and
the contrastive-representation diagnostics.

``stream_histogram_quantiles`` — online P50/P90/P99 per event type from
BOUNDED histogram registers: the streaming state is (type, bucket) →
count (complete-mode sum — registers merge by addition, exactly like
the CMS grid), and the drained register table folds to nearest-rank
bucket quantiles via cross-multiplied cumsums.  The streaming answer to
"what's the latency/value P99 right now" with state bounded by the
bucket count, never by cardinality — the third portable-state streaming
sketch (HLL = distinct, CMS = frequency, this = distribution).

``emb_alignment_uniformity`` — Wang & Isola's two contrastive-learning
diagnostics computed exactly over the bounded anchor frame: ALIGNMENT
(how close same-label pairs sit) and UNIFORMITY (how spread out the
whole cloud is, log mean exp(−2·d²)).  A representation can cheat one
but not both; `emb_fisher_ratio` reads the scatter RATIO, these read
the two terms the contrastive loss actually optimizes.  Emitted as the
exact integer pair table (the gate owns exp/log); raw — not unit-
normalized — vectors, documented variant.

Determinism: histogram buckets are floored integer division of exact
cents (non-negative); quantile selection is cross-multiplied
(100·cum ≥ p·n — no division); the pair table is integer milli²-L2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import t
from .queries_r6 import _int_d2_arr, _qvec
from .registry import register

#: histogram geometry: $100 buckets with a cap tail (values ≤ ~$560)
_HB = 10000
_HB_CAP = 600
_PCTS = (50, 90, 99)

#: alignment/uniformity anchor bound (64 anchors → 2016 pairs)
_AU_ANCHORS = 64


@register(
    "stream_histogram_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             least(CAST(round(value * 100) AS BIGINT) // {_HB}, {_HB_CAP})
               AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, bucket),
    cum AS (
      SELECT event_type, bucket, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM b)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           {", ".join(
               f"CAST(min(CASE WHEN 100 * cc >= {p} * n THEN bucket END)"
               f" AS BIGINT) AS q{p}_b" for p in _PCTS)}
    FROM cum GROUP BY event_type
    """,
    description=(
        f"streaming quantiles from BOUNDED histogram registers: state "
        f"is (type, bucket) → count with ${_HB // 100} buckets capped "
        f"at {_HB_CAP} (complete-mode sums — registers merge by "
        "addition, the CMS-grid property), and the drained table "
        "folds to nearest-rank P50/P90/P99 buckets via cross-"
        "multiplied cumsums (100·cum ≥ p·n, no division). The online "
        "'what is P99 right now' with state bounded by bucket count, "
        "never cardinality — the distribution axis next to the HLL "
        "(distinct) and CMS (frequency) streaming sketches. Readout "
        "windows touch only the ≤types·buckets register frame"
    ),
    tags=("streaming", "sketch", "statistics"),
)
def stream_histogram_quantiles(spark, sf_dir):
    from ..streaming.ingest import _drain_to_table, _events_stream

    ev = _events_stream(spark, sf_dir).filter(F.col("value").isNotNull())
    b = ev.groupBy(
        "event_type",
        F.least(
            F.expr(f"CAST(round(value * 100) AS BIGINT) DIV {_HB}"),
            F.lit(_HB_CAP).cast("bigint"),
        ).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    regs = _drain_to_table(b, mode="complete")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = regs.select(
        "event_type",
        "bucket",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(wt).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        *[
            F.min(
                F.when(100 * F.col("cc") >= p * F.col("n"), F.col("bucket"))
            )
            .cast("bigint")
            .alias(f"q{p}_b")
            for p in _PCTS
        ],
    )


@register(
    "emb_alignment_uniformity",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0)
                                      AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id < {_AU_ANCHORS})
    SELECT a.vec_id AS ia, b.vec_id AS ib,
           CAST(CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS BIGINT)
             AS same,
           CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
                AS BIGINT) AS d2
    FROM q a JOIN q b ON a.vec_id < b.vec_id
    """,
    description=(
        "Wang–Isola contrastive diagnostics over the bounded anchor "
        f"frame (vec_id < {_AU_ANCHORS}, 2016 pairs at any SF): the "
        "exact integer milli²-L2 pair table with same-label flags — "
        "the gate assembles ALIGNMENT (mean d² over positive pairs) "
        "and UNIFORMITY (log mean exp(−2·d²/10⁶), ≤ 0 by Jensen) and "
        "pins both, on raw (non-unit) vectors as documented. The two "
        "TERMS the contrastive loss optimizes, next to "
        "emb_fisher_ratio's scatter ratio. Shape: one broadcast "
        "self-join on the capped anchor frame, map-side HOF "
        "distances — no shuffle of corpus-sized data; production "
        "samples anchors per ANN bucket"
    ),
    tags=("embeddings", "similarity", "statistics"),
)
def emb_alignment_uniformity(spark, sf_dir):
    q = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _AU_ANCHORS)
        .select("vec_id", "label", _qvec().alias("qv"))
    )
    a = q.select(
        F.col("vec_id").alias("ia"),
        F.col("label").alias("la"),
        F.col("qv").alias("qa"),
    )
    b = q.select(
        F.col("vec_id").alias("ib"),
        F.col("label").alias("lb"),
        F.col("qv").alias("qb"),
    )
    return (
        a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.when(F.col("la") == F.col("lb"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("same"),
            _int_d2_arr("qa", "qb").alias("d2"),
        )
    )
