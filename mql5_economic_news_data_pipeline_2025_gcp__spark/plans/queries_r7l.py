r"""Round-7 batch l: token-shape profiling and weekday/weekend lift.

- ``doc_token_shape_profile`` — per-source counts of tokenizer-hostile
  token shapes (numeric-bearing, over-long, symbol-bearing): the
  pre-tokenizer diagnostic that predicts BPE fertility blow-ups before
  a vocabulary is trained.
- ``evt_weekday_weekend_lift`` — weekday-vs-weekend value contrast per
  event type from integer sufficient statistics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.textops import tokens
from .common import keyed_events, t
from .registry import register


@register(
    "doc_token_shape_profile",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS tk
      FROM documents),
    t2 AS (SELECT source, tk FROM tok WHERE length(tk) > 0)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN regexp_matches(tk, '[0-9]')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
           CAST(sum(CASE WHEN length(tk) > 20
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlong,
           CAST(sum(CASE WHEN regexp_matches(tk, '[^a-z0-9]')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol,
           CAST(sum(CASE WHEN regexp_matches(tk, '[0-9]')
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS numeric_frac
    FROM t2 GROUP BY source
    """,
    description=(
        "token-shape profile per source: counts of numeric-bearing, "
        "over-long (>20 chars), and symbol-bearing tokens — the shapes "
        "that explode BPE fertility and UNK rates; a source whose "
        "numeric_frac is an outlier gets number-normalization before "
        "tokenizer training, not after. Exact integer counts, one "
        "identical ratio tree. Shape: one tokenize pass, one "
        "source-keyed fold, both map-side combined"
    ),
    tags=("documents", "text", "quality"),
)
def doc_token_shape_profile(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "source", F.explode(tokens("text")).alias("tk")
    ).filter(F.length("tk") > 0)
    numeric = F.when(F.col("tk").rlike("[0-9]"), 1).otherwise(0)
    overlong = F.when(F.length("tk") > 20, 1).otherwise(0)
    symbol = F.when(F.col("tk").rlike("[^a-z0-9]"), 1).otherwise(0)
    return tk.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(numeric).cast("bigint").alias("n_numeric"),
        F.sum(overlong).cast("bigint").alias("n_overlong"),
        F.sum(symbol).cast("bigint").alias("n_symbol"),
        (F.sum(numeric).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "numeric_frac"
        ),
    )


@register(
    "evt_weekday_weekend_lift",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS wkend,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL)
    SELECT event_type,
           CAST(sum(CASE WHEN wkend = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weekday,
           CAST(sum(CASE WHEN wkend = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weekend,
           CAST(sum(CASE WHEN wkend = 0 THEN v ELSE 0 END) AS BIGINT)
             AS sum_weekday_c,
           CAST(sum(CASE WHEN wkend = 1 THEN v ELSE 0 END) AS BIGINT)
             AS sum_weekend_c,
           (CAST(sum(CASE WHEN wkend = 1 THEN v ELSE 0 END) AS DOUBLE)
            * CAST(sum(CASE WHEN wkend = 0 THEN 1 ELSE 0 END) AS DOUBLE))
           / (CAST(sum(CASE WHEN wkend = 0 THEN v ELSE 0 END) AS DOUBLE)
            * CAST(sum(CASE WHEN wkend = 1 THEN 1 ELSE 0 END) AS DOUBLE))
             AS weekend_lift
    FROM s GROUP BY event_type
    """,
    description=(
        "weekday-vs-weekend value contrast per event type: the lift is "
        "the ratio of mean weekend value to mean weekday value, "
        "written cross-multiplied ((Σwknd·n_wkday)/(Σwkday·n_wkend)) "
        "so it is one identical tree over four exact integers — the "
        "seasonality sanity check a forecaster runs before committing "
        "to day-of-week features. Weekend is DuckDB dayofweek ∈ {0,6} "
        "== Spark dayofweek ∈ {1,7} (the known off-by-one both sides "
        "handle explicitly). Shape: one scan, one 5-row conditional "
        "fold"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_weekday_weekend_lift(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    # Spark dayofweek: 1=Sun..7=Sat; DuckDB dayofweek: 0=Sun..6=Sat
    wkend = F.when(F.dayofweek(F.to_date("ts")).isin(1, 7), 1).otherwise(0)
    s = ev.select("event_type", wkend.alias("wkend"), F.col("value_c").alias("v"))
    n_wd = F.sum(F.when(F.col("wkend") == 0, 1).otherwise(0)).cast("bigint")
    n_we = F.sum(F.when(F.col("wkend") == 1, 1).otherwise(0)).cast("bigint")
    s_wd = F.sum(F.when(F.col("wkend") == 0, F.col("v")).otherwise(0)).cast(
        "bigint"
    )
    s_we = F.sum(F.when(F.col("wkend") == 1, F.col("v")).otherwise(0)).cast(
        "bigint"
    )
    return s.groupBy("event_type").agg(
        n_wd.alias("n_weekday"),
        n_we.alias("n_weekend"),
        s_wd.alias("sum_weekday_c"),
        s_we.alias("sum_weekend_c"),
        (
            (s_we.cast("double") * n_wd.cast("double"))
            / (s_wd.cast("double") * n_we.cast("double"))
        ).alias("weekend_lift"),
    )
