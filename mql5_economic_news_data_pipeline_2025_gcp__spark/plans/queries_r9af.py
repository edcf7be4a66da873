"""Round-9 batch af: pairwise preference ranking and shard balance
auditing.

``evt_pairwise_wins_bt`` — the pairwise win matrix between event types
over their daily cent totals: W[a][b] = #days type a's total strictly
beat type b's.  This is the sufficient statistic of the Bradley–Terry
ranking model — the gate runs the BT minorize-maximize fixed point to
convergence in Python and pins its invariants (win-total conservation,
strength ordering consistent with dominant win rates).  Rankings from
PAIRWISE comparisons are robust to days when everything moved together
— a plain mean ranking is not.

``doc_shard_token_balance`` — the writer-skew audit for hash-sharded
output: md5-shard every document into 32 shards and emit per-shard doc
and token totals.  A 100-TB writer lives or dies on this balance (one
hot shard = one straggler task); the audit's max/min/CV numbers are
what decides between hash sharding and size-aware packing
(`doc_length_batching`'s planning sibling on the OUTPUT side,
`emb_shard_plan`'s document-table counterpart).

Determinism: day-pair comparisons are strict integer comparisons;
shard ids are the registry's md5 idiom; token counts are whitespace
token counts (the corpus convention); every output is BIGINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .registry import register

_N_SHARDS = 32


@register(
    "evt_pairwise_wins_bt",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE))
    SELECT a.event_type AS winner, b.event_type AS loser,
           CAST(sum(CASE WHEN a.x > b.x THEN 1 ELSE 0 END) AS BIGINT)
             AS wins,
           CAST(count(*) AS BIGINT) AS n_days
    FROM d a JOIN d b
      ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
    description=(
        "pairwise win matrix between event types over daily cent "
        "totals: for every unordered type pair, the days each side "
        "strictly won (ties excluded by strictness, recoverable as "
        "n_days − wins − reverse wins). The Bradley-Terry sufficient "
        "statistic — the gate runs the BT minorize-maximize fixed "
        "point to convergence and pins win-total conservation and "
        "that the strength order matches dominant pairwise rates; "
        "pairwise rankings survive days when everything moves "
        "together, where mean rankings don't. Shape: one (type, day) "
        "rollup, one day-keyed self-join bounded by days·types², one "
        "≤10-row fold"
    ),
    tags=("events", "statistics", "ranking"),
)
def evt_pairwise_wins_bt(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    ).localCheckpoint()  # both self-join sides
    a = d.select(
        F.col("day").alias("day_a"),
        F.col("event_type").alias("winner"),
        F.col("x").alias("xa"),
    )
    b = d.select(
        F.col("day").alias("day_b"),
        F.col("event_type").alias("loser"),
        F.col("x").alias("xb"),
    )
    return (
        a.join(b, a["day_a"] == b["day_b"])
        .filter(F.col("winner") < F.col("loser"))
        .groupBy("winner", "loser")
        .agg(
            F.sum(F.when(F.col("xa") > F.col("xb"), 1).otherwise(0))
            .cast("bigint")
            .alias("wins"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
    )


@register(
    "doc_shard_token_balance",
    oracle=rf"""
    WITH s AS (
      SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT % {_N_SHARDS} AS shard,
             CAST(len(list_filter(
               string_split(regexp_replace(lower(trim(text)),
                                           '\s+', ' ', 'g'), ' '),
               w -> w <> '')) AS BIGINT) AS n_tok
      FROM documents)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(max(n_tok) AS BIGINT) AS max_doc_tokens
    FROM s GROUP BY shard
    """,
    description=(
        f"hash-shard writer-balance audit: every document lands in "
        f"one of {_N_SHARDS} md5 shards and the audit emits per-shard "
        "doc/token totals plus the largest single document — the "
        "numbers that decide whether plain hash sharding is safe or "
        "size-aware packing is needed (one hot shard = one straggler "
        "write task at 100 TB). The gate assembles the max/min "
        "imbalance ratio and the token-count CV and pins hash "
        "uniformity within binomial bands. Shape: map-side shard id "
        f"+ token count, ONE ≤{_N_SHARDS}-row aggregate"
    ),
    tags=("documents", "ops", "layout"),
)
def doc_shard_token_balance(spark, sf_dir):
    from ..operators.textops import tokens

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    s = docs.select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("shard:"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _N_SHARDS
        ).alias("shard"),
        F.size(F.filter(tokens("text"), lambda w: w != ""))
        .cast("bigint")
        .alias("n_tok"),
    )
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.max("n_tok").cast("bigint").alias("max_doc_tokens"),
    )
