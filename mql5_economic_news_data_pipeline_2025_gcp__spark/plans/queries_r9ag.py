"""Round-9 batch ag: greedy source selection for vocabulary coverage
and integer periodicity scanning.

``doc_greedy_vocab_cover`` — greedy set cover of the corpus vocabulary
by sources: each of 4 rounds picks the source whose documents add the
MOST not-yet-covered distinct words.  This is the data-mixing question
"which sources actually buy new vocabulary" answered constructively —
`doc_source_js_divergence` says sources differ, `doc_vocab_coverage`
says how much one corpus covers; the greedy cover RANKS sources by
marginal contribution (the classic (1−1/e)-approximation).  Rounds are
genuinely sequential (each pick changes the next round's gains) and are
unrolled identically: DataFrame rounds against a growing covered-word
frame vs MATERIALIZED CTE rounds (the r9o k-center recipe — inlined
CTEs re-evaluate the prefix exponentially).

``evt_dominant_period`` — the integer autocovariance scan at lags
0..14 over each type's daily series, centered at the FLOOR mean
(e = y − Σy DIV n, documented variant: exact cross-engine integers in
exchange for ≤1-cent centering bias): the argmax lag ≥ 1 is the
dominant period candidate (7 = weekly seasonality).  The detection
companion to `evt_autocorrelation` (fixed-lag ACF) and
`evt_seasonality_strength`.

Determinism: word sets are the corpus tokenizer's distinct (source,
word) pairs; greedy ties break on the lexicographically smaller
source; signed autocovariance products stay in int64 (|e| ≤ 1.5·10⁸
at sf1 ⇒ |Σe·e| ≤ 8.2·10¹⁸, bound documented); no division anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import fan_out, keyed_events, t
from .registry import register

_ROUNDS = 4
_MAX_LAG = 14

_TOK_SQL = r"""
tw AS MATERIALIZED (
      SELECT DISTINCT source, w FROM (
        SELECT source,
               unnest(string_split(regexp_replace(lower(trim(text)),
                                                  '\s+', ' ', 'g'), ' '))
                 AS w
        FROM documents) WHERE w <> '')
"""


def _cover_oracle() -> str:
    ctes = [
        _TOK_SQL.strip(),
        "srcs AS MATERIALIZED (SELECT DISTINCT source FROM tw)",
    ]
    picks = []
    prev_cov = None
    prev_picked = []
    for r in range(1, _ROUNDS + 1):
        picked_filter = (
            ""
            if not prev_picked
            else "WHERE s.source NOT IN ("
            + ", ".join(f"(SELECT source FROM c{i})" for i in prev_picked)
            + ")"
        )
        gain_src = (
            "tw"
            if prev_cov is None
            else f"(SELECT * FROM tw WHERE w NOT IN"
            f" (SELECT w FROM {prev_cov}))"
        )
        # a source whose words are ALL covered must still be pickable
        # at gain 0 (rounds never vanish): gains ride the source list
        ctes.append(
            f"""g{r} AS MATERIALIZED (
      SELECT s.source, coalesce(t.gain, 0) AS gain
      FROM srcs s LEFT JOIN (
        SELECT source, count(DISTINCT w) AS gain
        FROM {gain_src} AS u GROUP BY source) t
        ON t.source = s.source
      {picked_filter})"""
        )
        ctes.append(
            f"""c{r} AS MATERIALIZED (
      SELECT source, gain FROM g{r}
      ORDER BY gain DESC, source ASC LIMIT 1)"""
        )
        cov_terms = " UNION ".join(
            f"SELECT tw.w FROM tw JOIN c{i} USING (source)"
            for i in range(1, r + 1)
        )
        ctes.append(f"cov{r} AS MATERIALIZED ({cov_terms})")
        picks.append(
            f"SELECT {r} AS round, source, CAST(gain AS BIGINT) AS gain, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM cov{r}) AS covered "
            f"FROM c{r}"
        )
        prev_cov = f"cov{r}"
        prev_picked = list(range(1, r + 1))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    SELECT CAST(round AS BIGINT) AS round, source, gain,"
        " covered FROM ("
        + "\n    UNION ALL ".join(picks)
        + ")"
    )


@register(
    "doc_greedy_vocab_cover",
    oracle=_cover_oracle(),
    description=(
        f"greedy vocabulary set cover by source ({_ROUNDS} rounds): "
        "each round picks the source adding the most not-yet-covered "
        "distinct words (ties to the smaller source name) and emits "
        "the pick, its marginal gain, and the cumulative covered "
        "vocabulary — the constructive 'which sources buy new words' "
        "ranking behind data-mixing decisions, with the classic "
        "(1−1/e) coverage guarantee. Genuinely sequential (each pick "
        "reshapes the next round's gains); both engines unroll the "
        "rounds — Spark as DataFrame rounds against a growing "
        "covered-word frame (lazily checkpointed), DuckDB as "
        "MATERIALIZED CTEs (the r9o lesson: inlined CTEs re-evaluate "
        "the prefix exponentially). Shape per round: one anti-join "
        "against the covered frame + one ≤|sources|-row gain agg + a "
        "1-row argmax; everything is bounded by the Zipf-bounded "
        "distinct (source, word) frame, never raw tokens"
    ),
    tags=("documents", "curation", "sampling"),
)
def doc_greedy_vocab_cover(spark, sf_dir):
    from ..operators.textops import tokens

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    tw = (
        docs.select(
            "source", F.explode(tokens("text")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .localCheckpoint(eager=False)  # every round reads this frame
    )
    srcs = tw.select("source").distinct().localCheckpoint(eager=False)
    covered = None
    picked = None
    out = []
    for r in range(1, _ROUNDS + 1):
        cand = tw
        if covered is not None:
            cand = cand.join(F.broadcast(covered), "w", "left_anti")
        pool = srcs
        if picked is not None:
            pool = pool.join(F.broadcast(picked), "source", "left_anti")
        # fully-covered sources stay pickable at gain 0 — rounds never
        # vanish (left join against the remaining source pool)
        g = pool.join(
            cand.groupBy("source").agg(
                F.countDistinct("w").alias("gain")
            ),
            "source",
            "left",
        ).select("source", F.coalesce("gain", F.lit(0)).alias("gain"))
        c = (
            g.orderBy(F.col("gain").desc(), F.col("source").asc())
            .limit(1)
            .localCheckpoint(eager=False)
        )
        new_words = tw.join(F.broadcast(c.select("source")), "source").select(
            "w"
        )
        covered = (
            new_words
            if covered is None
            else covered.unionByName(new_words).distinct()
        ).localCheckpoint(eager=False)
        picked = (
            c.select("source")
            if picked is None
            else picked.unionByName(c.select("source"))
        ).localCheckpoint(eager=False)
        n_cov = covered.agg(
            F.count(F.lit(1)).cast("bigint").alias("covered")
        )
        out.append(
            c.select(
                F.lit(r).cast("bigint").alias("round"),
                "source",
                F.col("gain").cast("bigint").alias("gain"),
            ).crossJoin(F.broadcast(n_cov))
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


@register(
    "evt_dominant_period",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    m AS (
      SELECT event_type, day, y,
             sum(y) OVER (PARTITION BY event_type)
               // count(*) OVER (PARTITION BY event_type) AS mu
      FROM d),
    e AS (
      SELECT event_type, y - mu AS e,
             {", ".join(
                 f"lag(y - mu, {L}) OVER (PARTITION BY event_type"
                 f" ORDER BY day) AS e{L}" for L in range(1, _MAX_LAG + 1))}
      FROM m)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(e * e) AS BIGINT) AS acov0,
           {", ".join(
               f"CAST(sum(e * e{L}) AS BIGINT) AS acov{L}"
               for L in range(1, _MAX_LAG + 1))}
    FROM e GROUP BY event_type
    """,
    description=(
        f"integer autocovariance scan at lags 0..{_MAX_LAG} per "
        "event_type daily series, centered at the FLOOR mean "
        "(e = y − Σy DIV n; both operands non-negative, so DIV == // "
        "— the ≤1-cent centering bias is the price of exact "
        "cross-engine integers, documented). NULL-skipping sums "
        "handle the first L rows per lag. The gate computes "
        "ρ_L = acov_L/acov_0, pins |ρ| ≤ 1 (Cauchy-Schwarz up to the "
        "edge-effect slack), and reads the argmax lag ≥ 1 — the "
        "dominant-period candidate (7 = weekly) that routes series "
        "to seasonal models. Shape: one (type, day) rollup, one type "
        "window stack (mean lift + 14 lags), one fold riding the "
        "window exchange; one ≤16-BIGINT row per type at any scale"
    ),
    tags=("events", "statistics", "timeseries"),
)
def evt_dominant_period(spark, sf_dir):
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("y")
    )
    wt = Window.partitionBy("event_type")
    m = d.select(
        "event_type",
        "day",
        "y",
        F.expr(
            "sum(y) OVER (PARTITION BY event_type)"
            " DIV count(*) OVER (PARTITION BY event_type)"
        ).alias("mu"),
    )
    w_day = wt.orderBy("day")
    e = m.select(
        "event_type",
        (F.col("y") - F.col("mu")).alias("e"),
        *[
            F.lag(F.col("y") - F.col("mu"), L)
            .over(w_day)
            .alias(f"e{L}")
            for L in range(1, _MAX_LAG + 1)
        ],
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("e") * F.col("e")).cast("bigint").alias("acov0"),
    ]
    for L in range(1, _MAX_LAG + 1):
        aggs.append(
            F.sum(F.col("e") * F.col(f"e{L}"))
            .cast("bigint")
            .alias(f"acov{L}")
        )
    return e.groupBy("event_type").agg(*aggs)
