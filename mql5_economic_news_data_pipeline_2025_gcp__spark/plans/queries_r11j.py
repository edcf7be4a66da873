"""Round-11j batch: hidden-Markov regime decoding — the Viterbi
forward-max table, hash-checkable.

``evt_hmm_viterbi_check`` — regime detection (calm vs volatile) over
each type's daily up/down sequence with a LITERAL 2-state HMM, the
decoding primitive behind market-regime labels that the changepoint
family (`evt_changepoint_sse`, `evt_changepoint_binseg2`,
`evt_pettitt_test`) approaches from the frequentist side. The emitted
artifact is the full Viterbi FORWARD-MAX table — per (type, day t):
max path score ending in each state — which pins the entire DP
(emission + transition + max recursion) without needing backtrack
pointers in SQL. All scores are small literal integers (stay +2 /
switch +0; calm: down +3 / up +1; volatile: up +3 / down +1), so the
recursion is exact integer arithmetic in both engines; DuckDB replays
it as a RECURSIVE CTE over t (the `evt_dtw_check` discipline), Spark
runs the same DP driver-side over the bounded_collect'ed
|types|·|days| observation frame (calendar-bounded at any event
volume — the `evt_markov_absorption_check` precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: literal integer scores — the model IS part of the query definition
_STAY, _SWITCH = 2, 0
_E0_UP, _E0_DOWN = 1, 3  # state 0 = calm: rewards down/flat days
_E1_UP, _E1_DOWN = 3, 1  # state 1 = volatile: rewards up days


@register(
    "evt_hmm_viterbi_check",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    o AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS t,
             CASE WHEN x > lag(x) OVER (PARTITION BY event_type
                                        ORDER BY day)
                  THEN 1 ELSE 0 END AS up
      FROM d),
    obs AS (SELECT * FROM o WHERE t >= 2),
    dp(event_type, t, s0, s1) AS (
      SELECT event_type, t,
             CAST(CASE WHEN up = 1 THEN {_E0_UP} ELSE {_E0_DOWN} END
                  AS BIGINT),
             CAST(CASE WHEN up = 1 THEN {_E1_UP} ELSE {_E1_DOWN} END
                  AS BIGINT)
      FROM obs WHERE t = 2
      UNION ALL
      SELECT o.event_type, o.t,
             CASE WHEN o.up = 1 THEN {_E0_UP} ELSE {_E0_DOWN} END
               + GREATEST(dp.s0 + {_STAY}, dp.s1 + {_SWITCH}),
             CASE WHEN o.up = 1 THEN {_E1_UP} ELSE {_E1_DOWN} END
               + GREATEST(dp.s0 + {_SWITCH}, dp.s1 + {_STAY})
      FROM dp JOIN obs o
        ON o.event_type = dp.event_type AND o.t = dp.t + 1)
    SELECT event_type, CAST(t AS BIGINT) AS t, s0, s1 FROM dp
    """,
    description=(
        "Viterbi forward-max table of a literal 2-state HMM "
        "(calm/volatile) over each type's daily up/down sequence: per "
        "(type, day) the max path score ending in each state, exact "
        "integer scores — the regime-decoding DP pinned without "
        "backtrack pointers (argmax path falls out by following "
        "GREATEST choices, asserted in the gate). DuckDB replays the "
        "recursion as a RECURSIVE CTE; Spark runs the identical DP "
        "over the bounded_collect'ed |types|·|days| observation frame "
        "— calendar-bounded at any event volume"
    ),
    tags=("events", "statistics", "sequence", "check-twin"),
)
def evt_hmm_viterbi_check(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.pq import bounded_collect

    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value_c").cast("bigint").alias("x")
    )
    byt = Window.partitionBy("event_type").orderBy("day")
    o = d.select(
        "event_type",
        F.row_number().over(byt).alias("t"),
        F.when(F.col("x") > F.lag("x").over(byt), 1)
        .otherwise(0)
        .alias("up"),
    ).filter(F.col("t") >= 2)
    rows = bounded_collect(o, "viterbi observation frame")
    seqs: dict[str, dict[int, int]] = {}
    for r in rows:
        seqs.setdefault(r["event_type"], {})[int(r["t"])] = int(r["up"])
    out = []
    for ty, obs in sorted(seqs.items()):
        s0 = s1 = None
        for t in sorted(obs):
            up = obs[t]
            e0 = _E0_UP if up else _E0_DOWN
            e1 = _E1_UP if up else _E1_DOWN
            if s0 is None:
                s0, s1 = e0, e1
            else:
                s0, s1 = (
                    e0 + max(s0 + _STAY, s1 + _SWITCH),
                    e1 + max(s0 + _SWITCH, s1 + _STAY),
                )
            out.append((ty, t, s0, s1))
    return spark.createDataFrame(
        out, "event_type string, t long, s0 long, s1 long"
    )
