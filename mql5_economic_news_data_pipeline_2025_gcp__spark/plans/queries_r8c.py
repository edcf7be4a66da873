"""Round-8 batch c: traffic-governance operators (token-bucket rate
limiting), exact and oracle-paired.

A serving/ingest pipeline enforces per-key quotas with token buckets;
these queries AUDIT such a policy offline against the event log — the
replay a platform runs before changing a rate limit. The bucket is a
per-user sequential fold, kept exact with integer millitokens:
tok' = min(cap, tok + Δt·rate), request allowed iff tok' ≥ cost.

Determinism notes (why the oracle looks the way it does): DuckDB
v1.0's ``list_reduce`` mis-evaluates multi-field STRUCT accumulators
whose field expressions reference other accumulator fields (measured:
``b := 10*acc.b + acc.a`` folds to 23, not 12, over 3 steps), so the
oracle packs the whole state into ONE BIGINT — ``(prev_epoch << 34) |
(tok_millis << 20) | allowed`` — and folds with shift/mask arithmetic
(all fields non-negative, so ``>>``/``&`` agree across engines). The
Spark side keeps the readable struct accumulator (verified correct).
Epochs are seconds relative to 2024-01-01 (28 bits ≈ 8.5 years);
allowed counts get 20 bits (≥ 1M events/user before overflow — far
above any per-user count in the fixtures, and the packing is an
ORACLE artifact only; the engine side has no such bound).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: bucket parameters: 3.000 tokens capacity, 17 millitokens/s refill
#: (≈ 1 token/min), 1.000 tokens per request.
_RL_CAP = 3000
_RL_RATE = 17
_RL_COST = 1000
_RL_EPOCH = 1704067200  # 2024-01-01 UTC, both engines
_RL_SENTINEL = (1 << 28) - 1


def _sql_fold(cap: int) -> str:
    """DuckDB packed-BIGINT token-bucket fold over the sorted epoch
    list ``es`` (state = (prev << 34) | (tok << 20) | allowed)."""
    init = (_RL_SENTINEL << 34) + (cap << 20)
    t1 = (
        f"least({cap}, ((acc >> 20) & 16383) + "
        f"(CASE WHEN (acc >> 34) = {_RL_SENTINEL} THEN 0 "
        f"ELSE x - (acc >> 34) END) * {_RL_RATE})"
    )
    return (
        f"list_reduce(list_prepend(CAST({init} AS BIGINT), es), "
        f"(acc, x) -> (x << 34) "
        f"+ ((CASE WHEN {t1} >= {_RL_COST} THEN {t1} - {_RL_COST} "
        f"ELSE {t1} END) << 20) "
        f"+ (acc & 1048575) "
        f"+ (CASE WHEN {t1} >= {_RL_COST} THEN 1 ELSE 0 END))"
    )


_SQL_UA = f"""
    base AS (
      SELECT user_id, event_id,
             epoch_us(ts) // 1000000 - {_RL_EPOCH} AS e
      FROM events),
    ua AS (
      SELECT user_id,
             list_transform(
               list_sort(list(struct_pack(e := e, i := event_id))),
               s -> s.e) AS es,
             CAST(count(*) AS BIGINT) AS n_events
      FROM base WHERE e >= 0 GROUP BY user_id)
"""


def _spark_fold(es_col, cap: int):
    """Spark struct-accumulator token-bucket fold (readable form; the
    engine evaluates it correctly — see module docstring)."""

    def step(acc, x):
        dt = F.when(acc["prev"] < 0, F.lit(0)).otherwise(x - acc["prev"])
        t1 = F.least(F.lit(cap).cast("bigint"), acc["tok"] + dt * _RL_RATE)
        ok = t1 >= _RL_COST
        return F.struct(
            x.alias("prev"),
            F.when(ok, t1 - _RL_COST).otherwise(t1).alias("tok"),
            (acc["allowed"] + F.when(ok, 1).otherwise(0)).alias("allowed"),
        )

    init = F.struct(
        F.lit(-1).cast("bigint").alias("prev"),
        F.lit(cap).cast("bigint").alias("tok"),
        F.lit(0).cast("bigint").alias("allowed"),
    )
    return F.aggregate(es_col, init, step)


def _user_arrays(spark, sf_dir):
    ev = keyed_events(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_id",
        (
            F.unix_timestamp("ts").cast("bigint") - F.lit(_RL_EPOCH)
        ).alias("e"),
    ).filter(F.col("e") >= 0)
    return base.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("e"), F.col("event_id")))),
            lambda s: s["e"],
        ).alias("es"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@register(
    "evt_rate_limit_audit",
    oracle=f"""
    WITH {_SQL_UA},
    f AS (SELECT user_id, n_events, {_sql_fold(_RL_CAP)} AS st FROM ua)
    SELECT user_id, n_events,
           CAST(st & 1048575 AS BIGINT) AS allowed,
           CAST(n_events - (st & 1048575) AS BIGINT) AS denied,
           CAST((st >> 20) & 16383 AS BIGINT) AS final_tok_m
    FROM f
    """,
    description=(
        "per-user token-bucket replay over the event log — the audit a "
        "platform runs before changing an API rate limit (who would "
        "have been throttled under cap=3 tokens, 1 token/min refill, 1 "
        "token/request?). Exact integer millitokens: tok' = min(cap, "
        "tok + Δt·17), allowed iff tok' ≥ 1000; events replayed in "
        "(ts, event_id) order via one per-user sorted array + a "
        "sequential fold — the bucket is order-dependent by "
        "definition, so the fold IS the algorithm, not a shortcut. "
        "Shape: ONE groupBy(user) collect (per-user arrays bounded by "
        "per-user event counts — the same contract as "
        "evt_sequence_build), then map-side JVM array folds; no "
        "second shuffle. The oracle folds the identical bucket with "
        "single-BIGINT packed state (see module docstring for why)"
    ),
    tags=("events", "governance", "sequence"),
)
def evt_rate_limit_audit(spark, sf_dir):
    ua = _user_arrays(spark, sf_dir)
    st = _spark_fold(F.col("es"), _RL_CAP)
    return ua.select(
        "user_id",
        "n_events",
        st["allowed"].alias("allowed"),
        (F.col("n_events") - st["allowed"]).cast("bigint").alias("denied"),
        st["tok"].alias("final_tok_m"),
    )


@register(
    "evt_rate_limit_policy_sweep",
    oracle=f"""
    WITH {_SQL_UA},
    f AS (
      SELECT user_id, n_events,
             {_sql_fold(1000)} AS st1,
             {_sql_fold(3000)} AS st3,
             {_sql_fold(10000)} AS st10
      FROM ua),
    l AS (
      SELECT CAST(1000 AS BIGINT) AS cap_millitok, n_events,
             st1 & 1048575 AS allowed FROM f
      UNION ALL
      SELECT 3000, n_events, st3 & 1048575 FROM f
      UNION ALL
      SELECT 10000, n_events, st10 & 1048575 FROM f)
    SELECT cap_millitok,
           CAST(sum(allowed) AS BIGINT) AS total_allowed,
           CAST(sum(n_events - allowed) AS BIGINT) AS total_denied,
           CAST(count(CASE WHEN n_events > allowed THEN 1 END) AS BIGINT)
             AS users_throttled,
           CAST(count(*) AS BIGINT) AS n_users
    FROM l GROUP BY cap_millitok
    """,
    description=(
        "rate-limit policy sweep: the SAME token-bucket replay at "
        "three capacities (1/3/10 tokens) in ONE pass over the "
        "per-user arrays — total allowed/denied and how many users "
        "would feel each policy, the curve an operator reads to pick "
        "a cap before enforcing it (the frequency-cap-sim pattern "
        "applied to quota governance). All three folds ride one "
        "collect; the readout is a 3-row aggregate. Same exactness "
        "and ordering contract as evt_rate_limit_audit"
    ),
    tags=("events", "governance", "sequence"),
)
def evt_rate_limit_policy_sweep(spark, sf_dir):
    ua = _user_arrays(spark, sf_dir)
    folds = ua.select(
        "n_events",
        *[
            _spark_fold(F.col("es"), cap)["allowed"].alias(f"a{cap}")
            for cap in (1000, 3000, 10000)
        ],
    )
    l = folds.select(
        "n_events",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cap).cast("bigint").alias("cap_millitok"),
                        F.col(f"a{cap}").alias("allowed"),
                    )
                    for cap in (1000, 3000, 10000)
                ]
            )
        ).alias("x"),
    ).select(
        "n_events",
        F.col("x.cap_millitok").alias("cap_millitok"),
        F.col("x.allowed").alias("allowed"),
    )
    return l.groupBy("cap_millitok").agg(
        F.sum("allowed").cast("bigint").alias("total_allowed"),
        F.sum(F.col("n_events") - F.col("allowed"))
        .cast("bigint")
        .alias("total_denied"),
        F.count(F.when(F.col("n_events") > F.col("allowed"), 1))
        .cast("bigint")
        .alias("users_throttled"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )


@register(
    "stream_rate_limited",
    oracle=f"""
    WITH {_SQL_UA},
    f AS (SELECT user_id, n_events, {_sql_fold(_RL_CAP)} AS st FROM ua)
    SELECT user_id, n_events,
           CAST(st & 1048575 AS BIGINT) AS allowed,
           CAST(n_events - (st & 1048575) AS BIGINT) AS denied,
           CAST((st >> 20) & 16383 AS BIGINT) AS final_tok_m
    FROM f
    """,
    description=(
        "ONLINE token-bucket enforcement as a custom stateful "
        "streaming operator (applyInPandasWithState; four scalars of "
        "state per user, store bounded by |users|): the gateway-side "
        "form of evt_rate_limit_audit — a full drain of the "
        "chronological stream must equal the batch replay exactly, "
        "which is what the shared oracle checks. In-batch arrivals "
        "are replayed in (ts, event_id) order inside the state "
        "update; cross-batch order rides the file source's "
        "chronological delivery (the landing-prefix contract). "
        "Update-mode sink: the final state row per user is the one "
        "with max n_events"
    ),
    tags=("streaming", "stateful", "governance", "pandas-udf"),
)
def stream_rate_limited_q(spark, sf_dir):
    from ..streaming.stateful import stream_rate_limited as run

    raw = run(spark, sf_dir)
    latest = raw.groupBy("user_id").agg(
        F.max(
            F.struct("n_events", "allowed", "denied", "final_tok_m")
        ).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.n_events").cast("bigint").alias("n_events"),
        F.col("s.allowed").cast("bigint").alias("allowed"),
        F.col("s.denied").cast("bigint").alias("denied"),
        F.col("s.final_tok_m").cast("bigint").alias("final_tok_m"),
    )
