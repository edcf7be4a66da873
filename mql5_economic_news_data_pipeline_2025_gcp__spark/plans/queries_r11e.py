"""Round-11e batch: event-time TIMERS as an oracle-paired query — the
fourth and final transformWithState leg enters the driver contract.

``stream_session_close_tws`` — gap sessionization where sessions close
either INLINE (a later event of the same user arrives past the gap) or
via ``handleExpiredTimer`` when the event-time watermark passes the
open session's end + gap (streaming/stateful.py::session_close_tws,
pytest-pinned by tests/test_r10g_timers.py). The other three legs
(ValueState / ListState / MapState) have held oracle rows since
round 10; timers were pytest-only because their output depends on the
WATERMARK — which is itself deterministic for an availableNow drain:
the final watermark is the global max event time (0s delay), so the
closed set is exactly

  every non-final session of a user            (inline closes)
  ∪ final sessions with end + gap ≤ max(ts)    (timer closes)

— a pure batch-SQL expression. This was pinned EMPIRICALLY before
registration: at sf0.001 the drain emits 905 of 906 sessions, matching
this formula exactly (the one open session is the withheld final
session whose timer the watermark never passes).

Ordering note: the operator needs per-user event-time order across the
whole drain; it sorts rows WITHIN a batch, so the oracle requires the
table to arrive as one micro-batch. Round 12 made that structural:
``session_close_tws`` opens its source with ``single_batch=True``
(maxFilesPerTrigger = actual file count), so a MULTI-FILE events table
still arrives as one batch — pinned by tests/test_r11e_ops.py::
test_session_close_tws_two_file_table against a deliberately
out-of-order 2-file split.
"""

from __future__ import annotations

from .registry import register

_GAP_S = 3600


@register(
    "stream_session_close_tws",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    marks AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER w > CAST({_GAP_S} AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
    sess AS (
      SELECT user_id, ts_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks),
    agg AS (
      SELECT user_id, sid,
             CAST(min(ts_us) AS BIGINT) AS start_us,
             CAST(max(ts_us) AS BIGINT) AS end_us,
             CAST(count(*) AS BIGINT) AS n,
             max(sid) OVER (PARTITION BY user_id) AS last_sid
      FROM sess GROUP BY user_id, sid),
    wm AS (SELECT max(ts_us) AS wm_us FROM e)
    SELECT user_id, start_us, end_us, n
    FROM agg CROSS JOIN wm
    WHERE sid < last_sid
       OR end_us + CAST({_GAP_S} AS BIGINT) * 1000000 <= wm_us
    """,
    description=(
        "gap sessionization with EVENT-TIME TIMERS on the "
        "transformWithState API: sessions close inline or when the "
        "watermark passes end + gap via handleExpiredTimer (one "
        "re-armed timer per user, ValueState session record); the "
        "availableNow drain's final watermark is the global max event "
        "time, making the closed set — non-final sessions plus final "
        "sessions with end+gap ≤ max(ts) — an exact batch-SQL oracle. "
        "Completes the typed-state quartet's driver coverage "
        "(ValueState/ListState/MapState rows exist since r10)"
    ),
    tags=("streaming", "stateful", "pandas-udf", "timers"),
)
def stream_session_close_tws(spark, sf_dir):
    from ..streaming.stateful import session_close_tws

    # append-mode sink: each closed session is emitted exactly once
    return session_close_tws(spark, sf_dir, _GAP_S)
