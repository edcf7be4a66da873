"""Batch-cadence arithmetic (reference DAG parity).

The reference's Airflow DAG fires ``schedule_interval="0 0 1 * *"`` —
monthly, 1st at 00:00 UTC (``Upload Dag/arranged_batch_monthly_storage_
bucket_upload.py:68``) — and each firing drains whatever landed since
the last run. The engine represents the EXECUTION side of that contract
with ``Trigger.AvailableNow`` (drain-everything-then-stop, exactly-once
via the checkpoint); this module supplies the SCHEDULING side: given
"now", when does the next drain fire, and which fires were missed while
the runner was down (Airflow's catch-up semantics).

No daemon lives here by design — in production the firing is owned by
whatever supervises the job (cron, a workflow engine, a k8s CronJob);
the engine's contract is only that running the drain AT each fire time
reproduces the reference's monthly batch exactly.
"""

from __future__ import annotations

import datetime as dt


def next_monthly_fire(
    after: dt.datetime,
    day: int = 1,
    hour: int = 0,
    minute: int = 0,
) -> dt.datetime:
    """First ``day@hour:minute`` fire time STRICTLY after ``after`` —
    the ``0 0 1 * *`` cadence generalized to any day-of-month."""
    candidate = after.replace(
        day=day, hour=hour, minute=minute, second=0, microsecond=0
    )
    if candidate > after:
        return candidate
    # roll to next month (handles December -> January)
    year, month = after.year + (after.month == 12), after.month % 12 + 1
    return candidate.replace(year=year, month=month)


def fires_between(
    start: dt.datetime,
    end: dt.datetime,
    day: int = 1,
    hour: int = 0,
    minute: int = 0,
) -> list[dt.datetime]:
    """Every fire time in (start, end] — the catch-up list a restarted
    runner must drain, oldest first (bounded by months elapsed)."""
    out: list[dt.datetime] = []
    cur = next_monthly_fire(start, day=day, hour=hour, minute=minute)
    while cur <= end:
        out.append(cur)
        cur = next_monthly_fire(cur, day=day, hour=hour, minute=minute)
    return out
