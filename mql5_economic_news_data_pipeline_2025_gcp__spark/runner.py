"""CLI automation runner — the reference's ``AUTO:77-173`` twin: drive
the full train → validate → test sequence over HTTP, falling back to
stepwise endpoint calls when ``/automate`` fails, and to DIRECT
pipeline calls when no server is reachable at all (``AUTO:124-153``'s
fallback ladder, extended one rung since this engine can run in-process).

Order of attempts:

1. poll ``GET /health`` until ready (``AUTO:19-28``: bounded retries);
2. ``POST /automate`` — the single-call path;
3. on failure, stepwise ``POST /train`` → ``/validate`` → ``/test``
   (``AUTO:124-153``);
4. with no server (or ``--direct``), run ``pipeline.run_automate``
   in-process on a local SparkSession.

Usage::

    python -m mql5_economic_news_data_pipeline_2025_gcp__spark.runner \
        --base-url http://127.0.0.1:8000 [--params '{"EPOCHS": 2}']
    python -m mql5_economic_news_data_pipeline_2025_gcp__spark.runner \
        --direct --events /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.error
import urllib.request


def _http(base: str, path: str, body: dict | None = None, timeout: float = 3600.0):
    """One request; POST when a body is given. Returns (status, payload).
    The 3600 s default mirrors the reference's per-step HTTP timeout
    (API:307, AUTO:15)."""
    if body is None:
        req = urllib.request.Request(base + path)
    else:
        req = urllib.request.Request(
            base + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        try:
            return e.code, json.loads(e.read())
        except Exception:
            return e.code, {"error": str(e)}


def wait_ready(base: str, attempts: int = 30, delay: float = 2.0) -> bool:
    """Server-ready poll (AUTO:19-28: 30 × 2 s)."""
    for _ in range(attempts):
        try:
            status, body = _http(base, "/health", timeout=10.0)
            if status == 200 and body.get("engine_ok"):
                return True
        except Exception:
            pass
        time.sleep(delay)
    return False


def run_over_http(base: str, params: dict | None) -> dict:
    """/automate first, stepwise fallback (AUTO:124-153)."""
    status, body = _http(base, "/automate", {"params": params} if params else {})
    if status == 200:
        return {"mode": "automate", "stages": body}
    stages: dict = {}
    status, body = _http(base, "/train", {"params": params} if params else {})
    if status != 200:
        raise RuntimeError(f"/train failed ({status}): {body}")
    stages["train"] = body
    for step in ("validate", "test"):
        status, body = _http(base, f"/{step}", {})
        if status != 200:
            raise RuntimeError(f"/{step} failed ({status}): {body}")
        stages[step] = body
    return {"mode": "stepwise", "stages": stages}


def run_direct(events_dir: str, params: dict | None) -> dict:
    """In-process rung: no server anywhere — run the pipeline directly."""
    from .pipeline import run_automate
    from .session import get_spark
    from .sources import load_table
    from pyspark.sql import functions as F

    spark = get_spark("runner-direct")
    ev = load_table(spark, events_dir, "events").select(
        F.col("ts").alias("event_ts"),
        F.col("user_id").cast("string").alias("Currency"),
        F.col("event_type").alias("Event"),
        "value",
        F.lit(1).alias("ImpactOrdinal"),
    )
    results = run_automate(ev, params=params)
    return {
        "mode": "direct",
        "stages": {
            stage: {"summary": res.summary.first().asDict()}
            for stage, res in results.items()
        },
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--base-url", default=None, help="serving.py endpoint root")
    ap.add_argument("--params", default=None, help="JSON hyperparameter overrides")
    ap.add_argument("--direct", action="store_true", help="skip HTTP, run in-process")
    ap.add_argument("--events", default="/root/testdata/sf0.001",
                    help="events dir for --direct mode")
    ap.add_argument("--ready-attempts", type=int, default=30)
    ap.add_argument("--ready-delay", type=float, default=2.0)
    args = ap.parse_args(argv)

    params = json.loads(args.params) if args.params else None
    if not args.direct and args.base_url:
        if not wait_ready(args.base_url, args.ready_attempts, args.ready_delay):
            print("server never became ready; falling back to direct",
                  file=sys.stderr)
            out = run_direct(args.events, params)
        else:
            out = run_over_http(args.base_url, params)
    else:
        out = run_direct(args.events, params)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
