#!/usr/bin/env python
"""Regenerate ``BENCH_QUIET_REF.json`` — the per-query quiet-host
reference that drives ``bench.py``'s outlier-retry rule.

For every committed version of ``BENCH_RESULTS.json`` in git history,
take each query's minimum recorded min-of-N wall time. The minimum over
committed history is the best available estimate of the query's quiet
plan cost: host contention only ever inflates a wall time, never
deflates it, so the smallest number any committed artifact ever
recorded is the closest to the uncontended cost.

Run after a quiet-host closeout bench so newly added queries get a
reference (a query absent from the file is simply never retried).

Usage: python scripts/update_quiet_ref.py
"""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


#: Queries whose implementation was INTENTIONALLY rewritten with a
#: different cost profile: history older than (and including) the named
#: commit is excluded from their minimum, otherwise the all-history min
#: permanently reflects the retired implementation and the retry rule
#: flags the new one forever. rounds 12+: the two streaming sketches
#: traded engine-native binary state (~0.4 s) for portable salted-md5
#: state (~0.8 s) to become oracle-checkable — a deliberate trade.
REBASED_AT: dict[str, str] = {
    "stream_hll_distinct": "18bac56",
    "stream_heavy_hitters": "18bac56",
}


def main() -> None:
    commits = subprocess.run(
        ["git", "log", "--pretty=%h", "--", "BENCH_RESULTS.json"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.split()
    best: dict[str, float] = {}
    used: list[str] = []
    # for each re-based query, the set of commits AFTER its rewrite
    # (rev-list cutoff..HEAD) — only artifacts committed there reflect
    # the new implementation's cost
    after_cutoff: dict[str, set[str]] = {
        q: set(
            subprocess.run(
                ["git", "rev-list", "--abbrev-commit", f"{cut}..HEAD"],
                capture_output=True,
                text=True,
                cwd=REPO,
            ).stdout.split()
        )
        for q, cut in REBASED_AT.items()
    }
    for c in commits:
        raw = subprocess.run(
            ["git", "show", f"{c}:BENCH_RESULTS.json"],
            capture_output=True,
            text=True,
            cwd=REPO,
        ).stdout
        try:
            queries = json.loads(raw).get("queries", {})
        except ValueError:
            continue
        if not queries:
            continue
        used.append(c)
        for name, t in queries.items():
            if name in after_cutoff and c not in after_cutoff[name]:
                continue  # pre-rewrite artifact for a re-based query
            if t and (name not in best or t < best[name]):
                best[name] = t
    # the working-tree artifact too (a just-finished quiet bench that
    # hasn't been committed yet should still seed new queries)
    try:
        with open(os.path.join(REPO, "BENCH_RESULTS.json")) as fh:
            for name, t in json.load(fh).get("queries", {}).items():
                if t and (name not in best or t < best[name]):
                    best[name] = t
    except (OSError, ValueError):
        pass
    out = {
        "_doc": (
            "Per-query QUIET-HOST reference: minimum committed min-of-N "
            "wall time across every BENCH_RESULTS.json in git history. "
            "bench.py's outlier-retry rule re-runs any query whose fresh "
            "min exceeds retry_factor x this value (untouched code should "
            "never legitimately do so); regenerate with "
            "scripts/update_quiet_ref.py after a quiet-host bench."
        ),
        "source_commits": used,
        "queries": {k: best[k] for k in sorted(best)},
    }
    path = os.path.join(REPO, "BENCH_QUIET_REF.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}: {len(best)} queries from {len(used)} commits")


if __name__ == "__main__":
    main()
