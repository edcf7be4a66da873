#!/usr/bin/env python
"""Compare two BENCH_RESULTS-format artifacts (before vs after), both
raw and normalized-by-host-factor, with per-query deltas.

Usage: python scripts/bench_compare.py BEFORE.json AFTER.json [top_n]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    bq, aq = before["queries"], after["queries"]
    shared = sorted(set(bq) & set(aq))
    # older BENCH_RESULTS artifacts predate the normalization fields
    bhf = before.get("host_factor", 1.0) or 1.0
    ahf = after.get("host_factor", 1.0) or 1.0
    print(
        f"before: {before['value']:.1f}s raw, hf={bhf},"
        f" noise={before.get('host_noise', 'n/a')}"
        f" -> {before.get('value_normalized', before['value']):.1f}s"
        f" norm over {len(bq)}"
    )
    print(
        f"after : {after['value']:.1f}s raw, hf={ahf},"
        f" noise={after.get('host_noise', 'n/a')}"
        f" -> {after.get('value_normalized', after['value']):.1f}s"
        f" norm over {len(aq)}"
    )
    if not shared:
        print("no shared queries between the two artifacts")
        return
    bs = sum(bq[k] for k in shared)
    as_ = sum(aq[k] for k in shared)
    if bs == 0:
        print("shared-before sum is zero; per-query deltas only")
        bs = float("nan")
    print(
        f"shared {len(shared)}: raw {bs:.1f} -> {as_:.1f}"
        f" ({100 * (as_ - bs) / bs:+.1f}%); normalized"
        f" {bs / bhf:.1f} -> {as_ / ahf:.1f}"
        f" ({100 * (as_ / ahf - bs / bhf) / (bs / bhf):+.1f}%)"
    )
    deltas = sorted(
        ((aq[k] / ahf) - (bq[k] / bhf), k) for k in shared
    )
    print(f"\nbiggest normalized improvements (top {top_n}):")
    for d, k in deltas[:top_n]:
        print(f"  {k:42s} {bq[k] / bhf:7.3f} -> {aq[k] / ahf:7.3f}  ({d:+.3f}s)")
    print(f"\nbiggest normalized regressions (top {top_n}):")
    for d, k in deltas[-top_n:][::-1]:
        if d <= 0:
            break
        print(f"  {k:42s} {bq[k] / bhf:7.3f} -> {aq[k] / ahf:7.3f}  ({d:+.3f}s)")


if __name__ == "__main__":
    main()
