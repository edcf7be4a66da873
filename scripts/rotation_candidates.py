#!/usr/bin/env python
"""Compute the next driver-window rotation candidates.

The correctness driver samples the FIRST 50 registry entries each round
(insertion order, set by ``plans/__init__._PRIORITY``). This script
unions every committed ``CORRECTNESS_r*.json`` to find which queries
have EVER had a driver row, then lists the never-sampled ORACLE-PAIRED
queries grouped by module — the pool the next round's ``_PRIORITY``
tuple should draw from (flagship ``evt_metrics_r2_mse`` always stays
first as the continuity canary).

Usage: python scripts/rotation_candidates.py [--limit N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import (
        REGISTRY,
        oracle_sql,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            seen.update(json.load(open(f)).keys())
        except Exception as exc:  # malformed artifact: skip, not fatal
            print(f"warn: skipping {f}: {exc}", file=sys.stderr)
    paired = set(oracle_sql())
    names = list(REGISTRY)
    never_paired = [n for n in names if n not in seen and n in paired]
    never_rowsonly = [n for n in names if n not in seen and n not in paired]

    # module of each query: the register() wrapper masks __module__, so
    # parse the plans sources — anchored to actual @register( sites (the
    # decorator's first string argument), so a query name that merely
    # appears as a quoted list element elsewhere can't steal attribution
    plans_dir = os.path.join(
        repo, "mql5_economic_news_data_pipeline_2025_gcp__spark", "plans"
    )
    reg_re = re.compile(r'@register\(\s*\n?\s*"([a-z0-9_]+)"')
    mod_of: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(plans_dir, "queries_*.py"))):
        mod = os.path.basename(path)[:-3].replace("queries_", "")
        for name in reg_re.findall(open(path).read()):
            mod_of.setdefault(name, mod)
    bymod: dict[str, list[str]] = defaultdict(list)
    for n in never_paired:
        bymod[mod_of.get(n, "?")].append(n)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--limit", type=int, default=49)
    limit = ap.parse_args().limit
    print(
        f"registry={len(names)} paired={len(paired)} "
        f"driver-sampled-ever={len(seen & set(names))} "
        f"never-sampled: paired={len(never_paired)} "
        f"rows-only={len(never_rowsonly)}"
    )
    print(f"\nnext-window candidates by module (pick {limit} + flagship):")
    for mod in sorted(bymod):
        qs = sorted(bymod[mod])
        print(f"  {mod} ({len(qs)}): {', '.join(qs)}")
    print("\nnever-sampled rows-only (weaker check; deprioritize):")
    print(f"  {', '.join(never_rowsonly)}")


if __name__ == "__main__":
    main()
