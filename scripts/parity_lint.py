#!/usr/bin/env python
"""Oracle-environment parity lint — the round-8 driver-red class.

The round-8 window produced the project's first driver-red results
(`evt_gains_table`, `evt_levene_median`): rows and schema matched but
the value hash diverged, while the builder's pinned DuckDB 1.0.0
diffcheck was cell-exact green.  Both queries shared one trait: their
DuckDB oracle's FINAL projection carried a 128-bit column (HUGEINT /
decimal(38,0)) — `sum(BIGINT)` silently widens, and `x // y` keeps the
widened type — and 128-bit values take environment-sensitive render
paths (pandas object-of-Decimal vs arrow decimal128 vs str) that a
different driver fetch stack normalizes differently.

This lint makes the hazard class mechanically visible BEFORE a driver
window does:

1. **Output-type lint** — `DESCRIBE` every registered oracle against
   the sf views (binder-only, no execution) and fail on any final
   column whose type is outside the render-stable allowlist
   (BIGINT/INTEGER/DOUBLE/VARCHAR/DATE/TIMESTAMP/BOOLEAN and lists
   thereof).  HUGEINT, DECIMAL, UBIGINT etc. are exactly the
   levene-class hazard.
2. **Convention lint** — flag oracle text using `ntile(` (bucket
   remainder placement is an engine/version convention; use explicit
   `(k*(rn-1)) // n + 1` integer arithmetic over a pinned total order
   instead).

Usage: python scripts/parity_lint.py [sf_dir]
Exit 0 = clean; 1 = hazards found (listed per query).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types whose pandas/arrow/str render paths are stable across fetch
# stacks.  Everything else (HUGEINT, DECIMAL(38,0), UBIGINT, UUID,
# BLOB...) has at least one environment-sensitive representation.
_SAFE_SCALAR = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "DATE", "BOOLEAN",
    "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
}

_NTILE_RE = re.compile(r"\bntile\s*\(", re.IGNORECASE)


def _type_ok(t: str) -> bool:
    t = t.strip()
    m = re.fullmatch(r"(.*)\[\]", t)
    if m:  # list type — safe iff the element type is
        return _type_ok(m.group(1))
    if t.startswith("STRUCT(") and t.endswith(")"):
        # split top-level fields on commas outside parens
        inner, depth, parts, cur = t[7:-1], 0, [], []
        for ch in inner:
            depth += ch == "("
            depth -= ch == ")"
            if ch == "," and depth == 0:
                parts.append("".join(cur)); cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        return all(_type_ok(p.strip().split(" ", 1)[1]) for p in parts)
    return t in _SAFE_SCALAR


def main() -> int:
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY

    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {tab} AS "
            f"SELECT * FROM '{SF_DIR}/{tab}.parquet'"
        )

    n_checked = n_bad = 0
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        n_checked += 1
        issues: list[str] = []
        if _NTILE_RE.search(spec.oracle):
            issues.append(
                "ntile(): engine-convention bucket remainders — use "
                "explicit (k*(rn-1)) // n + 1 arithmetic"
            )
        try:
            cols = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        except Exception as exc:  # binder error — surface it
            issues.append(f"DESCRIBE failed: {exc}")
            cols = []
        for cname, ctype, *_ in cols:
            if not _type_ok(ctype):
                issues.append(
                    f"final column `{cname}` has render-hazard type "
                    f"{ctype} — CAST to BIGINT (split into hi/lo "
                    f"halves if the value can exceed int64)"
                )
        if issues:
            n_bad += 1
            print(f"HAZARD {name}")
            for i in issues:
                print(f"    {i}")
    print(f"\n{n_checked} oracles linted, {n_bad} with parity hazards")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
