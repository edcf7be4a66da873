#!/usr/bin/env python
"""Oracle fetch-path matrix — reproduce the driver's comparison locally.

The round-8 driver window hash-mismatched two queries whose local
DuckDB 1.0.0 diffcheck was cell-exact green.  The divergence lives in
the FETCH PATH: the same DuckDB result renders differently depending on
how a harness pulls it (native `.df()` pandas conversion, Arrow
`.arrow().to_pandas()`, or raw `.fetchall()` Python objects) for types
like HUGEINT / DECIMAL / TIMESTAMP precision.  A query whose oracle
output is identical across ALL fetch paths is robust to whatever stack
the driver runs; a query that differs across paths is a driver-red
candidate regardless of the engine version.

(Only DuckDB 1.0.0 exists in this container and installs are barred, so
a true version matrix is not runnable here; the fetch-path matrix plus
`scripts/parity_lint.py`'s output-type lint are the local proxy — the
type lint catches the version-sensitive constructs statically.)

Usage: python scripts/oracle_matrix.py [sf_dir] [query ...]
Exit 0 = every oracle renders identically on all three paths.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from diffcheck import TABLES, normalize  # noqa: E402  (sibling script)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])


def _hash(df: pd.DataFrame) -> str:
    # the same lenient normalization diffcheck applies to BOTH engines,
    # then a canonical CSV render — any cross-path difference that
    # survives normalize() would also survive a driver's comparison
    n = normalize(df)
    return hashlib.md5(
        n.to_csv(index=False, float_format="%.17g").encode()
    ).hexdigest()


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
        if spec.oracle is None or (ONLY and name not in ONLY):
            continue
        n_checked += 1
        try:
            via_df = con.execute(spec.oracle).df()
            via_arrow = con.execute(spec.oracle).arrow().to_pandas()
            raw = con.execute(spec.oracle)
            cols = [d[0] for d in raw.description]
            via_rows = pd.DataFrame(raw.fetchall(), columns=cols)
        except Exception as exc:
            print(f"ERROR {name}: {exc}")
            n_bad += 1
            continue
        hashes = {
            "df": _hash(via_df),
            "arrow": _hash(via_arrow),
            "fetchall": _hash(via_rows),
        }
        if len(set(hashes.values())) > 1:
            n_bad += 1
            print(f"DIVERGE {name}: {hashes}")
    print(f"\n{n_checked} oracles, {n_bad} fetch-path divergent")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
