#!/usr/bin/env python
"""Local differential checker mimicking the driver: runs every registered
query on Spark AND its DuckDB oracle at the given SF, compares row count,
column names, and cell values (exact for ints/strings, bit-exact target
for doubles — reports max abs diff when nonzero).

Usage: python scripts/diffcheck.py [--driver-view] [sf_dir] [query ...]

``--driver-view`` checks the DRIVER-CONTRACT view (__spark_entry__'s
queries()/oracle_sql(), i.e. with DRIVER_TWINS substitution and the
substituted_by marker column) instead of the raw REGISTRY — use it to
pre-validate exactly what the correctness driver will run.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

_argv = [a for a in sys.argv[1:] if a != "--driver-view"]
DRIVER_VIEW = "--driver-view" in sys.argv[1:]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"
ONLY = set(_argv[1:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first").reset_index(drop=True)
    return df


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        return [f"row count differs: spark={len(sdf)} oracle={len(odf)}"]
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = pd.to_numeric(sv, errors="coerce").astype(float)
            ov = pd.to_numeric(ov, errors="coerce").astype(float)
            both_nan = sv.isna() & ov.isna()
            diff = (sv - ov).abs()
            bad = ~both_nan & ~(diff == 0)
            if bad.any():
                mx = diff[bad].max()
                n_exact_nan_mismatch = int((sv.isna() != ov.isna()).sum())
                problems.append(
                    f"col {c}: {int(bad.sum())}/{len(sv)} cells differ, "
                    f"max abs diff {mx!r}, nan-mismatch {n_exact_nan_mismatch}"
                )
        else:
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
            if neq.any():
                i = int(np.argmax(neq.values))
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(sv)} cells differ, "
                    f"first: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
                )
    return problems


def main() -> int:
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
    from mql5_economic_news_data_pipeline_2025_gcp__spark.session import get_spark

    if DRIVER_VIEW:
        from mql5_economic_news_data_pipeline_2025_gcp__spark.plans.registry import (
            _driver_spec,
        )

        registry = {name: _driver_spec(name) for name in REGISTRY}
    else:
        registry = REGISTRY

    if os.environ.get("SPARK_GRAFT_DIFF_DEFAULT_SESSION"):
        # driver-environment twin: a STOCK session (no session.py tuning)
        # — catches config-drift bugs like the round-4 TIMESTAMP_NTZ break
        from pyspark.sql import SparkSession

        cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("diffcheck-default")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("diffcheck", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {tab} AS SELECT * FROM '{SF_DIR}/{tab}.parquet'"
        )

    n_pass = n_fail = 0
    for name, spec in registry.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark_fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.oracle is None:
            status = f"rows-only ({len(sdf)} rows)"
            if len(sdf) == 0:
                print(f"WARN {name}: {status} — EMPTY")
            else:
                print(f"pass {name}: {status}  [{time.time()-t0:.1f}s]")
                n_pass += 1
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} rows)  [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"pass {name} ({len(sdf)} rows)  [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
