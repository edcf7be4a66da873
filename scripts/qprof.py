#!/usr/bin/env python
"""Per-query profiler for optimization rounds.

For each named query: times plan CONSTRUCTION (spark_fn call — py4j
chatter, fan_out partition probes, analysis triggered by .rdd etc.)
separately from EXECUTION (noop sink), and optionally dumps
``explain("formatted")`` to a file.

Usage:
    python scripts/qprof.py q1,q2,...  [--iters 3] [--explain-dir plans/r13]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
    from mql5_economic_news_data_pipeline_2025_gcp__spark.session import get_spark

    spark = get_spark("qprof")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py
    REGISTRY["evt_typed_scan"].spark_fn(spark, SF_DIR).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    names = [q for q in args.queries.split(",") if q]
    for name in names:
        spec = REGISTRY[name]
        cons, execs, totals = [], [], []
        for _ in range(args.iters):
            t0 = time.time()
            df = spec.spark_fn(spark, SF_DIR)
            t1 = time.time()
            spark.sparkContext.setJobDescription(f"qprof:{name}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            totals.append(t2 - t0)
            spark.catalog.clearCache()
        print(
            f"{name:45s} total={min(totals):7.3f}  construct={min(cons):7.3f}"
            f"  exec={min(execs):7.3f}   (all totals: "
            + " ".join(f"{t:.3f}" for t in totals)
            + ")",
            flush=True,
        )
        if args.explain_dir:
            import contextlib
            import io

            os.makedirs(args.explain_dir, exist_ok=True)
            df = spec.spark_fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(
                args.explain_dir, f"{name}{args.suffix}.txt"
            )
            with open(out, "w") as fh:
                fh.write(buf.getvalue())


if __name__ == "__main__":
    main()
