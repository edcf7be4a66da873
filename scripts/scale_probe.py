#!/usr/bin/env python
"""sf1 scale probe: measure how the slowest queries scale 0.1 -> 1.0.

Generates a 10x replica of /root/testdata/sf0.1 into a scratch dir
(default /tmp/spark_graft_sf1) with *key remapping* so that cardinality
scales the way a real 10x corpus would:

- fact keys (event_id, doc_id, vec_id, orderkey, custkey, ...) are
  offset per replica, so the number of groups/users/documents grows 10x
  while per-group sizes stay constant (replicating without remapping
  would instead grow every group 10x — the wrong workload shape, and it
  would turn the dedup tables into one giant duplicate cluster);
- document text is deterministically PERMUTED per replica (tokens
  sorted by md5(token, replica, position) — a rotation is NOT enough:
  linear shingles of a rotated sequence differ only at the boundary,
  and a rotation-only variant measured 288k LSH candidate pairs at sf1
  vs 829 at sf0.1, 214k of them replica-vs-original) and salted with a
  few replica-unique tokens, so replicas are NOT near-duplicates of
  each other and LSH candidate volume scales like a real corpus
  instead of quadratically inside artificial clusters;
- embeddings are cyclically rotated per replica (norm-preserving, new
  direction), so ANN bucket occupancy scales instead of stacking 10
  identical vectors per point;
- dimension tables (region, nation) are copied as-is — real clusters
  hold dims fixed as facts grow.

Then runs the chosen queries at sf0.1 and at the scratch sf1 dir
(best-of-2 each, same harness as bench.py) and reports the scaling
exponent  log10(t_sf1 / t_sf01)  — 1.0 = linear, <1 sub-linear (fixed
costs amortizing), >1 super-linear (a plan that will not survive 100 TB).

Usage:
    python scripts/scale_probe.py [--gen] [--queries q1,q2,...] [--top N]

Writes probe results to scripts/SCALE_PROBE.json; SCALE.md holds the
curated table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPLICAS = 10

# key offsets per replica — far above each table's real key range
OFFSETS = {
    "event_id": 10**9,
    "user_id": 10**6,
    "doc_id": 10**7,
    "vec_id": 10**6,
    "orderkey": 10**8,
    "custkey": 10**6,
    "suppkey": 10**5,
    "partkey": 10**7,
}


def generate(out_dir: str) -> None:
    from pyspark.sql import functions as F

    from mql5_economic_news_data_pipeline_2025_gcp__spark.session import get_spark

    spark = get_spark("scale-probe-gen")
    # write µs timestamps (not INT96, which pyarrow footers report as
    # timestamp[ns]) so the generated tables round-trip like the originals
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    os.makedirs(out_dir, exist_ok=True)

    def reps(df, cols_offsets):
        """Union REPLICAS copies with per-replica key offsets."""
        out = None
        for r in range(REPLICAS):
            d = df
            for col, base in cols_offsets.items():
                d = d.withColumn(col, F.col(col) + F.lit(r * base))
            out = d if out is None else out.unionByName(d)
        return out

    t0 = time.time()

    # --- dims: copy verbatim ---
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    # --- star schema facts/dims: offset joined keys consistently ---
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    reps(cust, {"c_custkey": OFFSETS["custkey"]}).write.mode("overwrite").parquet(
        f"{out_dir}/customer.parquet"
    )
    supp = spark.read.parquet(f"{SRC}/supplier.parquet")
    reps(supp, {"s_suppkey": OFFSETS["suppkey"]}).write.mode("overwrite").parquet(
        f"{out_dir}/supplier.parquet"
    )
    part = spark.read.parquet(f"{SRC}/part.parquet")
    reps(part, {"p_partkey": OFFSETS["partkey"]}).write.mode("overwrite").parquet(
        f"{out_dir}/part.parquet"
    )
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    reps(
        orders, {"o_orderkey": OFFSETS["orderkey"], "o_custkey": OFFSETS["custkey"]}
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    reps(
        li,
        {
            "l_orderkey": OFFSETS["orderkey"],
            "l_suppkey": OFFSETS["suppkey"],
            "l_partkey": OFFSETS["partkey"],
        },
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    # --- events: new users per replica, same per-user series shape ---
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    reps(
        ev, {"event_id": OFFSETS["event_id"], "user_id": OFFSETS["user_id"]}
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # --- documents: rotate tokens + salt so replicas are not near-dups ---
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    out = None
    for r in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * OFFSETS["doc_id"]))
        if r > 0:
            toks = F.split(F.col("text"), r"\s+")
            # deterministic per-replica permutation: sort tokens by
            # md5(token, replica, position) — destroys ALL adjacency, so
            # word-shingle sets diverge completely from the original
            keyed = F.transform(
                toks,
                lambda x, i: F.struct(
                    F.md5(
                        F.concat(x, F.lit(f"|r{r}|"), i.cast("string"))
                    ).alias("k"),
                    x.alias("tk"),
                ),
            )
            shuffled = F.transform(F.array_sort(keyed), lambda s: s["tk"])
            # plus PER-DOC-unique salt tokens for very short docs (a
            # shared salt — e.g. doc_id % 97 — puts an identical shingle
            # in ~n/97 docs per replica and measured a 51× LSH candidate
            # blow-up from band collisions on it)
            salt = F.array(
                *[
                    F.concat(
                        F.lit(f"zq{r}x"),
                        (F.col("doc_id") * 3 + F.lit(i)).cast("string"),
                    )
                    for i in range(3)
                ]
            )
            d = d.withColumn("text", F.array_join(F.concat(shuffled, salt), " "))
            d = d.withColumn("n_chars", F.length("text").cast("long"))
        out = d if out is None else out.unionByName(d)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # --- embeddings: cyclic rotation (norm-preserving new direction) ---
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    out = None
    for r in range(REPLICAS):
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * OFFSETS["vec_id"]))
        if r > 0:
            v = F.col("embedding")
            n = F.size(v)
            d = d.withColumn(
                "embedding", F.concat(F.slice(v, r + 1, n), F.slice(v, 1, r))
            )
        out = d if out is None else out.unionByName(d)
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    print(f"generated sf1 at {out_dir} in {time.time() - t0:.1f}s")
    for t in ("events", "documents", "embeddings", "lineitem"):
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"  {t}: {n} rows")


def probe(queries: list[str], sf1_dir: str) -> dict:
    from mql5_economic_news_data_pipeline_2025_gcp__spark.plans import REGISTRY
    from mql5_economic_news_data_pipeline_2025_gcp__spark.session import get_spark

    spark = get_spark("scale-probe")
    # warm-up (JVM, AQE, python daemons) — same as bench.py
    REGISTRY["evt_typed_scan"].spark_fn(spark, SRC).count()
    spark.range(128).repartition(32).mapInPandas(lambda it: it, "id long").count()

    results = {}
    for name in queries:
        spec = REGISTRY[name]
        row = {}
        for label, d in (("sf0.1", SRC), ("sf1", sf1_dir)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                spec.spark_fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            row[label] = round(best, 3)
            spark.catalog.clearCache()
        ratio = row["sf1"] / max(row["sf0.1"], 1e-9)
        row["ratio"] = round(ratio, 2)
        import math

        row["exponent"] = round(math.log10(max(ratio, 1e-9)), 2)
        results[name] = row
        print(f"{name:32s} sf0.1={row['sf0.1']:7.2f}s sf1={row['sf1']:7.2f}s "
              f"ratio={row['ratio']:5.1f} exp={row['exponent']}")
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true", help="(re)generate the sf1 scratch dataset")
    ap.add_argument("--queries", default="", help="comma-separated query names")
    ap.add_argument("--top", type=int, default=10, help="probe the N slowest from BENCH_RESULTS.json")
    ap.add_argument("--out-dir", default=DEFAULT_OUT)
    args = ap.parse_args()

    if args.gen or not os.path.exists(os.path.join(args.out_dir, "events.parquet")):
        generate(args.out_dir)

    if args.queries:
        qs = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        bench_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_RESULTS.json")
        with open(bench_path) as fh:
            timings = json.load(fh)["queries"]
        qs = [k for k, _ in sorted(timings.items(), key=lambda kv: -kv[1])[: args.top]]

    results = probe(qs, args.out_dir)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_PROBE.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
