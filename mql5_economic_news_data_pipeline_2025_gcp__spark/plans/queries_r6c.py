"""Round-6 continuation (batch c): record-linkage, allocation, and
interval/segmentation analytics.

Everything here follows the determinism contract in ``registry`` (exact
integer statistics; any double is produced by an IDENTICAL expression
tree on the Spark and DuckDB sides).  None of these exist in the
reference (a pandas/MySQL pipeline, SURVEY §2.8); they extend its
analytics surface the way a production data platform needs: entity
resolution across dirty sources, exact proportional allocation,
change-point detection, interval-union utilization, and banded
similarity joins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import cents, keyed_events, t
from .registry import register


@register(
    "rel_entity_resolution",
    oracle=r"""
    WITH a AS (
      SELECT c_custkey AS a_key,
             lower(replace(c_name, '#', '')) AS a_norm,
             substr(substr(c_name, 10), 5, 5) AS blk
      FROM customer),
    b AS (
      SELECT c_custkey + 1000000 AS b_id,
             c_custkey AS true_key,
             CASE WHEN c_custkey % 13 = 0
                  THEN substr(substr(c_name, 10), 1, 8)
                       || CAST((CAST(substr(substr(c_name, 10), 9, 1)
                                     AS INTEGER) + 1) % 10 AS VARCHAR)
                  ELSE substr(c_name, 10) END AS digits
      FROM customer),
    b2 AS (
      SELECT b_id, true_key,
             'cust' || digits AS b_norm,
             substr(digits, 5, 5) AS blk
      FROM b),
    cand AS (
      SELECT b2.b_id, b2.true_key, a.a_key,
             levenshtein(a.a_norm, b2.b_norm) AS dist
      FROM a JOIN b2 USING (blk)),
    best AS (
      SELECT b_id, true_key, a_key, dist,
             row_number() OVER (PARTITION BY b_id
                                ORDER BY dist, a_key) AS rn
      FROM cand),
    flags AS (
      SELECT b_id, true_key,
             max(CASE WHEN rn = 1 AND dist <= 5 THEN 1 ELSE 0 END)
               AS accepted,
             max(CASE WHEN rn = 1 AND dist <= 5 AND a_key = true_key
                      THEN 1 ELSE 0 END) AS correct
      FROM best GROUP BY b_id, true_key),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(accepted) AS BIGINT) AS n_matched,
             CAST(sum(correct) AS BIGINT) AS tp
      FROM flags),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a)
    SELECT na.n_a, m.n_b, nc.n_candidates, m.n_matched, m.tp,
           m.n_matched - m.tp AS fp,
           m.n_b - m.tp AS fn,
           CASE WHEN m.n_matched > 0
                THEN (m.tp * 10000) // m.n_matched ELSE 0 END AS prec_bp,
           (m.tp * 10000) // m.n_b AS recall_bp,
           na.n_a + m.n_b - m.n_matched AS n_golden
    FROM m, nc, na
    """,
    description="entity-resolution audit: blocking + edit-distance "
    "verify + best-match assignment over a deterministically dirtied "
    "twin of the customer table, with exact precision/recall against "
    "the known ground truth and a golden-record count",
    tags=("relational", "dedup", "join"),
)
def rel_entity_resolution(spark, sf_dir):
    """Record linkage (entity resolution) with a measurable ground truth.

    A second "source system" B is derived deterministically from the
    customer master: names re-formatted (``Customer#000000042`` →
    ``cust000000042``-normalized) and, for every 13th key, the last
    digit rotated — a corruption that moves the record into the WRONG
    blocking bucket and resolves it to the wrong master (yielding both
    a false positive and a false negative, so precision and recall are
    non-trivial).  The pipeline is the canonical three stages:

    1. **Blocking** on the last-5-digit key — an equi-join, never a
       cross product; candidate pairs are |block|² only within a block.
    2. **Verify** with ``levenshtein`` over normalized names (JVM
       built-in, whole-stage codegen) and threshold τ=5.
    3. **Best-match assignment**: ``row_number`` per B record over
       (distance, master key) — deterministic 1:1 resolution — then
       exact TP/FP/FN vs the known derivation truth and a
       golden-record (survivorship) count.

    Scale: the only shuffles are the blocking equi-join and one
    per-B-record window; block keys are digit-uniform (no skew).  At
    100 TB the blocking key caps pair growth exactly like LSH banding
    does for documents (`doc_minhash_lsh_candidates`); τ and block
    width trade recall for candidate volume, and the audit output IS
    the tuning curve's y-axis.  Precision/recall are exact integer
    basis points (no float division).
    """
    cust = t(spark, sf_dir, "customer")
    digits = F.substring("c_name", 10, 9)
    a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.lower(F.regexp_replace("c_name", "#", "")).alias("a_norm"),
        F.substring(digits, 5, 5).alias("blk"),
    )
    pert = F.concat(
        F.substring(digits, 1, 8),
        ((F.substring(digits, 9, 1).cast("int") + 1) % 10).cast("string"),
    )
    bdigits = F.when(F.col("c_custkey") % 13 == 0, pert).otherwise(digits)
    b = cust.select(
        (F.col("c_custkey") + 1000000).alias("b_id"),
        F.col("c_custkey").alias("true_key"),
        F.concat(F.lit("cust"), bdigits).alias("b_norm"),
        F.substring(bdigits, 5, 5).alias("blk"),
    )
    cand = a.join(b, "blk").select(
        "b_id", "true_key", "a_key",
        F.levenshtein("a_norm", "b_norm").alias("dist"),
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("b_id").orderBy("dist", "a_key")
        ),
    )
    ok = (F.col("rn") == 1) & (F.col("dist") <= 5)
    flags = best.groupBy("b_id", "true_key").agg(
        F.max(F.when(ok, 1).otherwise(0)).alias("accepted"),
        F.max(
            F.when(ok & (F.col("a_key") == F.col("true_key")), 1).otherwise(0)
        ).alias("correct"),
    )
    m = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("accepted").cast("bigint").alias("n_matched"),
        F.sum("correct").cast("bigint").alias("tp"),
    )
    nc = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    na = a.agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
    return (
        m.crossJoin(nc)
        .crossJoin(na)
        .select(
            "n_a", "n_b", "n_candidates", "n_matched", "tp",
            (F.col("n_matched") - F.col("tp")).alias("fp"),
            (F.col("n_b") - F.col("tp")).alias("fn"),
            F.when(
                F.col("n_matched") > 0,
                F.expr("(tp * 10000) DIV n_matched"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("prec_bp"),
            F.expr("(tp * 10000) DIV n_b").alias("recall_bp"),
            (F.col("n_a") + F.col("n_b") - F.col("n_matched")).alias(
                "n_golden"
            ),
        )
    )


@register(
    "rel_seat_apportionment",
    oracle=r"""
    WITH rev AS (
      SELECT n.n_name AS nation, n.n_nationkey AS nk,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, n.n_nationkey),
    q AS (
      SELECT nation, nk, rev_c,
             sum(rev_c) OVER () AS tot,
             (1000 * rev_c) // sum(rev_c) OVER () AS base,
             (1000 * rev_c) % sum(rev_c) OVER () AS rem
      FROM rev),
    r AS (
      SELECT nation, nk, rev_c, base, rem,
             1000 - sum(base) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, nk) AS rk
      FROM q)
    SELECT nation, CAST(rev_c AS BIGINT) AS rev_c,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM r
    """,
    description="largest-remainder (Hamilton) apportionment of 1000 "
    "units across nations proportional to order revenue — exact "
    "integer quotas, remainders ranked with a deterministic tie-break",
    tags=("relational", "aggregate"),
)
def rel_seat_apportionment(spark, sf_dir):
    """Exact proportional allocation (largest-remainder method).

    The budget/quota-splitting primitive: allocate an integer total
    (1000 units) across groups proportional to an exact measure, with
    the fractional remainders resolved by the Hamilton rule (largest
    remainder first, key tie-break).  Everything is integer arithmetic
    — ``(1000·rev) DIV total`` and ``MOD`` — so the result is
    bit-identical across engines and immune to float drift that breaks
    naive ``round(share*1000)`` implementations (which can allocate
    999 or 1001).

    Scale: one agg shuffle to nation grain (25 rows), then window math
    on the tiny allocation frame (driver-scale by definition — the
    allocation domain is the GROUP space, not the fact table).  The
    fact-side join is a broadcast of nation onto customer onto orders;
    AQE picks broadcast automatically at any SF.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("n_nationkey").alias("nk")
        )
        .agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    )
    wall = Window.partitionBy()
    q = rev.select(
        "nation", "nk", "rev_c",
        F.expr("1000 * rev_c").alias("num"),
        F.sum("rev_c").over(wall).alias("tot"),
    ).select(
        "nation", "nk", "rev_c",
        F.expr("num DIV tot").alias("base"),
        (F.col("num") % F.col("tot")).alias("rem"),
    )
    r = q.select(
        "nation", "nk", "rev_c", "base", "rem",
        (F.lit(1000) - F.sum("base").over(wall)).alias("leftover"),
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("nk"))).alias(
            "rk"
        ),
    )
    return r.select(
        "nation",
        F.col("rev_c").cast("bigint").alias("rev_c"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
    )


@register(
    "evt_changepoint_sse",
    oracle=r"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS s_c,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    c AS (
      SELECT day,
             sum(s_c) OVER (ORDER BY day) AS lsum,
             sum(n) OVER (ORDER BY day) AS lcnt,
             sum(s_c) OVER () AS tsum,
             sum(n) OVER () AS tcnt
      FROM d),
    k AS (
      SELECT day, lsum, lcnt,
             tsum - lsum AS rsum, tcnt - lcnt AS rcnt
      FROM c WHERE tcnt - lcnt > 0),
    obj AS (
      SELECT day AS split_day,
             CAST(lsum AS BIGINT) AS left_sum_c,
             CAST(lcnt AS BIGINT) AS left_n,
             CAST(rsum AS BIGINT) AS right_sum_c,
             CAST(rcnt AS BIGINT) AS right_n,
             CAST(lsum AS DOUBLE) * lsum / lcnt
               + CAST(rsum AS DOUBLE) * rsum / rcnt AS objective
      FROM k)
    SELECT * FROM (
      SELECT *, row_number() OVER (ORDER BY objective DESC, split_day)
                  AS rn
      FROM obj) WHERE rn = 1
    """,
    description="single change-point detection by binary segmentation: "
    "the daily-total split maximizing the between-segment SSE "
    "reduction (L²/n_l + R²/n_r), exact integer sums with an "
    "identical-expression-tree double objective",
    tags=("events", "statistics", "timeseries"),
)
def evt_changepoint_sse(spark, sf_dir):
    """Change-point detection: one step of binary segmentation.

    Finds the day k that best splits the daily value series into two
    segments, maximizing ``L²/n_l + R²/n_r`` — algebraically the split
    that minimizes total within-segment SSE (the CART / binary-seg
    criterion; recursing on each side yields the full segmentation
    tree, cf. `evt_cusum_alarms` for the sequential variant).

    Determinism: L, R, n_l, n_r are exact integer cents/counts from
    one day-grain agg; the objective is a double but both engines
    evaluate the IDENTICAL expression tree
    ``double(L)·L/n_l + double(R)·R/n_r`` on identical integers →
    bit-equal IEEE-754 results; argmax tie-breaks on day.

    Scale: one agg shuffle to day grain (|days| rows — bounded by the
    calendar, NOT the fact count), then windows over the tiny day
    frame.  The candidate sweep is O(|days|), never a self-join; this
    is why binary segmentation beats pairwise methods at 100 TB: the
    fact table is touched exactly once.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value_c").alias("s_c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    wcum = Window.orderBy("day")
    wall = Window.partitionBy()
    c = d.select(
        "day",
        F.sum("s_c").over(wcum).alias("lsum"),
        F.sum("n").over(wcum).alias("lcnt"),
        F.sum("s_c").over(wall).alias("tsum"),
        F.sum("n").over(wall).alias("tcnt"),
    )
    k = c.select(
        "day", "lsum", "lcnt",
        (F.col("tsum") - F.col("lsum")).alias("rsum"),
        (F.col("tcnt") - F.col("lcnt")).alias("rcnt"),
    ).filter(F.col("rcnt") > 0)
    obj = k.select(
        F.col("day").alias("split_day"),
        F.col("lsum").cast("bigint").alias("left_sum_c"),
        F.col("lcnt").cast("bigint").alias("left_n"),
        F.col("rsum").cast("bigint").alias("right_sum_c"),
        F.col("rcnt").cast("bigint").alias("right_n"),
        (
            F.col("lsum").cast("double") * F.col("lsum") / F.col("lcnt")
            + F.col("rsum").cast("double") * F.col("rsum") / F.col("rcnt")
        ).alias("objective"),
    )
    return (
        obj.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("objective"), F.asc("split_day"))
            ),
        )
        .filter(F.col("rn") == 1)
    )


@register(
    "evt_interval_coverage",
    oracle=r"""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts)
               + (abs(CAST(round(value * 100) AS BIGINT)) % 3600)
                 * 1000000 AS e_us
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT user_id, s_us, e_us,
             max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max
      FROM iv)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(CASE
                 WHEN prev_max IS NULL OR prev_max < s_us
                   THEN e_us - s_us
                 WHEN prev_max < e_us THEN e_us - prev_max
                 ELSE 0 END) AS BIGINT) AS covered_us
    FROM g GROUP BY user_id
    """,
    description="interval-union coverage per user: total covered "
    "microseconds of possibly-overlapping activity intervals via the "
    "running-max-of-ends sweep (one window, no self-join)",
    tags=("events", "window", "timeseries"),
)
def evt_interval_coverage(spark, sf_dir):
    """Union-of-intervals utilization (the billing/uptime primitive).

    Each event opens an activity interval ``[ts, ts + dur)`` (duration
    derived deterministically from the value column, capped at 1 h);
    the query computes each user's TOTAL covered time with overlaps
    counted once.  The classic sweep: order intervals by start, keep a
    running max of ends; each interval contributes
    ``max(0, end - max(start, prev_running_max))``.  One window + one
    agg — never the O(n²) self-join that naive overlap queries do.

    Distinct from `evt_activity_islands` (day-grain gaps-and-islands)
    and `evt_max_concurrency` (sweep COUNTING, not union length).

    Scale: the window partitions by user_id — per-user sequential math
    parallelized across users (the same shape as `evt_sessionize`).
    All arithmetic is integer microseconds.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    s_us = F.unix_micros("ts")
    iv = ev.select(
        "user_id", "event_id",
        s_us.alias("s_us"),
        (s_us + (F.abs(F.col("value_c")) % 3600) * 1000000).alias("e_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = iv.select(
        "user_id", "s_us", "e_us", F.max("e_us").over(w).alias("prev_max")
    )
    contrib = (
        F.when(
            F.col("prev_max").isNull() | (F.col("prev_max") < F.col("s_us")),
            F.col("e_us") - F.col("s_us"),
        )
        .when(F.col("prev_max") < F.col("e_us"), F.col("e_us") - F.col("prev_max"))
        .otherwise(0)
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(contrib).cast("bigint").alias("covered_us"),
    )


@register(
    "rel_price_band_join",
    oracle=r"""
    WITH p AS (
      SELECT p_partkey AS pk,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(round(p_retailprice * 100) AS BIGINT) // 100 AS bkt
      FROM part),
    pairs AS (
      SELECT a.pk AS apk, count(*) AS n_comp
      FROM p a JOIN p b
        ON b.bkt BETWEEN a.bkt - 1 AND a.bkt + 1
       AND b.pk <> a.pk
       AND abs(a.price_c - b.price_c) <= 100
      GROUP BY a.pk),
    per_part AS (
      SELECT p.pk, coalesce(pairs.n_comp, 0) AS n_comparable
      FROM p LEFT JOIN pairs ON pairs.apk = p.pk)
    SELECT CAST(n_comparable AS BIGINT) AS n_comparable,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM per_part GROUP BY n_comparable
    """,
    description="banded 1-D similarity join: parts within ±$1 retail "
    "price of each other, the theta-join rewritten as a bucketed "
    "equi-join (explode 3 neighbor buckets) with an exact refine — "
    "histogram of comparable-set sizes",
    tags=("relational", "join"),
)
def rel_price_band_join(spark, sf_dir):
    """Band join (|a.price − b.price| ≤ ε) as a scalable equi-join.

    The naive formulation is a theta-join — a cross product Spark
    would execute as BroadcastNestedLoopJoin, O(n²) at any scale.  The
    standard rewrite buckets the join key at the band width (ε = 100
    cents) and EXPLODES each left row to its 3 neighbor buckets, so
    the planner sees a pure equi-join on ``bkt`` (shuffle-hash/SMJ,
    AQE-skew-safe) and the exact ``abs(diff) ≤ ε`` predicate only
    refines within buckets — identical to the grid trick in
    `evt_geo_radius_join`, 1-D instead of 2-D.

    Output is the comparable-set-size histogram (bounded rows), with
    zero-neighbor parts retained via the left join back onto the part
    frame.

    Scale: pair volume is Σ|bucket|·|neighbor buckets| — linear in n
    for bounded price density; a skewed price point (many parts at one
    price) concentrates one bucket, which AQE's skew-join splitting
    handles since the join IS an equi-join.
    """
    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        cents("p_retailprice").alias("price_c"),
        F.expr(
            "CAST(round(p_retailprice * 100) AS BIGINT) DIV 100"
        ).alias("bkt"),
    )
    probe = p.select(
        "pk", "price_c",
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("bkt"),
    )
    build = p.select(
        F.col("pk").alias("bpk"), F.col("price_c").alias("bprice"), "bkt"
    )
    pairs = (
        probe.join(build, "bkt")
        .filter(
            (F.col("bpk") != F.col("pk"))
            & (F.abs(F.col("price_c") - F.col("bprice")) <= 100)
        )
        .groupBy(F.col("pk").alias("apk"))
        .agg(F.count(F.lit(1)).alias("n_comp"))
    )
    per_part = p.join(pairs, p.pk == pairs.apk, "left").select(
        p.pk, F.coalesce("n_comp", F.lit(0)).alias("n_comparable")
    )
    return per_part.groupBy(
        F.col("n_comparable").cast("bigint").alias("n_comparable")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
