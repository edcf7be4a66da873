"""Round-6 continuation (batch e): survival comparison, fair
allocation, and classical test statistics with distribution-safe
determinism.

Two determinism patterns debut here on top of the usual integer-exact
contract (see ``registry``):

- **Ordered left-fold for k-term double sums** (`evt_anova_oneway`):
  ``SUM(double)`` over groups is banned (order-dependent), but folding
  a SORTED ARRAY left-to-right is bit-deterministic in both engines
  (Spark ``aggregate`` HOF == DuckDB ``list_reduce`` on
  ``list_sort``-ed input).
- **Integer variance numerators** (`evt_cronbach_alpha`):
  ``n·Σx² − (Σx)²`` in 38-digit decimals is exact, so sums of
  variances across items stay order-free integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import keyed_events, t
from .registry import register


@register(
    "evt_logrank_table",
    oracle=r"""
    WITH users AS (
      SELECT user_id, user_id % 2 AS arm,
             min(CAST(ts AS DATE)) AS d0,
             max(CAST(ts AS DATE)) AS d_last,
             min(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END)
               AS d_err
      FROM events GROUP BY user_id),
    surv AS (
      SELECT arm,
             CASE WHEN d_err IS NOT NULL
                  THEN date_diff('day', d0, d_err)
                  ELSE date_diff('day', d0, d_last) END AS time,
             (d_err IS NOT NULL) AS died
      FROM users),
    per_day AS (
      SELECT time,
             sum(CASE WHEN arm = 0 AND died THEN 1 ELSE 0 END) AS d1,
             sum(CASE WHEN arm = 1 AND died THEN 1 ELSE 0 END) AS d2,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS x1,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS x2
      FROM surv GROUP BY time),
    risk AS (
      SELECT time, d1, d2,
             sum(x1) OVER (ORDER BY time DESC) AS n1,
             sum(x2) OVER (ORDER BY time DESC) AS n2
      FROM per_day)
    SELECT CAST(time AS BIGINT) AS t_day,
           CAST(n1 AS BIGINT) AS at_risk_1,
           CAST(n2 AS BIGINT) AS at_risk_2,
           CAST(d1 AS BIGINT) AS deaths_1,
           CAST(d2 AS BIGINT) AS deaths_2
    FROM risk WHERE d1 + d2 > 0
    """,
    description="two-sample log-rank life table for time-to-first-error "
    "per user: per event time, the exact (at-risk, deaths) integer "
    "counts for both arms (user_id parity) - the complete sufficient "
    "statistics of the log-rank test; O-E and hypergeometric variance "
    "are per-row rationals left to the consumer, mirroring "
    "evt_km_retention's artifact design",
    tags=("events", "statistics", "retention"),
)
def evt_logrank_table(spark, sf_dir):
    """Two-cohort survival comparison (the reliability A/B primitive).

    Extends `evt_km_retention` (one-cohort life table) to the
    TWO-sample setting the log-rank test needs: at each event time t,
    the 2×2 table (at-risk, deaths) per arm.  The test statistic
    Σ(O₁−E₁) / sqrt(ΣV) is a sum of per-time rationals whose exact
    integer components this table carries — summing them as floats is
    order-dependent across engines, so the distributed artifact is the
    table (the same principled cut as the KM life table's deliberate
    non-multiplication; the property test assembles the z in Python).

    The endpoint is days from a user's first event to their FIRST
    `error` event (death), right-censored at their last active day if
    they never error; arms split on user-key parity so the expected
    difference is null — the table IS the A/A calibration check.

    Scale: one user-grain agg of the fact table, then time-grain
    conditional sums and two reverse-cumulative windows over the
    ≤|distinct times| frame (calendar-bounded).
    """
    ev = keyed_events(spark, sf_dir)
    users = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d_last"),
        F.min(
            F.when(F.col("event_type") == "error", F.to_date("ts"))
        ).alias("d_err"),
    )
    surv = users.select(
        (F.col("user_id") % 2).alias("arm"),
        F.when(
            F.col("d_err").isNotNull(), F.datediff("d_err", "d0")
        )
        .otherwise(F.datediff("d_last", "d0"))
        .alias("time"),
        F.col("d_err").isNotNull().alias("died"),
    )
    per_day = surv.groupBy("time").agg(
        F.sum(F.when((F.col("arm") == 0) & F.col("died"), 1).otherwise(0))
        .alias("d1"),
        F.sum(F.when((F.col("arm") == 1) & F.col("died"), 1).otherwise(0))
        .alias("d2"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("x1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("x2"),
    )
    wdesc = Window.orderBy(F.desc("time")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_day.select(
        "time", "d1", "d2",
        F.sum("x1").over(wdesc).alias("n1"),
        F.sum("x2").over(wdesc).alias("n2"),
    )
    return risk.filter(F.col("d1") + F.col("d2") > 0).select(
        F.col("time").cast("bigint").alias("t_day"),
        F.col("n1").cast("bigint").alias("at_risk_1"),
        F.col("n2").cast("bigint").alias("at_risk_2"),
        F.col("d1").cast("bigint").alias("deaths_1"),
        F.col("d2").cast("bigint").alias("deaths_2"),
    )


@register(
    "rel_waterfill_allocation",
    oracle=r"""
    WITH dem AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS d
      FROM lineitem GROUP BY l_partkey),
    w AS (
      SELECT pk, d,
             row_number() OVER (ORDER BY d, pk) AS r,
             sum(d) OVER (ORDER BY d, pk
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS p
      FROM dem),
    w2 AS (
      SELECT d, r, p,
             count(*) OVER () AS n_all,
             max(p) OVER () // 2 AS cap_all,
             ((p - d) + d * (count(*) OVER () - r + 1)
               <= max(p) OVER () // 2) AS feasible
      FROM w),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(max(p) AS BIGINT) AS total_demand,
             CAST(max(cap_all) AS BIGINT) AS cap,
             CAST(coalesce(max(CASE WHEN feasible THEN r END), 0)
                  AS BIGINT) AS k_full,
             CAST(coalesce(max(CASE WHEN feasible THEN p END), 0)
                  AS BIGINT) AS p_full
      FROM w2)
    SELECT n AS n_parts, total_demand, cap,
           k_full AS n_full,
           n - k_full AS n_rationed,
           CASE WHEN k_full < n THEN (cap - p_full) // (n - k_full)
                ELSE 0 END AS level,
           CASE WHEN k_full < n THEN (cap - p_full) % (n - k_full)
                ELSE 0 END AS remainder,
           CASE WHEN k_full < n THEN cap ELSE total_demand END
             AS total_allocated
    FROM s
    """,
    description="max-min fair (water-filling) allocation of half the "
    "total demand across parts: sorted prefix sums find the largest "
    "fully-served prefix, integer level + remainder ration the rest - "
    "conservation is exact by construction",
    tags=("relational", "window", "allocation"),
)
def rel_waterfill_allocation(spark, sf_dir):
    """Max-min fair division — the bandwidth/budget rationing rule.

    Allocate capacity C (= half the total demand) across parts so the
    smallest allocations are as large as possible: demands below the
    water level are fully served, the rest are capped at the level.
    With demands sorted ascending and prefix sums P_r, the cost of
    guaranteeing everyone at least d_r is ``P_{r-1} + d_r·(n-r+1)``
    (monotone in r — prefix-closed feasibility), so the fully-served
    prefix k* is one conditional MAX over the sorted frame, and the
    integer level is ``(C - P_k*) DIV (n - k*)`` with the remainder
    spread one unit each to the first `remainder` rationed parts —
    allocation sums to C EXACTLY (no float shares; same conservation
    discipline as `rel_seat_apportionment`).

    Scale: demand is a partkey-grain agg of the fact table; the sort
    is a range-partitioned window over the AGGREGATE frame (|parts|
    rows, not facts).  The feasibility scan, k*, and the level are one
    window + one aggregation — no iteration, though the textbook
    algorithm is a loop over water levels.
    """
    dem = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.round(F.sum(F.round("l_quantity"))).cast("bigint").alias("d"))
    )
    wo = Window.orderBy("d", "pk")
    w = dem.select(
        "pk", "d",
        F.row_number().over(wo).alias("r"),
        F.sum("d")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("p"),
    )
    wall = Window.partitionBy()
    w2 = w.select(
        "d", "r", "p",
        F.count(F.lit(1)).over(wall).alias("n_all"),
        F.expr("max(p) OVER () DIV 2").alias("cap_all"),
    ).withColumn(
        "feasible",
        (F.col("p") - F.col("d"))
        + F.col("d") * (F.col("n_all") - F.col("r") + 1)
        <= F.col("cap_all"),
    )
    s = w2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("p").cast("bigint").alias("total_demand"),
        F.max("cap_all").cast("bigint").alias("cap"),
        F.coalesce(
            F.max(F.when(F.col("feasible"), F.col("r"))), F.lit(0)
        )
        .cast("bigint")
        .alias("k_full"),
        F.coalesce(
            F.max(F.when(F.col("feasible"), F.col("p"))), F.lit(0)
        )
        .cast("bigint")
        .alias("p_full"),
    )
    rationed = F.col("n") - F.col("k_full")
    return s.select(
        F.col("n").alias("n_parts"),
        "total_demand",
        "cap",
        F.col("k_full").alias("n_full"),
        rationed.alias("n_rationed"),
        F.when(rationed > 0, F.expr("(cap - p_full) DIV (n - k_full)"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("level"),
        F.when(rationed > 0, (F.col("cap") - F.col("p_full")) % rationed)
        .otherwise(F.lit(0).cast("bigint"))
        .alias("remainder"),
        F.when(rationed > 0, F.col("cap"))
        .otherwise(F.col("total_demand"))
        .alias("total_allocated"),
    )


@register(
    "evt_anova_oneway",
    oracle=r"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s_g,
             sum(CAST(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT) AS HUGEINT))
               AS q_g
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type),
    fold AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS BIGINT) AS s,
             CAST(sum(q_g) AS HUGEINT) AS q,
             list_reduce(
               list_transform(
                 list_sort(list(struct_pack(et := event_type,
                                            tm := CAST(s_g AS DOUBLE)
                                                  * CAST(s_g AS DOUBLE)
                                                  / CAST(n_g AS DOUBLE)))),
                 x -> x.tm),
               (a, b) -> a + b) AS between_raw
      FROM g),
    ss AS (
      SELECT k, n,
             between_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE) AS ss_between,
             CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                 / CAST(n AS DOUBLE) AS ss_total
      FROM fold)
    SELECT k AS k_groups, n,
           ss_between,
           ss_total - ss_between AS ss_within,
           (ss_between / (CAST(k AS DOUBLE) - 1.0))
             / ((ss_total - ss_between) / (CAST(n AS DOUBLE)
                                           - CAST(k AS DOUBLE))) AS f_stat
    FROM ss
    """,
    description="one-way ANOVA of value by event_type: exact integer "
    "per-group sufficient statistics; the k-term sum of S_g^2/n_g is "
    "a SORTED-ARRAY LEFT FOLD (Spark aggregate HOF == DuckDB "
    "list_reduce) so the double sum is bit-deterministic; F statistic "
    "from identical expression trees",
    tags=("events", "statistics"),
)
def evt_anova_oneway(spark, sf_dir):
    """k-group mean comparison (the welch_ttest's k-ary sibling).

    The sufficient statistics (n_g, Σx, Σx²) are exact integers (Σx²
    in 38-digit decimals / HUGEINT).  The one place a float SUM over
    groups would sneak in — Σ_g S_g²/n_g — is computed as a LEFT FOLD
    over the array of per-group terms sorted by group key: Spark's
    ``aggregate`` higher-order function and DuckDB's ``list_reduce``
    both fold sequentially, so the accumulation order is pinned and
    the result is bit-equal (the contract's usual "identical
    expression tree" extended to an identical REDUCTION tree).  With
    k=5 the array is trivially small; the pattern matters because it
    generalizes to any calendar/category-bounded k.

    Scale: one fact-table aggregation to k rows; everything after is
    single-row math.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("value_c").cast("bigint").alias("s_g"),
        F.sum(
            (F.col("value_c") * F.col("value_c")).cast("decimal(38,0)")
        ).alias("q_g"),
    )
    term = (
        F.col("s_g").cast("double")
        * F.col("s_g").cast("double")
        / F.col("n_g").cast("double")
    )
    fold = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").cast("decimal(38,0)").alias("q"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("event_type").alias("et"),
                            term.alias("tm"),
                        )
                    )
                ),
                lambda x: x["tm"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("between_raw"),
    )
    corr = (
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double")
    )
    ss = fold.select(
        "k", "n",
        (F.col("between_raw") - corr).alias("ss_between"),
        (F.col("q").cast("double") - corr).alias("ss_total"),
    )
    return ss.select(
        F.col("k").alias("k_groups"),
        "n",
        "ss_between",
        (F.col("ss_total") - F.col("ss_between")).alias("ss_within"),
        (
            (F.col("ss_between") / (F.col("k").cast("double") - F.lit(1.0)))
            / (
                (F.col("ss_total") - F.col("ss_between"))
                / (F.col("n").cast("double") - F.col("k").cast("double"))
            )
        ).alias("f_stat"),
    )


@register(
    "evt_cronbach_alpha",
    oracle=r"""
    WITH ux AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x1,
             CAST(sum(CASE WHEN event_type = 'error'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x2,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x3,
             CAST(sum(CASE WHEN event_type = 'signup'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x4,
             CAST(sum(CASE WHEN event_type = 'view'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x5
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
             CAST(sum(x3) AS HUGEINT) AS s3, CAST(sum(x4) AS HUGEINT) AS s4,
             CAST(sum(x5) AS HUGEINT) AS s5,
             sum(CAST(x1 AS HUGEINT) * x1) AS q1,
             sum(CAST(x2 AS HUGEINT) * x2) AS q2,
             sum(CAST(x3 AS HUGEINT) * x3) AS q3,
             sum(CAST(x4 AS HUGEINT) * x4) AS q4,
             sum(CAST(x5 AS HUGEINT) * x5) AS q5,
             CAST(sum(x1 + x2 + x3 + x4 + x5) AS HUGEINT) AS st,
             sum(CAST(x1 + x2 + x3 + x4 + x5 AS HUGEINT)
                 * (x1 + x2 + x3 + x4 + x5)) AS qt
      FROM ux),
    v AS (
      SELECT n,
             (n * q1 - s1 * s1) + (n * q2 - s2 * s2)
               + (n * q3 - s3 * s3) + (n * q4 - s4 * s4)
               + (n * q5 - s5 * s5) AS item_var_num,
             n * qt - st * st AS total_var_num
      FROM m)
    SELECT n AS n_users,
           CAST(5 AS BIGINT) AS k_items,
           CAST(item_var_num AS DOUBLE) AS item_var_num_d,
           CAST(total_var_num AS DOUBLE) AS total_var_num_d,
           (5.0 / 4.0) * (1.0 - CAST(item_var_num AS DOUBLE)
                                / CAST(total_var_num AS DOUBLE)) AS alpha
    FROM v
    """,
    description="Cronbach's alpha over the 5 event-type 'items' scored "
    "per user: variance numerators n*Q - S^2 are exact 38-digit "
    "integers, so the across-item sum is order-free; alpha is one "
    "identical expression tree at the end",
    tags=("events", "statistics"),
)
def evt_cronbach_alpha(spark, sf_dir):
    """Internal-consistency reliability of a k-item 'scale'.

    Each event type is an item; each user's item score is their summed
    value cents for that type (0 when absent — the fixed-k pivot).
    α = k/(k−1)·(1 − Σᵢ Var(itemᵢ)/Var(total)).  Every variance is
    carried as the exact integer numerator ``n·Σx² − (Σx)²`` (decimal
    38 / HUGEINT — the shared ``n²·Var`` scale cancels in the ratio),
    so the sum across items needs NO float accumulation at all —
    the cheaper sibling of `evt_anova_oneway`'s ordered fold, usable
    whenever the k terms share a common denominator.

    Scale: one user-grain pivot aggregation of the fact table (fixed
    k=5 conditional sums), then a single 13-cell aggregation over the
    user frame.  No window, no join.
    """
    ev = keyed_events(spark, sf_dir).filter(F.col("value").isNotNull())
    types = ["click", "error", "purchase", "signup", "view"]
    ux = ev.groupBy("user_id").agg(
        *[
            F.sum(
                F.when(F.col("event_type") == et, F.col("value_c")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias(f"x{i + 1}")
            for i, et in enumerate(types)
        ]
    )
    dec = "decimal(38,0)"
    tot = sum(F.col(f"x{i + 1}") for i in range(5))
    m = ux.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.col(f"x{i + 1}")).cast(dec).alias(f"s{i + 1}")
            for i in range(5)
        ],
        *[
            F.sum(
                (F.col(f"x{i + 1}").cast(dec) * F.col(f"x{i + 1}")).cast(dec)
            ).alias(f"q{i + 1}")
            for i in range(5)
        ],
        F.sum(tot).cast(dec).alias("st"),
        F.sum((tot.cast(dec) * tot).cast(dec)).alias("qt"),
    )
    nd = F.col("n").cast(dec)
    v = m.select(
        "n",
        (
            (nd * F.col("q1") - F.col("s1") * F.col("s1"))
            + (nd * F.col("q2") - F.col("s2") * F.col("s2"))
            + (nd * F.col("q3") - F.col("s3") * F.col("s3"))
            + (nd * F.col("q4") - F.col("s4") * F.col("s4"))
            + (nd * F.col("q5") - F.col("s5") * F.col("s5"))
        ).alias("item_var_num"),
        (nd * F.col("qt") - F.col("st") * F.col("st")).alias(
            "total_var_num"
        ),
    )
    return v.select(
        F.col("n").alias("n_users"),
        F.lit(5).cast("bigint").alias("k_items"),
        F.col("item_var_num").cast("double").alias("item_var_num_d"),
        F.col("total_var_num").cast("double").alias("total_var_num_d"),
        (
            F.lit(5.0)
            / F.lit(4.0)
            * (
                F.lit(1.0)
                - F.col("item_var_num").cast("double")
                / F.col("total_var_num").cast("double")
            )
        ).alias("alpha"),
    )
