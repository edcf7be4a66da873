"""Round-6 continuation (batch q): exact Shapley channel attribution.

With a FIXED channel set (k=4 here) the Shapley value is a finite sum
with factorial-rational weights over 2^k coalitions — every weight has
the common denominator k! = 24, so the whole computation stays in
integer 24ths: no sampling, no float accumulation, and the efficiency
axiom Σφᵢ = v(N) − v(∅) holds EXACTLY (property-gated).  The data
side is one fact pass to a 2^k-row mask histogram; everything after is
constant-size coalition algebra.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from .common import keyed_events
from .registry import register

#: touchpoint channels (bit order) — conversion is 'purchase'.
_CHANNELS = ["click", "view", "signup", "error"]

#: Shapley weight NUMERATORS over denominator 4! = 24, by |S|.
_W24 = {0: 6, 1: 2, 2: 2, 3: 6}

#: all (channel index, coalition-without-i mask) terms, precomputed.
_TERMS = [
    (i, sum(1 << j for j in s))
    for i in range(4)
    for size in range(4)
    for s in combinations([j for j in range(4) if j != i], size)
]

_MASK_CASE_SQL = (
    "CASE WHEN event_type = 'click' THEN 1 "
    "WHEN event_type = 'view' THEN 2 "
    "WHEN event_type = 'signup' THEN 4 "
    "WHEN event_type = 'error' THEN 8 ELSE 0 END"
)

_TERMS_SQL = ",\n      ".join(
    f"({i}, {s}, {_W24[bin(s).count('1')]})" for i, s in _TERMS
)


@register(
    "evt_shapley_attribution",
    oracle=rf"""
    WITH touch AS (
      SELECT user_id,
             bit_or({_MASK_CASE_SQL}) AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id),
    hist AS (
      SELECT mask, CAST(sum(converted) AS BIGINT) AS conv
      FROM touch GROUP BY mask),
    terms(i, s, w) AS (VALUES
      {_TERMS_SQL}),
    vals AS (
      SELECT t.i, t.s, t.w,
             coalesce(sum(CASE WHEN (h.mask & t.s) = h.mask
                               THEN h.conv ELSE 0 END), 0) AS v_s,
             coalesce(sum(CASE WHEN (h.mask & (t.s | (1 << t.i)))
                                    = h.mask
                               THEN h.conv ELSE 0 END), 0) AS v_si
      FROM terms t LEFT JOIN hist h ON TRUE
      GROUP BY t.i, t.s, t.w),
    phi AS (
      SELECT i,
             CAST(sum(w * (v_si - v_s)) AS BIGINT) AS shapley_24
      FROM vals GROUP BY i)
    SELECT CASE i WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                  WHEN 2 THEN 'signup' ELSE 'error' END AS channel,
           shapley_24,
           CAST(shapley_24 AS DOUBLE) / 24.0 AS shapley
    FROM phi
    """,
    description="exact Shapley channel attribution over the 4-channel "
    "coalition lattice: per-user visited-set bitmask, 16-row coalition "
    "values v(S) by bitwise containment, factorial weights as integer "
    "24ths - no sampling, efficiency axiom holds exactly",
    tags=("events", "attribution", "statistics"),
)
def evt_shapley_attribution(spark, sf_dir):
    """Game-theoretic credit assignment — the third attribution model
    (`evt_attribution` rules, `evt_markov_attribution` removal
    effects, Shapley marginal contributions).

    Each user's journey is the SET of non-purchase channels they
    touched (a 4-bit mask); a coalition's value v(S) counts converted
    users whose entire journey fits inside S.  The Shapley value
    φᵢ = Σ_S |S|!(k−1−|S|)!/k! · (v(S∪i) − v(S)) has 8 terms per
    channel at k=4, with every weight an integer number of 24ths —
    so φ is computed EXACTLY in integer 24ths and the efficiency axiom
    Σφᵢ = v(full) − v(∅) is an integer identity, not an approximation
    (the property gate asserts it).  At larger k the lattice grows
    2^k, which is why production Shapley samples permutations — the
    exact form here is the ground truth such samplers are tested
    against.

    Scale: ONE fact pass to the per-user (mask, converted) frame, one
    16-row mask histogram; the coalition join is 32 literal terms ×
    ≤16 rows — constant work regardless of SF.
    """
    ev = keyed_events(spark, sf_dir)
    mask_bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
        .otherwise(0)
    )
    touch = ev.groupBy("user_id").agg(
        F.bit_or(mask_bit).alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    hist = touch.groupBy("mask").agg(
        F.sum("converted").cast("bigint").alias("conv")
    )
    terms = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(s).alias("s"),
                F.lit(_W24[bin(s).count("1")]).alias("w"),
            )
            for i, s in _TERMS
        ]
    )
    exploded = hist.select(
        "mask", "conv", F.explode(terms).alias("t")
    ).select("mask", "conv", "t.i", "t.s", "t.w")
    in_s = (F.col("mask").bitwiseAND(F.col("s"))) == F.col("mask")
    in_si = F.expr("(mask & (s | shiftleft(1, i))) = mask")
    vals = exploded.groupBy("i", "s", "w").agg(
        F.coalesce(
            F.sum(F.when(in_s, F.col("conv")).otherwise(0)), F.lit(0)
        ).alias("v_s"),
        F.coalesce(
            F.sum(F.when(in_si, F.col("conv")).otherwise(0)), F.lit(0)
        ).alias("v_si"),
    )
    phi = vals.groupBy("i").agg(
        F.sum(F.col("w") * (F.col("v_si") - F.col("v_s")))
        .cast("bigint")
        .alias("shapley_24")
    )
    return phi.select(
        F.when(F.col("i") == 0, "click")
        .when(F.col("i") == 1, "view")
        .when(F.col("i") == 2, "signup")
        .otherwise("error")
        .alias("channel"),
        "shapley_24",
        (F.col("shapley_24").cast("double") / F.lit(24.0)).alias("shapley"),
    )
