"""Round-9 batch m: phonetic blocking for entity resolution and an
HNSW index build plan.

``rel_soundex_blocking`` — a Soundex-variant phonetic blocking census
over part nouns: the classic record-linkage move when join keys are
misspellable words rather than digits (`rel_entity_resolution` blocks
on digit substrings — that only works for structured IDs).  Emits per
blocking key the bucket size and the candidate-pair count n·(n−1)/2 —
the numbers that decide whether a blocking scheme makes the verify
stage tractable (Σ pairs ≪ N²/2) before anyone runs it.

Soundex variant (documented, identical text in both engines): keep the
first letter; map every letter to its Soundex digit class
(bfpv→1 cgjkqsxz→2 dt→3 l→4 mn→5 r→6, vowels/h/w/y→0); collapse
adjacent duplicate digits (vowel zeros BREAK runs, the classic rule;
the h/w non-separator refinement is intentionally dropped); remove
zeros; drop the leading digit when the first letter is a consonant
(it is the first letter's own run); pad/truncate to letter + 3 digits.

``emb_hnsw_level_plan`` — the capacity-planning census for an HNSW
graph build over the embeddings table: each vector draws its maximum
layer from the md5-geometric distribution (P(level ≥ ℓ) = 16^−ℓ, the
1/ln(M) rule with M = 16 in integer form — level = #low zero nibbles
of an md5 coin), and the plan emits per layer the resident node count,
the per-node edge budget (2M at the base layer, M above), the edge-slot
total and adjacency bytes — the memory line items that size an ANN
serving fleet BEFORE the expensive build.  Complements `emb_shard_plan`
(which plans shards, not graph layers).

Determinism: Soundex is pure string functions (translate/replace/
substr) written identically on both sides; levels are md5-coin modular
arithmetic (the r8g idiom); every emitted number is a BIGINT count or
product.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import t
from .registry import register

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230120022455012623010202"


def _soundex_sql(word: str) -> str:
    """Soundex-variant key of ``word`` — IDENTICAL text in Spark SQL and
    DuckDB (upper/translate/replace/substr/CASE are shared)."""
    m = f"translate(upper({word}), '{_ALPHA}', '{_CODES}')"
    # collapse adjacent duplicate digits: 4 pair-collapse rounds handle
    # runs up to 16 (part-name words are <= ~12 chars)
    c = m
    for _ in range(4):
        for d in "123456":
            c = f"replace({c}, '{d}{d}', '{d}')"
    z = f"replace({c}, '0', '')"
    r = (
        f"CASE WHEN substr({m}, 1, 1) = '0' THEN {z} "
        f"ELSE substr({z}, 2) END"
    )
    return f"substr(upper({word}), 1, 1) || substr({r} || '000', 1, 3)"


_NOUN = "split_part(p_name, ' ', 2)"


@register(
    "rel_soundex_blocking",
    oracle=f"""
    WITH k AS (
      SELECT p_partkey, p_name,
             {_NOUN} AS noun,
             {_soundex_sql(_NOUN)} AS blk
      FROM part)
    SELECT blk,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT p_name) AS BIGINT) AS n_names,
           CAST(count(DISTINCT noun) AS BIGINT) AS n_nouns,
           CAST((count(*) * (count(*) - 1)) // 2 AS BIGINT) AS cand_pairs
    FROM k GROUP BY blk
    """,
    description=(
        "phonetic blocking census for entity resolution: every part's "
        "noun word maps to a Soundex-variant key (first letter + "
        "digit classes, vowel-broken runs collapsed, zero-stripped, "
        "padded to 4 — pure translate/replace/substr chains written "
        "IDENTICALLY in both engines), and the census emits per key "
        "the bucket size, distinct names/nouns absorbed, and the "
        "candidate-pair count n(n−1)/2 the verify stage would face — "
        "the blocking-efficiency readout (Σ pairs ≪ N²/2) that "
        "gates a linkage run. Shape: map-side key expression + ONE "
        "hash aggregate; at 100 TB the same census is the cheap "
        "pre-flight before any pairwise verify"
    ),
    tags=("relational", "dedup", "text"),
)
def rel_soundex_blocking(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    k = p.select(
        F.expr(_NOUN).alias("noun"),
        "p_name",
        F.expr(_soundex_sql(_NOUN)).alias("blk"),
    )
    n = F.count(F.lit(1))
    return k.groupBy("blk").agg(
        n.cast("bigint").alias("n_parts"),
        F.countDistinct("p_name").cast("bigint").alias("n_names"),
        F.countDistinct("noun").cast("bigint").alias("n_nouns"),
        F.expr("(count(1) * (count(1) - 1)) DIV 2")
        .cast("bigint")
        .alias("cand_pairs"),
    )


#: HNSW plan constants: branching M (P(level≥ℓ) = M^−ℓ with M = 16 via
#: low zero nibbles), per-node edge budgets, int32 neighbor ids.
_M_BASE = 32  # 2M at layer 0
_M_UPPER = 16  # M above
_ID_BYTES = 4


@register(
    "emb_hnsw_level_plan",
    oracle=f"""
    WITH h AS (
      SELECT vec_id,
             CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)
                                         || ':hnsw'), 1, 4))
                  AS BIGINT) AS coin
      FROM embeddings),
    lvl AS (
      SELECT vec_id,
             (CASE WHEN coin % 16 = 0 THEN 1 ELSE 0 END
            + CASE WHEN coin % 256 = 0 THEN 1 ELSE 0 END
            + CASE WHEN coin % 4096 = 0 THEN 1 ELSE 0 END
            + CASE WHEN coin % 65536 = 0 THEN 1 ELSE 0 END) AS level
      FROM h),
    census AS (
      SELECT level, CAST(count(*) AS BIGINT) AS n_at_level
      FROM lvl GROUP BY level),
    plan AS (
      SELECT level, n_at_level,
             CAST(sum(n_at_level) OVER (ORDER BY level DESC
                                        ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS n_in_layer
      FROM census)
    SELECT CAST(level AS BIGINT) AS level, n_at_level, n_in_layer,
           CAST(CASE WHEN level = 0 THEN {_M_BASE}
                     ELSE {_M_UPPER} END AS BIGINT) AS edge_budget,
           CAST(n_in_layer * CASE WHEN level = 0 THEN {_M_BASE}
                                  ELSE {_M_UPPER} END AS BIGINT)
             AS edge_slots,
           CAST(n_in_layer * CASE WHEN level = 0 THEN {_M_BASE}
                                  ELSE {_M_UPPER} END * {_ID_BYTES}
                AS BIGINT) AS adj_bytes
    FROM plan
    """,
    description=(
        "HNSW build capacity plan over the embeddings table: each "
        "vector draws its max layer from the md5-geometric law "
        "(level = #low zero nibbles of a 16-bit md5 coin ⇒ "
        "P(level ≥ ℓ) = 16^−ℓ, the integer form of the 1/ln(M) rule), "
        "then per LAYER the plan emits resident nodes (top-down "
        "cumulative census), the edge budget (2M = 32 at layer 0, "
        "M = 16 above), edge slots, and int32 adjacency bytes — the "
        "memory line items that size an ANN serving fleet before the "
        "O(N·M·log N) build is paid. Shape: map-side coin + one "
        "≤5-row level census + a window over that census; the census "
        "is mergeable at any scale"
    ),
    tags=("embeddings", "ann", "ops"),
)
def emb_hnsw_level_plan(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    coin = F.conv(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":hnsw"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    lvl = e.select(
        sum(
            [
                F.when(coin % m == 0, 1).otherwise(0)
                for m in (16, 256, 4096, 65536)
            ],
            F.lit(0),
        ).alias("level")
    )
    census = lvl.groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at_level")
    )
    w = (
        Window.orderBy(F.col("level").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budget = F.when(F.col("level") == 0, _M_BASE).otherwise(_M_UPPER)
    return census.select(
        F.col("level").cast("bigint").alias("level"),
        "n_at_level",
        F.sum("n_at_level").over(w).cast("bigint").alias("n_in_layer"),
    ).select(
        "level",
        "n_at_level",
        "n_in_layer",
        budget.cast("bigint").alias("edge_budget"),
        (F.col("n_in_layer") * budget).cast("bigint").alias("edge_slots"),
        (F.col("n_in_layer") * budget * _ID_BYTES)
        .cast("bigint")
        .alias("adj_bytes"),
    )
