"""Document deduplication operators for large-scale training-data
pipelines (engine extension beyond the reference surface; BASELINE.json
north-star).

All variants are expression/shuffle compositions — no Python in the hot
path except where noted. Scale notes per operator:

- exact:   one hash shuffle on the digest; identical to a groupBy.
- minhash: explode to shingles (map-side), per-doc signature agg (one
  shuffle on doc_id), band-bucket self-join (shuffle on band key).
  Bucket sizes are bounded by band width; skewed buckets (boilerplate
  shingle sets) are handled by AQE skew-join.
- simhash: same shape as minhash without the self-join (signature only);
  near-dup candidates = equal signature prefix buckets.
- ngram-jaccard: exact verification on candidate pairs only — never run
  it all-pairs at scale; feed it from the LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup on an md5 digest of (optionally whitespace-normalized,
    lowercased) text; keeps the lowest id per digest."""
    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    digest = F.md5(t)
    w = Window.partitionBy("_digest").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_digest", digest)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_digest")
    )


# ------------------------------------------------------------- shingles


def _tokens(text_col: str) -> F.Column:
    return F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")


def shingle_array(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct n-token shingles of a document as an array column —
    entirely map-side (no shuffle). Docs with < n tokens → empty array."""
    toks = _tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh)


def shingles(df: DataFrame, text_col: str = "text", n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """→ (id, shingle) pairs, distinct within each doc (via map-side
    array_distinct — no dedup shuffle needed)."""
    return df.select(
        F.col(id_col), F.explode(shingle_array(text_col, n)).alias("shingle")
    )


# -------------------------------------------------------------- minhash

#: Universal-hash seeds (a_k, b_k): h_k = (a_k*h + b_k) mod MINHASH_P over a
#: 32-bit base hash h. One md5 per shingle total, k variants by arithmetic —
#: ~k× less hashing than k independent digests, same engine portability
#: (the DuckDB oracle runs the identical formula).
MINHASH_SEEDS = [
    (1000003, 12345),
    (1000033, 54321),
    (1000037, 98765),
    (1000039, 56789),
    (1000081, 13579),
    (1000099, 97531),
    (1000117, 24680),
    (1000121, 86420),
]
MINHASH_P = 4294967311  # smallest prime > 2^32


def _base_hash(col: F.Column) -> F.Column:
    """Engine-portable 32-bit hash: first 8 hex chars of md5 as a long.
    DuckDB equivalent: CAST('0x' || substring(md5(x),1,8) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _uhash(h: F.Column, k: int) -> F.Column:
    a, b = MINHASH_SEEDS[k]
    return (F.lit(a).cast("long") * h + F.lit(b)) % F.lit(MINHASH_P)


def minhash_signatures(
    sh: DataFrame,
    num_hashes: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc from exploded (id, shingle) pairs: for
    hash k, min over shingles of (a_k*md5_32(shingle)+b_k) mod P.

    Shape: one hash aggregate on doc_id computing all ``num_hashes``
    mins in a single pass (map-side partial aggregation keeps the
    shuffle tiny: num_hashes longs per doc per mapper).
    """
    hashed = sh.select(F.col(id_col), _base_hash(F.col("shingle")).alias("_h"))
    aggs = [
        F.min(_uhash(F.col("_h"), k)).alias(f"mh{k}") for k in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_signatures_mapside(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Zero-shuffle MinHash: signatures computed per row from the shingle
    ARRAY — the scan is the only stage. Identical output to
    :func:`minhash_signatures`; preferred at scale (the explode+groupBy
    form shuffles |shingles| rows, this shuffles nothing).

    The base-hash array is materialized in its own projection so the one
    md5-per-shingle is computed once, not once per signature column
    (CollapseProject keeps the split: 8 uses of a non-cheap expr)."""
    hashed = df.select(
        F.col(id_col),
        F.transform(shingle_array(text_col, n), _base_hash).alias("_harr"),
    )
    cols = [
        F.array_min(F.transform(F.col("_harr"), lambda h: _uhash(h, k))).alias(
            f"mh{k}"
        )
        for k in range(num_hashes)
    ]
    return hashed.select(F.col(id_col), *cols)


def lsh_bands(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each signature into its (band, bkey) rows — the frame
    both the candidate self-join and the cost model read. Each band
    key is the concat of its rows' minhashes."""
    return signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band the signature, self-join per band bucket → candidate pairs
    (a < b). Each band key is the concat of its rows' minhashes.

    The signatures feed BOTH sides of the self-join; the repartition
    below materializes them in one exchange that Spark reuses
    (ReusedExchange), so the expensive minhash computation runs once,
    not twice."""
    banded = lsh_bands(
        signatures.repartition(id_col), bands, rows_per_band, id_col
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


# ------------------------------------------------------ ngram jaccard


#: All-pairs mode refuses to run when any shingle's posting list exceeds
#: this (the self-join fan-out is sum over shingles of |postings|²; one
#: boilerplate shingle shared by 10^5 docs would emit 10^10 pairs).
MAX_POSTING_LIST = 10_000


def jaccard_pairs(
    sh: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    threshold: float = 0.0,
    max_posting_list: int = MAX_POSTING_LIST,
) -> DataFrame:
    """n-gram Jaccard similarity per pair.

    With ``pairs`` given (candidate set, e.g. from LSH), verifies only
    those — the scale path. Without, all-pairs via shingle co-occurrence:
    join shingle lists on equality (inverted-index join, NOT a cross
    join), count common shingles, |A∪B| = |A|+|B|-common. All-pairs mode
    is oracle/small-corpus only and GUARDED: if any shingle occurs in
    more than ``max_posting_list`` docs the join fan-out is quadratic in
    that count, and this raises instead of melting the cluster — feed an
    LSH candidate set via ``pairs`` instead (pass ``None`` to skip the
    guard's extra aggregate when pairs are supplied: it already is).

    The join key is ``xxhash64(shingle)`` — equality classes are the
    same (64-bit, negligible collision odds) and the shuffle moves 8-byte
    keys instead of shingle strings. The shingle frame is cached: it
    feeds the sizes aggregate and both join sides.
    """
    sh = sh.withColumn("_shash", F.xxhash64("shingle")).persist()
    if pairs is None and max_posting_list is not None:
        hot = (
            sh.groupBy("_shash")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .first()["mx"]
        )
        if hot is not None and hot > max_posting_list:
            sh.unpersist()
            raise ValueError(
                f"all-pairs jaccard refused: a shingle occurs in {hot} docs "
                f"(> {max_posting_list}); the self-join would fan out "
                f"quadratically. Pass an LSH candidate set via pairs=."
            )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    common = (
        a.join(
            b,
            (F.col("sa._shash") == F.col("sb._shash"))
            & (F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")),
        )
        .groupBy(
            F.col(f"sa.{id_col}").alias("id_a"), F.col(f"sb.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if pairs is not None:
        common = common.join(pairs, on=["id_a", "id_b"], how="inner")
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


# ------------------------------------------------- dedup clustering (CC)


def dedup_clusters(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup candidate pairs → cluster id =
    min doc id in the component (the canonical survivor). The iterative
    step LSH/Jaccard feed into: pairs only say "these two are similar";
    clustering turns that into dedup groups.

    Iterative min-label propagation WITH one pointer-jump per round:
    each round every node takes the min label among itself and its
    neighbors (one equi-join + min-agg), then labels are compressed one
    hop — ``label = label(label)`` via a self-join — valid because
    labels only ever decrease, so ``label(label(x)) ≤ label(x)`` stays
    inside the component. The single jump is a constant-factor round
    reduction (labels move ~3 hops/round on chains instead of 1), NOT
    asymptotic: long-diameter graphs still need O(diameter/3) rounds
    (measured: 10 rounds on the chain-like embedding graph at sf0.1).
    Use this for the shallow star/clique graphs text near-dup
    produces; use :func:`dedup_clusters_star` (O(log n) rounds,
    measured 4 on the same graph) when components can be long chains.

    Scale shape per round: two equi-joins + one min-agg, all shuffling
    on node id, AQE-coalesced. Labels are checkpointed every round
    (localCheckpoint) so the plan does not grow with iteration count;
    convergence is detected via the label sum, which strictly decreases
    until fixpoint (labels only ever decrease). Fixpoint output is
    iteration-order independent → deterministic.
    """
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        # localCheckpoint, NOT persist: persist caches the DATA but
        # keeps the full candidate-generation lineage (LSH chain) in
        # the LOGICAL plan, so every round's three edge joins re-embed
        # and re-analyze that whole tree — measured ~0.6 s/round of
        # pure plan-building at sf0.1 (r13). The checkpoint truncates
        # the plan to an RDD scan (and locally persists the RDD, same
        # data reuse as persist); lazy, so the round-1 convergence
        # action materializes it — no extra pre-loop job.
        # TRADE (§5): localCheckpoint blocks live in EXECUTOR storage —
        # on a cluster with executor loss / dynamic allocation the
        # truncated lineage is unrecoverable and the job fails; use
        # reliable checkpoint() to a checkpoint dir there. Cleanup
        # relies on ContextCleaner GC (fine for short-lived sessions).
        .localCheckpoint(eager=False)
    )
    # iterate ONLY over edge-touched nodes: an isolated node's label is
    # itself by definition and can never change, so it has no business
    # inside the loop. Under LSH-candidate sparsity touched ≪ corpus
    # (near-dups are the exception, not the rule), which turns each
    # round's joins from |corpus|-sized to |touched|-sized — at 100 TB
    # this is the difference between iterating over the corpus 10×
    # and iterating over a few percent of it. Isolated nodes rejoin as
    # their own singleton cluster at the end (one left join, outside
    # the loop).
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        # lazy: round 0's convergence action materializes it — no
        # pre-loop job just to snapshot the (trivially known) identity
        # labeling; prev_sum starts unknown and round 0 always runs
        .localCheckpoint(eager=False)
    )
    prev_sum = None
    for _ in range(max_iter):
        # min over the CLOSED neighborhood in ONE aggregate: neighbor
        # labels (edges⋈labels) unioned with each node's own label row,
        # then a single min-agg — replaces the old groupBy + left-join
        # (min over neighbors, then least(own, nbr)), which cost one
        # extra shuffle of |touched| rows per round (guide §2.4). Same
        # update rule: min(own ∪ neighbors) ≡ least(own, min(neighbors)).
        nbr_rows = edges.join(labels, edges.dst == labels.node).select(
            "src", "label"
        )
        own_rows = labels.select(F.col("node").alias("src"), "label")
        stepped = (
            nbr_rows.unionByName(own_rows)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .select(F.col("src").alias("node"), "label")
        )
        # pointer jumping: follow the label's own label (labels only
        # decrease, so this stays within the component and can only
        # tighten toward the component minimum)
        l2 = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        labels = (
            stepped.join(l2, stepped.label == l2.pnode, "left")
            .select(
                "node",
                F.coalesce("plabel", "label").alias("label"),
            )
            # lazy checkpoint: the convergence-sum action right below
            # materializes it, so each round costs ONE job, not two
            # (eager checkpoint + sum) — measured ~0.3 s/round of fixed
            # job overhead saved locally; the cut lineage is identical
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("label")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    # (checkpointed edge RDD blocks are reclaimed by the ContextCleaner
    # when the frame goes out of scope — same lifecycle as the per-round
    # label checkpoints; there is no cache entry to unpersist)
    return (
        nodes.select(F.col(id_col))
        .join(labels, nodes[id_col] == labels.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id"),
        )
    )


# --------------------------------------------------------------- simhash


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash signature per doc from token md5 bits.

    bit j of the signature = majority vote of bit j across token hashes
    (each token's md5 first 4 bytes, engine-portable). Implemented as
    explode(tokens) × explode(bit positions) → conditional sum → bit
    reassembly; two narrow shuffles on doc_id.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(_tokens(text_col))).alias("tok")
    ).filter(F.length("tok") > 0)
    # token hash: first 8 hex chars of md5 → 32-bit int (conv base 16)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    bitted = toks.withColumn("h", h).select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"), "h"
    )
    votes = bitted.withColumn(
        "vote",
        F.when(F.expr("shiftright(h, bit)").bitwiseAND(1) == 1, 1).otherwise(-1),
    ).groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    sig = votes.withColumn(
        "bitval",
        F.when(F.col("v") > 0, F.pow(2, F.col("bit")).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
    ).groupBy(id_col).agg(F.sum("bitval").alias("simhash"))
    return sig


def dedup_clusters_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round algorithm for graphs whose components may have
    LONG diameter (e.g. embedding near-dup graphs, where bucket
    subgraphs are tree-like chains; min-label propagation needs
    O(diameter) rounds there, measured 10 rounds vs 4 for this).

    large-star: every node connects its strictly-larger neighbors to
    the minimum of its closed neighborhood; small-star does the same
    for smaller-or-equal neighbors. Both are one groupBy + one
    broadcast-free equi-join per pass over the EDGE set (which shrinks
    toward stars), not the node set. Convergence = edge multiset stable
    (checked via an order-insensitive hash sum). Output: node →
    component minimum, identical to :func:`dedup_clusters`.
    """
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).filter(
        F.col("u") != F.col("v")
    )
    # lazy: the baseline _sig action right below materializes it —
    # one job instead of two before the loop starts
    edges = e.distinct().localCheckpoint(eager=False)

    def _sig(df: DataFrame) -> int:
        # order-insensitive edge-set signature (canonical orientation)
        a = F.least("u", "v")
        b = F.greatest("u", "v")
        return (
            df.select(F.xxhash64(a, b).cast("decimal(38,0)").alias("h"))
            .agg(F.sum("h"))
            .first()[0]
            or 0
        )

    def _large_star(ed: DataFrame) -> DataFrame:
        adj = ed.unionByName(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = adj.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("mn", F.col("u")).alias("mn"))
        j = adj.join(m, "u")
        return (
            j.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # orient every edge from its larger endpoint
        o = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = o.groupBy("u").agg(F.min("v").alias("mn"))
        j = o.join(m, "u")
        out = j.select(F.col("v").alias("u"), F.col("mn").alias("v")).unionByName(
            m.select("u", F.col("mn").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    prev = _sig(edges)
    for _ in range(max_iter):
        # lazy checkpoint — materialized by the _sig action (one job
        # per round instead of two), lineage cut is identical
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur = _sig(edges)
        if cur == prev:
            break
        prev = cur

    # post-convergence the edge set is a union of stars oriented
    # (member -> center); attach centers/singletons to themselves
    members = edges.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return (
        nodes.select(F.col(id_col).alias("u"))
        .join(members, "u", "left")
        .select(
            F.col("u").alias(id_col),
            F.coalesce("cluster_id", F.col("u")).alias("cluster_id"),
        )
    )
