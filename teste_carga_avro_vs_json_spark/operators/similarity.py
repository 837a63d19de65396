"""Similarity search over embedding columns (SURVEY.md §2.3).

Two tiers:

- **Brute-force cosine top-k** (baseline, oracle-checked): a
  deterministic query sample broadcast against the corpus; dot products
  as JVM higher-order functions (``zip_with`` + ``aggregate`` —
  sequential left-to-right fold, so DuckDB reproduces the exact IEEE-754
  bits). Correct at any scale where #queries is small: the corpus side
  never shuffles, each task scans its partition once.
- **LSH-bucketed ANN** (the 100 TB path): random-hyperplane signatures
  bucket the corpus; candidates only form within a bucket. Join cost is
  O(rows · buckets_per_row), not O(rows²). Signatures are deterministic
  (hex32-seeded hyperplanes) so results are reproducible; recall vs the
  brute-force baseline is asserted in pytest.

Embeddings are ``array<float>``; both engines cast to double *before*
any arithmetic so products/sums are identical IEEE-754 op sequences.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

# Module-level so pandas_udf type-hint inference can resolve the
# 'pd.Series' string annotations (PEP 563 via `from __future__ import
# annotations` defers them; locals inside the factory are invisible).
import pandas as pd

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql.window import Window


def _dlit(x: float) -> str:
    """Exact SQL double literal: ``repr`` emits the shortest decimal
    that round-trips to the same float64, Java's ``parseDouble`` is
    correctly rounded, and the ``D`` suffix keeps Spark's parser off
    the DECIMAL type — verified bit-exact incl. denormals/-0.0."""
    return repr(float(x)) + "D"


def _lit_mat(mat: list[list[float]]) -> Column:
    """Nested double-array literal via ONE ``F.expr`` parse (r13-opt).
    ``F.lit`` converts element-by-element over py4j — measured 0.97 s
    for a 16×64 centroid matrix vs 4 ms for the parsed form; building
    the old fully unrolled per-element trees was the dominant cost of
    q_ivf_pq_topk (OPTIMIZATION_r13.md #1). Values are bit-identical
    either way, so every k-means/ANN oracle is unchanged."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_dlit(x) for x in row) + ")" for row in mat
        )
        + ")"
    )


def _lit_ints(xs: list[int]) -> Column:
    """int-array literal via one ``F.expr`` parse (see _lit_mat)."""
    return F.expr("array(" + ",".join(str(int(x)) for x in xs) + ")")


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (left-to-right, double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, DEFINED AS 0.0 when either vector has zero
    norm. The naive dot/(|a|·|b|) raises DIVIDE_BY_ZERO under Spark 4's
    default ANSI mode the moment a 100 TB corpus contains one zero
    embedding (r5 ADVICE; the conditional keeps the division in the
    guarded branch, which Spark's If evaluates lazily per row), and the
    0.0 convention is portable: no NaN-vs-NULL ordering divergence
    between Spark, DuckDB, and the numpy fast path."""
    denom = _norm(a) * _norm(b)
    return F.when(denom != 0.0, _dot(a, b) / denom).otherwise(F.lit(0.0))


_DOT_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), 'sum')"
)


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b)


def _cosine_sql(a: str, b: str) -> str:
    # zero-norm convention mirrors :func:`cosine`: CASE keeps DuckDB's
    # IEEE 0/0 -> NaN out of the hash comparison
    denom = f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    return (
        f"(CASE WHEN {denom} = 0 THEN 0.0 "
        f"ELSE {_dot_sql(a, b)} / {denom} END)"
    )


# ------------------------------------------------------ brute-force top-k
def cosine_topk(
    emb: DataFrame, k: int = 10, query_modulus: int = 50
) -> DataFrame:
    """Exact top-k cosine neighbors for the deterministic query sample
    (vec_id % query_modulus == 0), excluding self.

    Plan: tiny query side is broadcast; the corpus scan computes
    #queries dot products per row (pure JVM) and a per-query top-k
    window. The window shuffles only (corpus × queries) score rows,
    and AQE coalesces. Ranking ties break on vec_id for determinism.
    """
    v = emb.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    q = v.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("qvec"), F.col("vec")), 9).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def cosine_topk_sql(
    table: str = "embeddings", k: int = 10, query_modulus: int = 50
) -> str:
    cos = _cosine_sql("q.qvec", "v.vec")
    return f"""
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM {table}
        ),
        q AS (
            SELECT vec_id AS query_id, vec AS qvec FROM v
            WHERE vec_id % {query_modulus} = 0
        ),
        scored AS (
            SELECT q.query_id, v.vec_id, ROUND({cos}, 9) AS cos_sim
            FROM v JOIN q ON v.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id ASC
                   )::INT AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


def cosine_topk_scale(
    emb: DataFrame, k: int = 10, query_modulus: int = 50, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase exact top-k: identical results to :func:`cosine_topk`,
    different reducer shape for the 100 TB corpus.

    The plain version's window funnels EVERY corpus score for a query
    through one reducer — a per-query hot key when the corpus is huge.
    Phase 1 ranks within (query, salt) so each query's scores spread
    over ``salt_buckets`` reducers and only k survivors per bucket move
    on; phase 2 ranks the k x salt_buckets survivors per query — tiny.
    Deterministic salt (xxhash64 of vec_id) keeps results reproducible.
    """
    v = emb.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    q = v.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("qvec"), F.col("vec")), 9).alias("cos_sim"),
        F.pmod(F.xxhash64("vec_id"), F.lit(salt_buckets)).alias("_salt"),
    )
    w1 = Window.partitionBy("query_id", "_salt").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    survivors = (
        scored.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r", "_salt")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def cosine_topk_np(
    emb: DataFrame, k: int = 10, query_modulus: int = 50
) -> DataFrame:
    """Vectorized twin of :func:`cosine_topk`: ALL #queries cosines per
    Arrow batch as ONE numpy matmul — the dense-linear-algebra case
    where the HOF formulation loses badly (it folds 3 × dim
    zip_with/aggregate steps PER (row, query) pair; the matmul does the
    whole batch × query block in BLAS). Same rounding (9 dp), same
    tie-break, same output contract; pytest pins exact result equality
    with the HOF path on the fixture corpus (after 9-dp rounding the
    pairwise-vs-sequential summation difference is far below the
    quantum except knife-edge ties, which the fixture would expose
    deterministically).

    The query block is collected to the driver — bounded by the same
    small-query contract that lets :func:`cosine_topk` broadcast it
    (identical bytes moved; they land in a UDF closure instead of a
    broadcast variable). The corpus never moves: one scan computing
    scores, then the same per-query top-k window.
    """
    import numpy as np

    v = emb.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    qrows = (
        v.filter(F.col("vec_id") % query_modulus == 0).orderBy("vec_id").collect()
    )
    if not qrows:  # empty query sample: same empty frame the HOF path yields
        return v.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", v.schema["vec_id"].dataType),
                    T.StructField("vec_id", v.schema["vec_id"].dataType),
                    T.StructField("cos_sim", T.DoubleType()),
                    T.StructField("rank", T.IntegerType(), nullable=False),
                ]
            ),
        )
    qids = [int(r.vec_id) for r in qrows]
    Q = np.array([r.vec for r in qrows], dtype=np.float64)  # (m, dim)
    # zero-norm -> norm 1 so the zero vector scores 0.0 against
    # everything — the same convention :func:`cosine` and the oracle
    # CASE implement (r5 ADVICE unified all three paths)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = 1.0
    Qn = (Q / qn[:, None]).T  # (dim, m)
    dim = Q.shape[1]

    def _score_mat(M: "np.ndarray") -> "np.ndarray":
        vn = np.linalg.norm(M, axis=1)
        vn[vn == 0.0] = 1.0
        return np.round((M / vn[:, None]) @ Qn, 9)  # (n, m)

    try:
        import pyarrow as pa
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import ArrayType, DoubleType

        @arrow_udf(ArrayType(DoubleType()))
        def _scores(col):
            arr = (
                col.combine_chunks()
                if isinstance(col, pa.ChunkedArray)
                else col
            )
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            s = _score_mat(flat.reshape(len(arr), dim))
            offsets = pa.array(
                np.arange(0, (len(arr) + 1) * len(qids), len(qids), dtype=np.int32)
            )
            return pa.ListArray.from_arrays(offsets, pa.array(s.ravel()))

    except ImportError:  # pragma: no cover - Spark < 4.1 fallback
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def _scores(col: pd.Series) -> pd.Series:
            s = _score_mat(np.vstack(col.to_numpy()))
            return pd.Series(list(map(list, s)))

    # ONE parsed bigint-array literal (r14; the unrolled F.lit form cost
    # ~2 py4j round trips per query id — see _lit_mat). F.lit(int) maps
    # to LongType, so the parsed twin needs the L suffix to match.
    qid_arr = F.expr(
        "array(" + ",".join(f"{int(q)}L" for q in qids) + ")"
    )
    scored = (
        v.select("vec_id", F.posexplode(_scores(F.col("vec"))))
        .withColumnRenamed("col", "cos_sim")
        .withColumn("query_id", F.element_at(qid_arr, F.col("pos") + 1))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


# ------------------------------------------------------ embedding near-dup
def embedding_neardup(
    emb: DataFrame, threshold: float = 0.3, modulus: int = 10
) -> DataFrame:
    """Near-duplicate pairs by cosine over a deterministic sample
    (oracle fixture; the production path is :func:`lsh_ann` buckets +
    this verification on candidates only)."""
    v = emb.filter(F.col("vec_id") % modulus == 0).select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 9).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_neardup_sql(
    table: str = "embeddings", threshold: float = 0.3, modulus: int = 10
) -> str:
    cos = _cosine_sql("a.va", "b.vb")
    return f"""
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM {table}
            WHERE vec_id % {modulus} = 0
        ),
        a AS (SELECT vec_id AS vec_a, vec AS va FROM v),
        b AS (SELECT vec_id AS vec_b, vec AS vb FROM v),
        pairs AS (
            SELECT vec_a, vec_b, ROUND({cos}, 9) AS cos_sim
            FROM a JOIN b ON vec_a < vec_b
        )
        SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
    """


# ----------------------------------------------------------- IVF ANN path
def assign_np(
    v: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "vec",
    out_col: str = "cluster",
) -> DataFrame:
    """Vectorized centroid assignment, BIT-IDENTICAL to
    ``withColumn(out_col, _nearest(vec, centroids))``.

    The expression form evaluates an interpreted HOF fold per (row,
    centroid) — O(n·k·d) interpreter steps, which dies as the centroid
    count grows with the corpus (measured: 100 s for 60k vecs × 60
    centroids at 30× stress, vs ~1 s here). This twin computes the same
    distances in numpy with the SAME IEEE-754 result: per-dim squared
    differences accumulated by ``cumsum`` along the dim axis — cumsum
    is exactly the fold's left-to-right add order (and 0.0 + x0 == x0),
    so every distance is bit-equal to the expression fold's, and
    ``argmin`` picks the first minimum exactly like ``array_min`` over
    (dist, idx) structs. That bit-identity is what lets the Lloyd loop
    and the scale paths use this while the DuckDB oracles keep
    replaying the expression semantics (pytest pins the equality).

    Batches are chunked so the (chunk × k × d) intermediate stays
    ~tens of MB regardless of Arrow batch size."""
    import numpy as np

    if not centroids:
        raise ValueError("assign_np requires at least one centroid")
    C = np.asarray([c for _, c in centroids], dtype=np.float64)
    idxs = np.asarray([i for i, _ in centroids], dtype=np.int64)

    @F.pandas_udf(T.IntegerType())
    def nearest(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        chunk = max(1, 32 * 1024 * 1024 // max(1, C.shape[0] * C.shape[1] * 8))
        for batch in batches:
            vals = batch.to_numpy()
            # Pre-fill with the first centroid id so zero-dim embedding
            # chunks (M.size == 0 below) get a defined assignment instead
            # of uninitialized memory.
            out = np.full(len(vals), idxs[0] if len(idxs) else -1, dtype=np.int32)
            for lo in range(0, len(vals), chunk):
                M = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in vals[lo : lo + chunk]]
                )
                if M.size == 0:
                    continue
                diffs = (M[:, None, :] - C[None, :, :]) ** 2
                dists = diffs.cumsum(axis=2)[:, :, -1]
                out[lo : lo + chunk] = idxs[dists.argmin(axis=1)]
            yield pd.Series(out)

    return v.withColumn(out_col, nearest(F.col(vec_col)))


#: Init oversampling: the k-means seeds are the first ``n_centroids``
#: DISTINCT vectors among the ``INIT_OVERSAMPLE × n_centroids``
#: lowest-vec_id rows. Plain lowest-ids init collapses on
#: duplicate-heavy corpora (exactly what a dedup operator sees): at 30×
#: replica stress it seeded only 2 distinct positions, every vector
#: landed in 2 mega-clusters, and the per-cluster pair cost went
#: quadratic (measured 100 s → 3 s with dedup'd init).
INIT_OVERSAMPLE = 64


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    vectorized: bool = True,
) -> list[tuple[int, list[float]]]:
    """Coarse quantizer: k-means with deterministic init (the
    ``n_centroids`` lowest vec_ids) and ``iters`` Lloyd steps.

    The iterative part is the textbook Spark k-means shape: assignment
    is evaluated against broadcast centroids (``assign_np`` by default
    — bit-identical to the `_nearest` expression, see its docstring;
    pass ``vectorized=False`` for the pure-expression form); the update
    is ``posexplode`` → groupBy(cluster, dim) — only (n_centroids ×
    dim) tiny rows ever reach the driver per iteration.

    Centroid means are **quantized-exact**: each component is summed as
    ``floor(x·1000 + 0.5)`` longs (an exact integer aggregation, so
    partial-agg order cannot perturb it) and divided back as the fixed
    double sequence ``(s / n) / 1000.0``. That makes the whole k-means
    bit-reproducible across engines — which is what lets
    :func:`ivf_topk_sql` replay it in DuckDB as an unrolled CTE chain
    and oracle-check the ANN output exactly. (Float ``avg`` would be
    partial-order-dependent: same repo determinism rule as the exact
    long-derived metrics in operators/metrics.py.)
    """
    # Persisted for the duration of training (iterations re-read the
    # same frame; unpersisted before returning — see multi_kmeans).
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).persist()
    # Seeds = first n_centroids DISTINCT vectors among the oversampled
    # lowest-id rows (see INIT_OVERSAMPLE). The sample is a
    # TakeOrderedAndProject (per-partition top-k + driver merge, never a
    # global single-partition sort); dedup happens driver-side on the
    # tiny sample. If the corpus is so duplicate-heavy that fewer than
    # n_centroids distinct vectors exist in the sample, k degrades
    # gracefully to what was found.
    sample = (
        v.orderBy("vec_id").limit(INIT_OVERSAMPLE * n_centroids).collect()
    )
    seen: set[tuple[float, ...]] = set()
    centroids: list[tuple[int, list[float]]] = []
    for r in sample:
        key = tuple(r.vec)
        if key not in seen:
            seen.add(key)
            centroids.append((len(centroids), list(r.vec)))
            if len(centroids) == n_centroids:
                break
    # Mean update stays the posexplode -> groupBy(cluster, dim) shape.
    # r8 A/B'd the "one hash agg with 2x dim long-buffer columns"
    # alternative (no explode, n_clusters x 128 longs out instead of
    # rows x dim through the shuffle) and it was 2x SLOWER at sf0.1
    # (ivf min 1.59-1.62 s vs 0.72-0.75 s, interleaved quiet-window
    # runs, bench_runs/r8_ab_centroid_agg.json): 128 aggregate columns
    # exceed spark.sql.codegen.maxFields (100), demoting the whole
    # aggregate out of whole-stage codegen — the explode's extra rows
    # are cheaper than losing codegen. Keep the explode.
    dim = len(centroids[0][1]) if centroids else 0
    for _ in range(iters):
        if vectorized:
            # fused assignment + in-UDF partial sums (r14, shared with
            # multi_kmeans — see _update_sums_np); the expression path
            # below stays the untouched reference this is pinned against
            means = (
                _update_sums_np(v, [(len(centroids), 0, dim)], [centroids])
                .groupBy("cluster", "dim")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
        else:
            assigned = v.withColumn(
                "cluster", _nearest(F.col("vec"), centroids)
            )
            means = (
                assigned.select(
                    "cluster", F.posexplode("vec").alias("dim", "x")
                )
                .groupBy("cluster", "dim")
                .agg(
                    F.sum(
                        F.floor(F.col("x") * 1000 + F.lit(0.5)).cast("long")
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r.cluster, {})[r.dim] = (r.s / r.n) / 1000.0
        centroids = [
            (c, [dims[d] for d in sorted(dims)])
            for c, dims in sorted(by_cluster.items())
        ]
    v.unpersist()
    return centroids


def _scored_structs(
    vec: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """array<struct<dist,idx>> of squared-L2 distances to every
    centroid — the shared body of :func:`_nearest` and the probe
    selection in :func:`ivf_topk`/:func:`ivf_pq_topk`.

    r13-opt: the centroid matrix enters the plan as ONE nested-array
    literal and the per-centroid folds run inside a single zip_with.
    Each element's fold is the same left-to-right IEEE-754 sequence as
    the old per-centroid unrolled expression (values bit-identical;
    every k-means oracle re-swept green), but construction is O(1)
    py4j round trips instead of O(k·d) — building the unrolled trees
    was the dominant cost of q_ivf_pq_topk (9.2 s driver time for the
    8×16-codeword encode alone; OPTIMIZATION_r13.md #1), and the
    compact tree also codegens smaller (task binaries 1.4 MiB → KB)."""
    cmat = _lit_mat([cvec for _, cvec in centroids])
    cidx = _lit_ints([idx for idx, _ in centroids])
    return F.zip_with(
        cmat,
        cidx,
        lambda cv, ix: F.struct(
            F.aggregate(
                F.zip_with(vec, cv, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            ix.alias("idx"),
        ),
    )


def _nearest(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """argmin_c ||vec - c||² as an expression: min over (dist, idx)
    structs — deterministic ties by centroid index."""
    return F.array_min(_scored_structs(vec, centroids))["idx"]


def _assign_multi(
    v: DataFrame,
    resolved: list[tuple[int, int, int]],
    all_cents: list[list[tuple[int, list[float]]]],
    vectorized: bool,
) -> DataFrame:
    """Add ``asg`` (array<int>: one cluster id per space) in ONE pass.
    Each space's assignment is bit-identical to :func:`assign_np` /
    :func:`_nearest` on the sliced frame — same float64 values, same
    per-dim cumsum (= the fold's left-to-right add order), same
    first-min tie-break."""
    if not vectorized:
        cols = []
        for s_idx, (_k, start, length) in enumerate(resolved):
            sub = F.slice(F.col("vec"), start + 1, length)
            cols.append(_nearest(sub, all_cents[s_idx]))
        return v.withColumn("asg", F.array(*cols))

    import numpy as np

    Cs = [
        np.asarray([c for _, c in cents], dtype=np.float64)
        for cents in all_cents
    ]
    idxs = [
        np.asarray([i for i, _ in cents], dtype=np.int64)
        for cents in all_cents
    ]
    slices = [(start, length) for _k, start, length in resolved]
    worst = max(C.shape[0] * max(1, C.shape[1] if C.ndim > 1 else 1) for C in Cs)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest_multi(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        chunk = max(1, 32 * 1024 * 1024 // max(1, worst * 8))
        for batch in batches:
            vals = batch.to_numpy()
            n = len(vals)
            out = np.empty((n, len(Cs)), dtype=np.int32)
            for s in range(len(Cs)):
                out[:, s] = idxs[s][0] if len(idxs[s]) else -1
            for lo in range(0, n, chunk):
                M = np.asarray(
                    [
                        np.asarray(x, dtype=np.float64)
                        for x in vals[lo : lo + chunk]
                    ]
                )
                if M.size == 0:
                    continue
                for s, (start, length) in enumerate(slices):
                    Ms = M[:, start : start + length]
                    diffs = (Ms[:, None, :] - Cs[s][None, :, :]) ** 2
                    dists = diffs.cumsum(axis=2)[:, :, -1]
                    out[lo : lo + chunk, s] = idxs[s][dists.argmin(axis=1)]
            yield pd.Series(list(out))

    return v.withColumn("asg", nearest_multi(F.col("vec")))


def _update_sums_np(
    v: DataFrame,
    resolved: list[tuple[int, int, int]],
    all_cents: list[list[tuple[int, list[float]]]],
) -> DataFrame:
    """Fused Lloyd update (r14): assignment AND per-(space, cluster,
    dim) quantized partial sums in ONE Arrow-batched pass over just the
    ``vec`` column — guide §2.3 (aggregate before you shuffle, in the
    UDF itself) + §4.2 (whole-batch numpy). The explode→groupBy form
    shipped vec+asg back to the JVM and generated n·d·coverage struct
    rows per iteration; this emits at most Σ(kₛ·dsubₛ) partial rows per
    batch and the final groupBy sums exact int64s (order-free — the
    same discipline as the explode form's map-side partial agg).

    Bit-exactness: assignment is the assign_np computation verbatim
    (same chunking-independent cumsum distances, same first-min
    tie-break); the quantization ``floor(x·1000.0 + 0.5)`` is the same
    IEEE-754 op sequence the SQL fragment evaluates per element; int64
    sums regrouped by identical keys are exact. Pinned transitively by
    test_multi_kmeans_fused_equals_sequential and
    test_ivf_centroids_vectorized_matches_expression (both compare
    against the untouched expression/explode reference paths)."""
    import numpy as np

    Cs = [
        np.asarray([c for _, c in cents], dtype=np.float64)
        for cents in all_cents
    ]
    idxs = [
        np.asarray([i for i, _ in cents], dtype=np.int64)
        for cents in all_cents
    ]
    slices = [(start, length) for _k, start, length in resolved]
    worst = max(
        C.shape[0] * max(1, C.shape[1] if C.ndim > 1 else 1) for C in Cs
    )
    schema = T.StructType(
        [
            T.StructField("sp", T.IntegerType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("dim", T.IntegerType()),
            T.StructField("s", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def partial_sums(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk = max(1, 32 * 1024 * 1024 // max(1, worst * 8))
        for pdf in pdfs:
            vals = pdf["vec"].to_numpy()
            if not len(vals):
                continue
            cols: dict[str, list] = {k: [] for k in ("sp", "cluster", "dim", "s", "n")}
            for lo in range(0, len(vals), chunk):
                M = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in vals[lo : lo + chunk]]
                )
                if M.size == 0:
                    continue
                Q = np.floor(M * 1000.0 + 0.5).astype(np.int64)
                for s, (start, length) in enumerate(slices):
                    Ms = M[:, start : start + length]
                    diffs = (Ms[:, None, :] - Cs[s][None, :, :]) ** 2
                    loc = diffs.cumsum(axis=2)[:, :, -1].argmin(axis=1)
                    k = Cs[s].shape[0]
                    acc = np.zeros((k, length), dtype=np.int64)
                    np.add.at(acc, loc, Q[:, start : start + length])
                    cnt = np.bincount(loc, minlength=k).astype(np.int64)
                    for c in np.nonzero(cnt)[0]:
                        cols["sp"].append(np.full(length, s, dtype=np.int32))
                        cols["cluster"].append(
                            np.full(length, idxs[s][c], dtype=np.int32)
                        )
                        cols["dim"].append(np.arange(length, dtype=np.int32))
                        cols["s"].append(acc[c])
                        cols["n"].append(np.full(length, cnt[c], dtype=np.int64))
            if cols["sp"]:
                yield pd.DataFrame(
                    {k: np.concatenate(c) for k, c in cols.items()}
                )

    return v.select("vec").mapInPandas(partial_sums, schema)


def multi_kmeans(
    emb: DataFrame,
    spaces: list[tuple[int, int, int | None]],
    iters: int = 2,
    vectorized: bool = True,
) -> list[list[tuple[int, list[float]]]]:
    """Fused deterministic k-means over several SLICES ("spaces") of the
    embedding, sharing every Spark job (optimization guide §1.2 step 1 /
    §2.4: remove redundant passes — IVF-PQ previously trained 1 coarse +
    m=8 subspace quantizers as 9 independent :func:`ivf_centroids` runs
    = 9 sample-collects + 9 jobs PER Lloyd iteration; at 100 TB that is
    9 corpus passes per iteration where 1 suffices, and locally it was
    the dominant cost of q_ivf_pq_topk — 28 sequential driver jobs,
    25.3 s at sf0.01, OPTIMIZATION_r13.md #1).

    ``spaces`` = [(k, start0, length)] element slices; ``length=None``
    means the full vector. Per-space semantics are EXACTLY
    :func:`ivf_centroids` on the sliced frame — pytest pins the fused
    output bit-equal to the sequential reference, and every k-means
    oracle (the DuckDB ``_kmeans_assign_ctes`` replay) stays green:

    - seeds: first k DISTINCT sub-vectors within that space's
      ``INIT_OVERSAMPLE × k`` lowest-vec_id window — each window is a
      prefix of ONE shared vec_id-ordered sample (one collect total);
    - assignment: one Arrow-batched projection computes every space's
      argmin per row (:func:`_assign_multi`, bit-identical numpy);
    - update: each element feeds its covering spaces through ONE
      ``groupBy(space, cluster, dim)`` shuffle of exact
      ``floor(x·1000+0.5)`` longs (order-free integer sums), and the
      means collect is one job per iteration instead of N.
    """
    # Lloyd re-reads the same frame once per iteration (plus the seed
    # sample): persist it for the duration of training so iterations
    # 2..n skip the scan+exchange — the standard Spark k-means input
    # contract (MLlib warns when its input is uncached). Unpersisted
    # before returning: only the training JOBS touch the cache, the
    # caller's final query plan never references it (r14, guide §5).
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).persist()
    max_k = max(k for k, _s, _l in spaces)
    sample = v.orderBy("vec_id").limit(INIT_OVERSAMPLE * max_k).collect()
    dim = len(sample[0].vec) if sample else 0
    resolved = [
        (k, start, (dim - start) if length is None else length)
        for k, start, length in spaces
    ]
    all_cents: list[list[tuple[int, list[float]]]] = []
    for k, start, length in resolved:
        seen: set[tuple[float, ...]] = set()
        cents: list[tuple[int, list[float]]] = []
        for r in sample[: INIT_OVERSAMPLE * k]:
            key = tuple(r.vec[start : start + length])
            if key not in seen:
                seen.add(key)
                cents.append((len(cents), list(key)))
                if len(cents) == k:
                    break
        all_cents.append(cents)
    # The per-space explode expression depends only on the space
    # layout, not the centroids — build it ONCE, as one parsed SQL
    # fragment (r14): the Column-API form (9 transform+slice+struct
    # trees, rebuilt every iteration) cost ~1 s of py4j round trips
    # PER Lloyd iteration, measured — the r13 `_sx` lesson applied to
    # the trainer. Same expressions: 0-based `asg[s]`/lambda index,
    # `floor(x*1000.0D + 0.5D)` is the exact quantization the Column
    # form computed (int 1000 promoted to double either way).
    explode_sx = "explode(flatten(array(" + ", ".join(
        f"transform(slice(vec, {start + 1}, {length}), (x, i) -> "
        f"named_struct('sp', {s_idx}, 'cluster', asg[{s_idx}], 'dim', i,"
        f" 'sx', CAST(floor(x * 1000.0D + 0.5D) AS BIGINT)))"
        for s_idx, (_k, start, length) in enumerate(resolved)
    ) + ")))"
    for _ in range(iters):
        if vectorized:
            # fused assignment + map-side partial sums inside the UDF
            # (r14, see _update_sums_np) — one Arrow pass over vec only
            means = (
                _update_sums_np(v, resolved, all_cents)
                .groupBy("sp", "cluster", "dim")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
        else:
            assigned = _assign_multi(v, resolved, all_cents, False)
            means = (
                assigned.select(F.expr(explode_sx).alias("e"))
                .groupBy(
                    F.col("e.sp").alias("sp"),
                    F.col("e.cluster").alias("cluster"),
                    F.col("e.dim").alias("dim"),
                )
                .agg(F.sum("e.sx").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
        by_space: dict[int, dict[int, dict[int, float]]] = {}
        for r in means:
            by_space.setdefault(r.sp, {}).setdefault(r.cluster, {})[r.dim] = (
                r.s / r.n
            ) / 1000.0
        all_cents = [
            [
                (c, [dims[d] for d in sorted(dims)])
                for c, dims in sorted(by_space.get(s_idx, {}).items())
            ]
            for s_idx in range(len(resolved))
        ]
    v.unpersist()
    return all_cents


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_modulus: int = 50,
    iters: int = 2,
) -> DataFrame:
    """IVF ANN top-k: corpus rows live in their nearest-centroid list
    (one projection); each query probes its ``n_probe`` nearest lists;
    candidates form via an equi-join on the list id. The inverted-list
    join is the structure that survives when both sides are large —
    cost O(rows × n_probe / n_centroids) per query list, never a full
    scan per query (contrast :func:`cosine_topk`)."""
    cents = ivf_centroids(emb, n_centroids, iters)
    # coalesce(-1) marks the assignment non-nullable (it never IS null:
    # argmin over a non-empty literal centroid array). Without it the
    # equi-join's inferred isnotnull(cluster) constraint gets the whole
    # argmin expression substituted in by pushdown and re-runs the
    # 16-centroid x 64-dim distance fold a SECOND time for every corpus
    # row (plan-audited, r7); a non-nullable key infers no null filter.
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn(
        "cluster", F.coalesce(_nearest(F.col("vec"), cents), F.lit(-1))
    )
    q_base = v.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    # probe lists: n_probe nearest centroids per query (tiny explode;
    # compact literal form — see _scored_structs)
    q = q_base.withColumn(
        "cluster",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_scored_structs(F.col("qvec"), cents)),
                    1,
                    n_probe,
                ),
                lambda s: s["idx"],
            )
        ),
    )
    cand = v.join(F.broadcast(q), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # No pair dedup needed (r14, one exchange removed): one cluster per
    # corpus row × distinct probed clusters per query ⇒ the equi-join
    # emits each (query_id, vec_id) at most once (see ivf_pq_topk).
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("qvec"), F.col("vec")), 9).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _l2_sql(a: str, b: str) -> str:
    """Mirror of :func:`_nearest`'s distance: sequential left-to-right
    fold of squared component differences."""
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        "p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')"
    )


def _kmeans_assign_ctes(
    table: str,
    n_centroids: int,
    iters: int,
    vec_expr: str = "embedding::DOUBLE[]",
    prefix: str = "",
) -> tuple[list[str], str]:
    """The deterministic-k-means replay shared by every oracle that
    depends on :func:`ivf_centroids`' cluster assignment
    (:func:`ivf_topk_sql`, :func:`semantic_dedup_sql`): the Lloyd loop
    is deterministic (init = lowest vec_ids, quantized-exact centroid
    means), so the ``iters`` iterations unroll into a CTE chain —
    assignment is an argmin window over the (corpus × centroids) cross
    join (fine at oracle scale; the Spark side instead evaluates
    broadcast centroid literals in a projection), the update replays
    the exact ``(Σ floor(x·1000+0.5) / n) / 1000`` sequence. Returns
    (ctes, final_centroid_cte_name); the last CTE ``{prefix}assign``
    holds (vec_id, vec, cluster).

    ``vec_expr``/``prefix`` (r12) let :func:`ivf_pq_topk_sql` replay
    one independent k-means per PQ SUBSPACE: the vector expression is
    a list slice of the embedding and the prefix namespaces the CTE
    chain (``s0v, s0c0, … s0assign``)."""
    p = prefix
    # c0 mirrors the duplicate-robust init: first n_centroids DISTINCT
    # vectors (by min vec_id) within the oversampled lowest-id window.
    ctes = [
        f"{p}v AS (SELECT vec_id, {vec_expr} AS vec FROM {table})",
        f"""{p}c0 AS (
            SELECT (ROW_NUMBER() OVER (ORDER BY mid) - 1)::INT AS cluster,
                   vec AS cvec
            FROM (
                SELECT vec, MIN(vec_id) AS mid FROM (
                    SELECT vec_id, vec FROM {p}v
                    ORDER BY vec_id LIMIT {INIT_OVERSAMPLE * n_centroids}
                ) GROUP BY vec ORDER BY mid LIMIT {n_centroids}
            )
        )""",
    ]
    for i in range(iters):
        ctes.append(f"""{p}a{i + 1} AS (
            SELECT vec_id, vec, cluster FROM (
                SELECT v.vec_id, v.vec, c.cluster,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY {_l2_sql("v.vec", "c.cvec")} ASC,
                                    c.cluster ASC
                       ) AS rn
                FROM {p}v v CROSS JOIN {p}c{i} c
            ) WHERE rn = 1
        )""")
        ctes.append(f"""{p}c{i + 1} AS (
            SELECT cluster, list(m ORDER BY dim) AS cvec FROM (
                SELECT cluster, dim,
                       (SUM(sx)::DOUBLE / COUNT(*)::DOUBLE) / 1000.0 AS m
                FROM (
                    SELECT cluster,
                           unnest(list_transform(vec, (x, i) ->
                               {{'dim': i, 'sx': FLOOR(x * 1000 + 0.5)::BIGINT}}),
                               recursive := true)
                    FROM {p}a{i + 1}
                ) GROUP BY cluster, dim
            ) GROUP BY cluster
        )""")
    cfin = f"{p}c{iters}"
    ctes.append(f"""{p}assign AS (
        SELECT vec_id, vec, cluster FROM (
            SELECT v.vec_id, v.vec, c.cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_l2_sql("v.vec", "c.cvec")} ASC, c.cluster ASC
                   ) AS rn
            FROM {p}v v CROSS JOIN {cfin} c
        ) WHERE rn = 1
    )""")
    return ctes, cfin


def ivf_topk_sql(
    table: str = "embeddings",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_modulus: int = 50,
    iters: int = 2,
) -> str:
    """DuckDB twin of :func:`ivf_topk`: deterministic-k-means replay
    (see :func:`_kmeans_assign_ctes`), then probe, candidate equi-join,
    dedup, and ranking mirror the Spark plan."""
    ctes, cfin = _kmeans_assign_ctes(table, n_centroids, iters)
    ctes.append(f"""probes AS (
        SELECT query_id, qvec, cluster FROM (
            SELECT q.vec_id AS query_id, q.vec AS qvec, c.cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_l2_sql("q.vec", "c.cvec")} ASC, c.cluster ASC
                   ) AS rn
            FROM v q CROSS JOIN {cfin} c
            WHERE q.vec_id % {query_modulus} = 0
        ) WHERE rn <= {n_probe}
    )""")
    ctes.append(f"""scored AS (
        SELECT DISTINCT p.query_id, a.vec_id,
               ROUND({_cosine_sql("p.qvec", "a.vec")}, 9) AS cos_sim
        FROM assign a JOIN probes p USING (cluster)
        WHERE a.vec_id <> p.query_id
    )""")
    ctes.append("""ranked AS (
        SELECT query_id, vec_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, vec_id ASC
               )::INT AS rank
        FROM scored
    )""")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


# ----------------------------------------------------------- IVF-PQ path
def pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    vectorized: bool = True,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks (Jégou, Douze, Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"): the embedding
    is split into ``m`` contiguous subspaces of d/m dims and each gets
    an INDEPENDENT deterministic k-means with ``ksub`` codewords —
    semantically :func:`ivf_centroids` run on the sliced frame
    (pytest pins the equality), so every determinism property
    (lowest-id dedup'd init, quantized-exact means) carries over and
    the DuckDB oracle replays each codebook with the same shared CTE
    chain. Since r13-opt the m trainings run FUSED
    (:func:`multi_kmeans`): one sample collect + one job per Lloyd
    iteration instead of m of each."""
    dim = len(emb.select("embedding").first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    return multi_kmeans(
        emb,
        [(ksub, j * dsub, dsub) for j in range(m)],
        iters,
        vectorized=vectorized,
    )


def pq_encode(
    v: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    vec_col: str = "vec",
    vectorized: bool = False,
) -> DataFrame:
    """Add ``codes`` (array<int>, one codeword id per subspace) — the
    d/8-bytes-per-vector representation that rides the candidate join
    instead of the raw d×8-byte vector. ``vectorized=True`` routes
    each subspace argmin through :func:`assign_np` (bit-identical, the
    scale path — the expression form is an interpreted HOF fold, the
    known k-means assignment hazard); the default expression form
    keeps registry plans Python-free."""
    dsub = len(books[0][0][1])
    sub_cols = []
    for j, cb in enumerate(books):
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        if vectorized:
            v = v.withColumn(f"_sub{j}", sub)
            v = assign_np(v, cb, vec_col=f"_sub{j}", out_col=f"_code{j}")
            sub_cols.append(F.col(f"_code{j}"))
        else:
            sub_cols.append(_nearest(sub, cb))
    out = v.withColumn("codes", F.array(*sub_cols))
    return out.drop(*[c for j in range(len(books))
                      for c in (f"_sub{j}", f"_code{j}")])


def _pq_lut(
    qvec: Column,
    books: list[list[tuple[int, list[float]]]],
) -> Column:
    """Per-QUERY ADC lookup table (Jégou, Douze, Schmid 2011 §IV-A —
    the classic IVFADC optimization): ``lut[j][c]`` = the quantized
    squared L2 distance between the query's j-th sub-vector and
    codeword ``c`` of codebook ``j``. The whole m×ksub table is
    computed ONCE per query row (O(ksub·d)) in the query projection
    BEFORE the candidate join, so scoring a candidate costs m
    ``element_at`` lookups (O(m)) instead of r12's per-candidate O(d)
    HOF folds. Each entry is the SAME fixed left-fold IEEE-754
    sequence + 1e-9-long quantization the per-candidate form used
    (shape of :func:`_nearest`), so the exact integer sum — and the
    DuckDB oracle — stay bit-identical. Gap slots (Lloyd dropped an
    empty cluster) hold 0; no code ever references them."""
    dsub = len(books[0][0][1])
    luts = []
    for j, cb in enumerate(books):
        qsub = F.slice(qvec, j * dsub + 1, dsub)
        by_idx = {i: v for i, v in cb}
        # compact literal form (see _scored_structs): the codebook is
        # ONE nested-array literal; gap slots (Lloyd dropped an empty
        # cluster) are flagged 0 and hold the same lit(0) long the
        # unrolled form emitted — no code ever references them.
        width = max(by_idx) + 1
        cmat = _lit_mat([by_idx.get(i, [0.0] * dsub) for i in range(width)])
        flags = _lit_ints([1 if i in by_idx else 0 for i in range(width)])
        luts.append(
            F.zip_with(
                cmat,
                flags,
                lambda cv, ok: F.when(
                    ok == F.lit(1),
                    F.floor(
                        F.aggregate(
                            F.zip_with(
                                qsub, cv, lambda a, b: (a - b) * (a - b)
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                        * F.lit(1e9)
                        + F.lit(0.5)
                    ).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            )
        )
    return F.array(*luts)


def _adc_from_lut(lut: Column, codes: Column, m: int) -> Column:
    """O(m) asymmetric distance: exact integer sum of m LUT lookups —
    partial order can never perturb it (the repo's float-derived-metric
    discipline, operators/lm.py)."""
    total = None
    for j in range(m):
        t = F.element_at(F.element_at(lut, j + 1), codes[j] + F.lit(1))
        total = t if total is None else total + t
    return total


def auto_n_centroids(n: int, floor: int = 16) -> int:
    """Coarse-quantizer width for IVF at ``n`` vectors:
    ``max(floor, round(√n))`` — the classic IVF sizing rule (per-list
    occupancy ~√n keeps probe cost and list-scan cost balanced). The
    fixed floor=16 ceiling was measured to bind as n grows
    (recall@10 0.59 at sf0.001 → 0.39 at sf0.1, VERDICT r12 #3)."""
    return max(floor, int(round(n ** 0.5)))


def ivf_pq_topk(
    emb: DataFrame,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int | None = None,
    query_modulus: int = 50,
    iters: int = 2,
    m: int = 8,
    ksub: int = 16,
    refine: int | None = 60,
    vectorized_encode: bool = False,
) -> DataFrame:
    """IVF-PQ ANN top-k (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): coarse inverted lists exactly like
    :func:`ivf_topk`, but candidates are scored from their ``m``-byte
    PQ codes via asymmetric distance — the raw vector NEVER rides the
    candidate join. At 100 TB that is the memory/IO story: d=64
    float32 vectors are 256 bytes; m=8 codes are 8 bytes (d/8), a 32×
    smaller probe-side shuffle/cache footprint, while the coarse
    quantizer bounds candidates to O(rows × n_probe / n_centroids)
    per query.

    ``refine`` (IVFADC-R, ibid. §V): the ADC pass only SHORTLISTS —
    the top ``refine`` code-scored ids per query are re-ranked by the
    exact distance after fetching their full vectors with a broadcast
    ids-first join (the shortlist is nq × refine rows, tiny — the
    same ids-first/fetch-after-dedup rule the LSH/MinHash paths pin).
    ``refine=None`` returns the raw ADC ranking (``dist`` is then the
    quantized ADC value). Both stages rank by an exact integer
    distance with deterministic vec_id ties.

    ``n_centroids=None`` (the default) auto-scales the coarse
    quantizer to :func:`auto_n_centroids` = max(16, √n) — pass an
    explicit value when an oracle twin (:func:`ivf_pq_topk_sql`) must
    replay the same Lloyd unroll. ``n_probe=None`` (the default)
    scales WITH the quantizer: ``max(4, n_centroids // 4)`` — a fixed
    probe count over a grown centroid set silently shrinks the probed
    corpus fraction (measured: recall@10 0.39→0.31 at sf0.1 when √n
    centroids kept n_probe=4); tying them keeps ~25 % coverage while
    the finer lists improve candidate quality at the same cost.

    Scoring is O(m) per candidate via a per-query ADC lookup table
    (:func:`_pq_lut`) carried on the broadcast probe side — m×ksub
    longs ≈ 1 KB per query at m=8/ksub=16; the r12 form re-ran O(d)
    folds per candidate row (VERDICT r12 #1)."""
    if n_centroids is None:
        # ONE metadata job for (n, dim) — the count must scan anyway,
        # so the dim probe rides it for free (r14: was a separate
        # first() job per query; guide §1.2 #1, don't pay extra passes)
        meta = emb.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.size("embedding")).alias("d"),
        ).first()
        n_centroids, dim = auto_n_centroids(meta["n"]), meta["d"]
    else:
        # explicit quantizer (the oracle path): no count needed — probe
        # only the dimension, shipping an int instead of the vector
        dim = emb.select(F.size("embedding")).first()[0]
    if n_probe is None:
        n_probe = max(4, n_centroids // 4)
    # Coarse quantizer + all m PQ codebooks train FUSED (r13-opt,
    # OPTIMIZATION_r13.md #1): one shared sample collect + one job per
    # Lloyd iteration for all 9 spaces — bit-identical to the
    # sequential ivf_centroids/pq_codebooks runs (pytest-pinned; the
    # DuckDB oracle's per-space CTE replay is unchanged and green).
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    fused = multi_kmeans(
        emb,
        [(n_centroids, 0, None)]
        + [(ksub, j * dsub, dsub) for j in range(m)],
        iters,
    )
    cents, books = fused[0], fused[1:]
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    if vectorized_encode:
        # Scale path (r14): coarse assignment + all m PQ codes in ONE
        # Arrow-batched pass (the same _assign_multi the fused trainer
        # uses — per-space outputs bit-identical to _nearest/assign_np,
        # pytest-pinned). The r13 form paid one interpreted O(k·d) HOF
        # fold for the coarse argmin plus m separate assign_np columns.
        resolved = [(n_centroids, 0, dim)] + [
            (ksub, j * dsub, dsub) for j in range(m)
        ]
        va = _assign_multi(base, resolved, [cents] + list(books), True)
        v = va.select(
            "vec_id",
            # coalesce marks the join key non-nullable (see ivf_topk)
            F.coalesce(F.col("asg")[0], F.lit(-1)).alias("cluster"),
            F.slice(F.col("asg"), 2, m).alias("codes"),
        )
    else:
        v = base.withColumn(
            # coalesce marks the join key non-nullable (see ivf_topk)
            "cluster", F.coalesce(_nearest(F.col("vec"), cents), F.lit(-1))
        )
        # codes computed once per corpus row; the vec column is DROPPED
        # before the join — only (vec_id, cluster, codes) shuffles
        v = pq_encode(v, books, vectorized=False).select(
            "vec_id", "cluster", "codes"
        )
    q_base = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    ).filter(F.col("query_id") % query_modulus == 0)
    q = (
        q_base.withColumn("lut", _pq_lut(F.col("qvec"), books))
        .withColumn(
            "cluster",
            F.explode(
                F.transform(
                    F.slice(
                        F.array_sort(_scored_structs(F.col("qvec"), cents)),
                        1,
                        n_probe,
                    ),
                    lambda s: s["idx"],
                )
            ),
        )
        # qvec is DROPPED here — the broadcast probe side carries only
        # (query_id, cluster, lut); refine re-reads qvec from q_base
        .select("query_id", "cluster", "lut")
    )
    cand = v.join(F.broadcast(q), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # No pair dedup needed (r14, one exchange removed): each corpus row
    # carries exactly ONE cluster (argmin), and a query's probed
    # clusters are distinct (slice of an array_sort over per-centroid
    # structs), so the equi-join can emit a (query_id, vec_id) pair at
    # most once — unlike the banded LSH paths where one pair can
    # collide in several tables. Pinned by test_ivf_pq_candidates_unique.
    scored = cand.select(
        "query_id",
        "vec_id",
        _adc_from_lut(F.col("lut"), F.col("codes"), m).alias("adc_dist"),
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    if refine is None:
        return (
            scored.withColumn("rank", F.row_number().over(w_adc))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "vec_id",
                F.col("adc_dist").alias("dist"), "rank",
            )
        )
    shortlist = (
        scored.withColumn("r0", F.row_number().over(w_adc))
        .filter(F.col("r0") <= refine)
        .select("query_id", "vec_id")
    )
    corpus_vec = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cvec2")
    )
    fetched = corpus_vec.join(F.broadcast(shortlist), "vec_id").join(
        F.broadcast(q_base), "query_id"
    )
    exact = F.floor(
        F.aggregate(
            F.zip_with(
                F.col("qvec"), F.col("cvec2"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        fetched.select("query_id", "vec_id", exact.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dist", "rank")
    )


def ivf_pq_topk_sql(
    table: str = "embeddings",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_modulus: int = 50,
    iters: int = 2,
    m: int = 8,
    ksub: int = 16,
    refine: int | None = 60,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`ivf_pq_topk`: the coarse k-means replay
    plus ONE independent prefixed k-means chain per subspace
    (:func:`_kmeans_assign_ctes` with a sliced ``vec_expr``); the ADC
    lookup is a join to each subspace's final-centroid CTE (positional
    ``element_at`` on the Spark side ≡ equi-join on cluster id here),
    quantized to the same exact integer sum."""
    dsub = dim // m
    ctes, cfin = _kmeans_assign_ctes(table, n_centroids, iters)
    sub_fins = []
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        sub_ctes, sub_fin = _kmeans_assign_ctes(
            table,
            ksub,
            iters,
            vec_expr=f"(embedding::DOUBLE[])[{lo}:{hi}]",
            prefix=f"s{j}",
        )
        ctes.extend(sub_ctes)
        sub_fins.append(sub_fin)
    ctes.append(f"""probes AS (
        SELECT query_id, qvec, cluster FROM (
            SELECT q.vec_id AS query_id, q.vec AS qvec, c.cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_l2_sql("q.vec", "c.cvec")} ASC, c.cluster ASC
                   ) AS rn
            FROM v q CROSS JOIN {cfin} c
            WHERE q.vec_id % {query_modulus} = 0
        ) WHERE rn <= {n_probe}
    )""")
    joins = []
    terms = []
    for j, sub_fin in enumerate(sub_fins):
        joins.append(
            f"JOIN s{j}assign s{j}a ON s{j}a.vec_id = a.vec_id\n"
            f"        JOIN {sub_fin} cw{j} ON cw{j}.cluster = s{j}a.cluster"
        )
        lo, hi = j * dsub + 1, (j + 1) * dsub
        terms.append(
            "FLOOR("
            + _l2_sql(f"(p.qvec)[{lo}:{hi}]", f"cw{j}.cvec")
            + " * 1000000000.0 + 0.5)::BIGINT"
        )
    join_sql = "\n        ".join(joins)
    adc = "\n               + ".join(terms)
    ctes.append(f"""scored AS (
        SELECT DISTINCT p.query_id, a.vec_id,
               ({adc}) AS adc_dist
        FROM assign a
        JOIN probes p USING (cluster)
        {join_sql}
        WHERE a.vec_id <> p.query_id
    )""")
    if refine is None:
        ctes.append("""ranked AS (
            SELECT query_id, vec_id, adc_dist AS dist,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY adc_dist ASC, vec_id ASC
                   )::INT AS rank
            FROM scored
        )""")
    else:
        ctes.append(f"""shortlist AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY adc_dist ASC, vec_id ASC
                       ) AS r0
                FROM scored
            ) WHERE r0 <= {refine}
        )""")
        ctes.append(f"""ranked AS (
            SELECT query_id, vec_id, dist,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY dist ASC, vec_id ASC
                   )::INT AS rank
            FROM (
                SELECT s.query_id, s.vec_id,
                       FLOOR({_l2_sql("q.vec", "cv.vec")}
                             * 1000000000.0 + 0.5)::BIGINT AS dist
                FROM shortlist s
                JOIN v cv ON cv.vec_id = s.vec_id
                JOIN v q ON q.vec_id = s.query_id
            )
        )""")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT query_id, vec_id, dist, rank FROM ranked
        WHERE rank <= {k}
    """


def collect_ivf_pq_index(
    emb: DataFrame,
    n_centroids: int | None = None,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    with_vectors: bool = False,
) -> dict:
    """Freeze an IVF-PQ index driver-side for the stateless streaming
    scorer (:func:`ivf_pq_score_stream`) — the broadcast-model pattern
    every learned filter here follows (perplexity_stream,
    bm25_score_stream, decontaminate_stream). The payload is the coarse
    centroids + per-subspace codebooks + the CODED corpus: 8 bytes per
    vector at m=8 (measured 3.4 % of raw parquet), so 100 M vectors
    broadcast ~800 MB — the PQ memory story is exactly what makes a
    broadcast ANN index feasible where raw vectors (256 B each) are
    not. ``with_vectors=True`` additionally collects the raw vectors
    for IVFADC-R refine (d×8 B each — budget accordingly or leave the
    stream at ADC ranking)."""
    if n_centroids is None:
        n_centroids = auto_n_centroids(emb.count())
    # fused coarse + codebook training (see ivf_pq_topk)
    dim = len(emb.select("embedding").first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    fused = multi_kmeans(
        emb,
        [(n_centroids, 0, None)]
        + [(ksub, j * dsub, dsub) for j in range(m)],
        iters,
    )
    cents, books = fused[0], fused[1:]
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn(
        "cluster", F.coalesce(_nearest(F.col("vec"), cents), F.lit(-1))
    )
    coded = pq_encode(v, books, vectorized=True).select(
        "vec_id", "cluster", "codes"
    )
    rows = coded.collect()
    index = {
        "cents": cents,
        "books": books,
        "m": m,
        "ids": [r.vec_id for r in rows],
        "clusters": [r.cluster for r in rows],
        "codes": [list(r.codes) for r in rows],
    }
    if with_vectors:
        vr = emb.select("vec_id", "embedding").collect()
        index["vectors"] = {
            r.vec_id: list(r.embedding) for r in vr
        }
    return index


def ivf_pq_score_stream(
    queries: DataFrame,
    index: dict,
    k: int = 10,
    n_probe: int | None = None,
    refine: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stateless streaming ANN: incoming query vectors scored against
    the frozen :func:`collect_ivf_pq_index` — one Arrow-batched
    projection per micro-batch, no state, no watermark (the
    ``bm25_score_stream`` pattern). Output (query_id, vec_id, dist,
    rank) matches :func:`ivf_pq_topk` BIT-EXACTLY for queries drawn
    from the indexed corpus (pytest-pinned): probe selection replays
    the (dist, idx) struct sort, LUT entries replay the per-dimension
    left-fold IEEE-754 sequence (the assign_np discipline), the ADC
    total is the same exact integer sum, ties break on vec_id.
    ``refine`` needs an index built ``with_vectors=True``."""
    import numpy as np

    cents = index["cents"]
    books = index["books"]
    m = index["m"]
    dsub = len(books[0][0][1])
    cent_ids = np.array([i for i, _ in cents], dtype=np.int64)
    cent_mat = np.array([v for _, v in cents], dtype=np.float64)
    corp_ids = np.array(index["ids"], dtype=np.int64)
    corp_clusters = np.array(index["clusters"], dtype=np.int64)
    corp_codes = np.array(index["codes"], dtype=np.int64)
    if n_probe is None:
        n_probe = max(4, len(cents) // 4)
    if refine is not None and "vectors" not in index:
        raise ValueError(
            "refine needs collect_ivf_pq_index(with_vectors=True)"
        )
    vecs = index.get("vectors")
    # codeword matrix per subspace, positioned by codeword id (gap
    # slots hold zeros — no code references them)
    cw = []
    for cb in books:
        by_idx = {i: v for i, v in cb}
        mat = np.zeros((max(by_idx) + 1, dsub), dtype=np.float64)
        for i, v in by_idx.items():
            mat[i] = v
        cw.append(mat)

    def _fold_l2(q: "np.ndarray", mat: "np.ndarray") -> "np.ndarray":
        # the expression fold's exact IEEE add order: acc += (a-b)^2
        # one DIMENSION at a time (vectorized across rows of mat)
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for d in range(mat.shape[1]):
            diff = q[d] - mat[:, d]
            acc = acc + diff * diff
        return acc

    out_schema = (
        "query_id long, vec_id long, dist long, rank int"
    )

    def score(batches):
        for pdf in batches:
            rows = []
            for qid, qvec in zip(pdf[id_col], pdf[vec_col]):
                q = np.asarray(qvec, dtype=np.float64)
                cd = _fold_l2(q, cent_mat)
                order = np.lexsort((cent_ids, cd))[:n_probe]
                probed = set(cent_ids[order].tolist())
                mask = np.isin(corp_clusters, list(probed)) & (
                    corp_ids != qid
                )
                c_ids = corp_ids[mask]
                if not len(c_ids):
                    continue
                c_codes = corp_codes[mask]
                # Lloyd can drop clusters per subspace, so slot counts
                # differ; unused (gap) slots are never referenced
                n_slots = max(c.shape[0] for c in cw)
                lut = np.zeros((m, n_slots), dtype=np.int64)
                for j in range(m):
                    d = _fold_l2(q[j * dsub:(j + 1) * dsub], cw[j])
                    lut[j, : len(d)] = np.floor(
                        d * 1e9 + 0.5
                    ).astype(np.int64)
                adc = np.zeros(len(c_ids), dtype=np.int64)
                for j in range(m):
                    adc = adc + lut[j, c_codes[:, j]]
                if refine is None:
                    pick = np.lexsort((c_ids, adc))[:k]
                    for rk, ix in enumerate(pick, start=1):
                        rows.append(
                            (int(qid), int(c_ids[ix]),
                             int(adc[ix]), rk)
                        )
                    continue
                short = np.lexsort((c_ids, adc))[:refine]
                s_ids = c_ids[short]
                ex = np.empty(len(s_ids), dtype=np.int64)
                for i, sid in enumerate(s_ids):
                    cv = np.asarray(vecs[int(sid)], dtype=np.float64)
                    acc = 0.0
                    for d in range(len(q)):
                        diff = q[d] - cv[d]
                        acc = acc + diff * diff
                    ex[i] = int(np.floor(acc * 1e9 + 0.5))
                pick = np.lexsort((s_ids, ex))[:k]
                for rk, ix in enumerate(pick, start=1):
                    rows.append(
                        (int(qid), int(s_ids[ix]), int(ex[ix]), rk)
                    )
            yield pd.DataFrame(
                rows, columns=["query_id", "vec_id", "dist", "rank"]
            )

    return queries.select(id_col, vec_col).mapInPandas(
        score, schema=out_schema
    )


# ----------------------------------------------------------- LSH ANN path
def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes seeded by md5 — reproducible across
    runs without any RNG state."""
    planes = []
    for h in range(n_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"plane-{h}-{d}".encode()).hexdigest()
            row.append(1.0 if int(digest[:8], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(
    emb: DataFrame, dim: int = 64, n_planes: int = 4, n_tables: int = 4
) -> DataFrame:
    """Multi-table random-hyperplane signatures: per table t, bit h =
    sign(v · plane_{t,h}); 2^n_planes buckets per table. One row per
    (vector, table) after explode — standard L-table LSH, trading L×
    index size for recall. The signature computation is one projection
    (no shuffle); bucketing a 100 TB corpus costs a single scan."""
    # ONE parsed expression for all L tables x H planes (r13-opt, see
    # _lit_mat / text.tokens_sx): the repeated cast fragment mirrors the
    # old duplicated Column subtree (codegen CSE evaluates it once).
    v = "CAST(embedding AS ARRAY<DOUBLE>)"
    structs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes * (t + 1))[n_planes * t :]
        sig = "0"
        for h, plane in enumerate(planes):
            pl = "array(" + ",".join(_dlit(x) for x in plane) + ")"
            dot = (
                f"aggregate(zip_with({v}, {pl}, (x, y) -> x * y), "
                "0.0D, (acc, x) -> acc + x)"
            )
            sig += (
                f" + CASE WHEN {dot} >= 0 THEN {1 << h} ELSE 0 END"
            )
        structs.append(
            f"named_struct('tbl', {t}, 'sig', CAST({sig} AS INT))"
        )
    arr = "array(" + ",".join(structs) + ")"
    return emb.withColumn(
        "bucket", F.explode(F.expr(arr))
    ).withColumn(
        "bucket", F.concat_ws("#", F.col("bucket.tbl"), F.col("bucket.sig"))
    )


def lsh_bucket_np(
    emb: DataFrame, dim: int = 64, n_planes: int = 4, n_tables: int = 4
) -> DataFrame:
    """Vectorized twin of :func:`lsh_bucket`: all L×H hyperplane dots
    per Arrow batch as ONE numpy matmul — the dense-linear-algebra case
    where a vectorized pandas UDF beats per-element JVM higher-order
    functions (measured 2.6× at sf0.1; the HOF path evaluates 16
    zip_with+aggregate chains per row). Same md5-seeded hyperplanes,
    same bucket ids up to IEEE summation order on knife-edge dots
    (matmul sums pairwise, the HOF folds sequentially) — fine for ANN,
    which is approximate by construction; recall is pinned in pytest.
    """
    import numpy as np

    planes = np.array(_hyperplanes(dim, n_planes * n_tables), dtype=np.float64)
    weights = 1 << np.arange(n_planes)
    prefixes = np.array([f"{t}#" for t in range(n_tables)])

    # widest possible signature is 2^n_planes - 1: size the unicode
    # dtype to it (a fixed "U11" would silently TRUNCATE signatures
    # once n_planes >= 37, merging distinct buckets with no error)
    sig_width = len(str((1 << n_planes) - 1))

    def _bucket_mat(m: "np.ndarray") -> "np.ndarray":
        bits = (m @ planes.T >= 0).astype(np.int64)
        sigs = bits.reshape(len(m), n_tables, n_planes) @ weights
        # (n, L) bucket-id strings, fully vectorized (no per-row Python)
        return np.char.add(prefixes, sigs.astype(f"U{sig_width}"))

    try:
        # Arrow-native: numpy in, pa.ListArray out — zero pandas-object
        # materialization (the old path built a Python list-of-strings
        # per row, the one avoidable object build left in a hot path).
        import pyarrow as pa
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import ArrayType, StringType

        @arrow_udf(ArrayType(StringType()))
        def _sig(v):
            arr = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            strs = _bucket_mat(flat.reshape(len(arr), dim))
            offsets = pa.array(
                np.arange(
                    0, (len(arr) + 1) * n_tables, n_tables, dtype=np.int32
                )
            )
            return pa.ListArray.from_arrays(offsets, pa.array(strs.ravel()))

    except ImportError:  # pragma: no cover - Spark < 4.1 fallback
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def _sig(v: pd.Series) -> pd.Series:
            strs = _bucket_mat(np.vstack(v.to_numpy()))
            return pd.Series(list(map(list, strs)))

    return emb.withColumn(
        "bucket", F.explode(_sig(F.col("embedding").cast("array<double>")))
    )


def lsh_ann_topk(
    emb: DataFrame, k: int = 10, dim: int = 64, n_planes: int = 4,
    n_tables: int = 4, query_modulus: int = 50, vectorized: bool = False,
) -> DataFrame:
    """ANN top-k: candidates restricted to buckets the query occupies in
    ANY of the L hash tables, then exact cosine + rank. Trades recall
    for a corpus-side equi-join on ``bucket`` instead of a broadcast
    full scan — the shape that survives when the query side is also
    large. Recall vs brute force is asserted in pytest; exact output is
    oracle-checked against :func:`lsh_ann_topk_sql`.

    Ids-first discipline (same as ``dedup._banded_jaccard``): the
    bucket join and the (query_id, vec_id) pair dedup move ONLY id
    columns — a candidate that collides in all L tables costs L slim
    rows, not L copies of a ~512 B vector. Vectors are re-fetched
    after dedup: the corpus side via a ``shuffle_hash``-pinned id join
    (Catalyst's size estimates for array intermediates are unreliable
    — SCALE.md), the query side via broadcast (it is modulus-sampled
    tiny by construction).
    """
    bucketer = lsh_bucket_np if vectorized else lsh_bucket
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    bucketed = bucketer(emb, dim, n_planes, n_tables).select(
        "vec_id", "bucket"
    )
    q_b = bucketed.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("bucket")
    )
    pairs = (
        bucketed.join(F.broadcast(q_b), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    # Fused dedup + re-fetch: aggregating the pair stream by vec_id
    # both dedups (collect_set, with map-side partial aggregation) AND
    # lands the frame hash-partitioned on vec_id — exactly the
    # partitioning the corpus re-fetch join needs, so the dedup shuffle
    # IS the join shuffle. dropDuplicates([query_id, vec_id]) would pay
    # a (query_id, vec_id) exchange plus a second vec_id exchange for
    # the join. Per-key set size is bounded by the query count, which
    # is broadcast-tiny by this operator's contract (a corpus-sized
    # query side needs the salted two-phase design in cosine_topk).
    cand = pairs.groupBy("vec_id").agg(
        F.collect_set("query_id").alias("query_ids")
    )
    qv = v.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        cand.join(v.hint("shuffle_hash"), "vec_id")
        .select("vec_id", F.explode("query_ids").alias("query_id"), "vec")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 9).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(f"{x:.1f}" for x in plane) + "]::DOUBLE[]"


def lsh_ann_topk_sql(
    table: str = "embeddings", k: int = 10, dim: int = 64,
    n_planes: int = 4, n_tables: int = 4, query_modulus: int = 50,
) -> str:
    """DuckDB twin of :func:`lsh_ann_topk` (default HOF path): the
    md5-seeded ±1 hyperplanes are deterministic constants, so they are
    generated here and inlined as literals; bucket signatures, the
    bucket equi-join, pair dedup, and exact-cosine ranking mirror the
    Spark plan op-for-op (same left-to-right dot-product folds)."""
    planes = _hyperplanes(dim, n_planes * n_tables)
    buckets = []
    for t in range(n_tables):
        bits = " + ".join(
            f"CASE WHEN {_dot_sql('vec', _plane_sql(planes[t * n_planes + h]))}"
            f" >= 0 THEN {1 << h} ELSE 0 END"
            for h in range(n_planes)
        )
        buckets.append(f"'{t}#' || ({bits})::VARCHAR")
    cos = _cosine_sql("qq.qvec", "v.vec")
    return f"""
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM {table}
        ),
        b AS (
            SELECT vec_id, unnest([{", ".join(buckets)}]) AS bucket FROM v
        ),
        qb AS (
            SELECT vec_id AS query_id, bucket FROM b
            WHERE vec_id % {query_modulus} = 0
        ),
        pairs AS (
            SELECT DISTINCT qb.query_id, b.vec_id
            FROM b JOIN qb USING (bucket)
            WHERE b.vec_id <> qb.query_id
        ),
        scored AS (
            SELECT p.query_id, p.vec_id, ROUND({cos}, 9) AS cos_sim
            FROM pairs p
            JOIN v ON v.vec_id = p.vec_id
            JOIN (
                SELECT vec_id AS query_id, vec AS qvec FROM v
                WHERE vec_id % {query_modulus} = 0
            ) qq ON qq.query_id = p.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id ASC
                   )::INT AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


# ----------------------------------------------------------- SemDeDup
def _semdedup_assigned(
    emb: DataFrame, n_centroids: int, iters: int, vectorized: bool = False
) -> DataFrame:
    """(vec_id, vec, cluster) with the deterministic k-means assignment.
    coalesce(-1) marks the cluster key non-nullable for the same reason
    as :func:`ivf_topk`: a nullable computed join key would get the
    whole argmin expression substituted into an inferred isnotnull
    Filter by pushdown (r7 plan-audit rule).

    Null ``vec_id`` rows are excluded up front (the id IS the dedup
    identity, so a null id has no defined keep-order) — and doing it on
    the SHARED frame is what lets the self-join reuse one Exchange: the
    LeftOuter join infers ``isnotnull(vec_id)`` on its build side only,
    and an asymmetric Filter makes the two otherwise-identical scan
    subtrees canonically different (no ReusedExchange; verified on the
    executed plan, r7).

    ``vectorized=True`` swaps the assignment to :func:`assign_np`
    (bit-identical distances/tie-break, see its docstring) — used by
    the scale paths so assignment stays O(n·k·d) in BLAS, not in the
    Catalyst interpreter; the oracle-checked join form keeps the
    expression so the registry plan stays pure-JVM."""
    cents = ivf_centroids(emb, n_centroids, iters)
    base = emb.filter(F.col("vec_id").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    if vectorized:
        return assign_np(base, cents)
    return base.withColumn(
        "cluster", F.coalesce(_nearest(F.col("vec"), cents), F.lit(-1))
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the
    deterministic k-means of :func:`ivf_centroids`, then WITHIN each
    cluster drop every vector that has a lower-``vec_id`` neighbor with
    cosine >= ``threshold``. The reference engine has no similarity
    operators (SURVEY.md §2.2); this is the embedding-space sibling of
    the MinHash near-dup tier — it catches paraphrases exact n-grams
    miss.

    Returns one row per input vector: (vec_id, cluster, kept). Callers
    drop with ``filter("kept")``; keeping losers visible makes the
    dedup rate auditable (and the oracle total).

    Scale design — this supersedes the retired brute-force
    ``embedding_neardup`` (all-pairs over a sample, O(n²)): candidate
    pairs form ONLY within a cluster via a self-join on the cluster id
    (aliases of ONE frame, so the cluster-keyed Exchange is planned
    once and reused). Pair cost is Σ c_i² over cluster sizes — at
    corpus scale ``n_centroids`` grows so clusters stay bounded (the
    SemDeDup recipe: n_centroids ∝ n / target_cluster_size), keeping
    the join linear-ish, never all-pairs. The vectors must ride this
    join (the cosine is computed at match time) — acceptable precisely
    because candidates are cluster-bounded, in contrast to the LSH tail
    where candidate fan-out is data-dependent (SCALE.md); the join is
    pinned shuffle_hash for the same mis-broadcast reason. The
    keep-lowest-id rule is the deterministic variant of SemDeDup's
    keep-one-per-duplicate-set (drop v iff SOME smaller-id
    same-cluster neighbor is >= threshold — independent per vector, so
    the decision needs no iterative connected components).

    ``threshold`` defaults low for the synthetic fixture corpus (its
    vectors are diffuse — within-cluster cosine tops out near 0.5;
    measured at sf0.01: 68/500 dropped at 0.35). On real sentence
    embeddings SemDeDup operates at ~0.95+.

    The per-cluster matmul twin :func:`semantic_dedup_np` is the
    production hot path at fixed output; pytest pins equality.
    """
    v = _semdedup_assigned(emb, n_centroids, iters)
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b.hint("shuffle_hash"),
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("b.vec_id") < F.col("a.vec_id"))
        & (
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 9)
            >= F.lit(threshold)
        ),
        "left",
    )
    return (
        pairs.groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(
            F.first(F.col("a.cluster")).alias("cluster"),
            F.max(F.col("b.vec_id")).alias("_hit"),
        )
        .select(
            "vec_id", "cluster", F.col("_hit").isNull().alias("kept")
        )
    )


def semantic_dedup_np(
    emb: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Per-cluster numpy matmul twin of :func:`semantic_dedup` — the
    production hot path: ``groupBy(cluster).applyInPandas`` computes
    the within-cluster cosine matrix as ONE float64 GEMM and takes the
    strict-lower-triangle row-wise any() for the drop decision. One
    shuffle (cluster-keyed), no pair materialization; per-task memory
    is O(c·dim + c²) for cluster size c — bounded by the same
    n_centroids ∝ corpus-size rule as the join form. Output rows and
    values are pytest-pinned identical to the expression form (cosines
    rounded to 9 decimals before the threshold compare on both paths,
    same discipline as cosine_topk_np). Assignment runs through the
    bit-identical :func:`assign_np` so the whole path is vectorized —
    the interpreted argmin fold was the 30x-stress bottleneck (100 s →
    O(s) at 60k vecs × 60 centroids)."""
    import numpy as np

    v = _semdedup_assigned(emb, n_centroids, iters, vectorized=True)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("kept", T.BooleanType()),
        ]
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        order = pdf["vec_id"].to_numpy().argsort(kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        M = np.asarray(
            [np.asarray(x, dtype=np.float64) for x in pdf["vec"].to_numpy()[order]]
        )
        norms = np.sqrt((M * M).sum(axis=1))
        norms[norms == 0.0] = 1.0
        Mn = M / norms[:, None]
        n = len(ids)
        # Blocked GEMM: a skewed cluster must cost O(c²) COMPUTE (the
        # SemDeDup contract) but never O(c²) MEMORY in one allocation —
        # row blocks of ~32 MB against the full column set, comparing
        # only columns strictly before each row (ids ascending).
        block = max(1, 32 * 1024 * 1024 // (8 * max(n, 1)))
        dup = np.zeros(n, dtype=bool)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            Cb = np.round(Mn[lo:hi] @ Mn.T, 9)
            mask = np.arange(n)[None, :] < np.arange(lo, hi)[:, None]
            dup[lo:hi] = ((Cb >= threshold) & mask).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].to_numpy()[order],
                "kept": ~dup,
            }
        )

    return v.groupBy("cluster").applyInPandas(per_cluster, schema)


def semantic_dedup_sql(
    table: str = "embeddings",
    threshold: float = 0.35,
    n_centroids: int = 16,
    iters: int = 2,
) -> str:
    """DuckDB twin of :func:`semantic_dedup`: replay the deterministic
    k-means (shared :func:`_kmeans_assign_ctes`), then the
    keep-lowest-id rule as a within-cluster self-join + LEFT JOIN."""
    ctes, _ = _kmeans_assign_ctes(table, n_centroids, iters)
    cos = _cosine_sql("a.vec", "b.vec")
    ctes.append(f"""dropped AS (
        SELECT DISTINCT a.vec_id
        FROM assign a JOIN assign b
          ON a.cluster = b.cluster AND b.vec_id < a.vec_id
        WHERE ROUND({cos}, 9) >= {threshold}
    )""")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT s.vec_id, s.cluster, (d.vec_id IS NULL) AS kept
        FROM assign s LEFT JOIN dropped d USING (vec_id)
    """


def semantic_decontaminate(
    emb: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    iters: int = 2,
    test_modulus: int = 23,
) -> DataFrame:
    """Semantic train/test decontamination — the embedding-space
    sibling of ``decontam.decontaminate`` (which catches exact n-gram
    overlap; this catches PARAPHRASED benchmark leakage, the failure
    mode n-grams miss). Bipartite SemDeDup: cluster the embedding
    space once (deterministic k-means over the full table, so the
    oracle can replay it), split vectors into train
    (``vec_id % test_modulus != 0``) and test (== 0), and flag every
    train vector having a test neighbor with cosine >= ``threshold``
    in the SAME cluster.

    Returns one row per train vector: (vec_id, cluster, n_hits,
    contaminated) — n_hits = number of >=-threshold test neighbors in
    the cluster, the same auditability contract as the n-gram
    operator.

    Scale: candidate pairs are cluster-bounded exactly as in
    :func:`semantic_dedup` (n_centroids ∝ corpus size); the test side
    is an eval suite — orders smaller than train — so the per-cluster
    bipartite compare is test-side-bounded. The join is pinned
    shuffle_hash (array payloads defeat size estimates, SCALE.md).
    """
    v = _semdedup_assigned(emb, n_centroids, iters)
    # `%` (sign of dividend), NOT pmod: the DuckDB oracle splits with
    # SQL `%`, and decontam.py uses the same convention — pmod would
    # diverge for negative vec_ids.
    train = v.filter((F.col("vec_id") % test_modulus) != 0)
    test = v.filter((F.col("vec_id") % test_modulus) == 0).select(
        F.col("cluster").alias("t_cluster"),
        F.col("vec_id").alias("t_id"),
        F.col("vec").alias("t_vec"),
    )
    pairs = train.join(
        test.hint("shuffle_hash"),
        (F.col("cluster") == F.col("t_cluster"))
        & (
            F.round(cosine(F.col("vec"), F.col("t_vec")), 9)
            >= F.lit(threshold)
        ),
        "left",
    )
    return (
        pairs.groupBy("vec_id")
        .agg(
            F.first("cluster").alias("cluster"),
            F.count(F.col("t_id")).cast("long").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def semantic_decontaminate_sql(
    table: str = "embeddings",
    threshold: float = 0.35,
    n_centroids: int = 16,
    iters: int = 2,
    test_modulus: int = 23,
) -> str:
    """DuckDB twin of :func:`semantic_decontaminate` (k-means replay
    shared with the IVF / SemDeDup oracles)."""
    ctes, _ = _kmeans_assign_ctes(table, n_centroids, iters)
    cos = _cosine_sql("tr.vec", "te.vec")
    ctes.append(f"""train AS (
        SELECT vec_id, vec, cluster FROM assign
        WHERE vec_id % {test_modulus} <> 0
    )""")
    ctes.append(f"""test AS (
        SELECT vec_id, vec, cluster FROM assign
        WHERE vec_id % {test_modulus} = 0
    )""")
    ctes.append(f"""hits AS (
        SELECT tr.vec_id, COUNT(*)::BIGINT AS n_hits
        FROM train tr JOIN test te ON tr.cluster = te.cluster
        WHERE ROUND({cos}, 9) >= {threshold}
        GROUP BY tr.vec_id
    )""")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT tr.vec_id, tr.cluster,
               COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
               COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM train tr LEFT JOIN hits h USING (vec_id)
    """


# ------------------------------------------------ cluster sampling
def cluster_sample(
    emb: DataFrame,
    alpha: float = 0.5,
    budget: int = 200,
    n_centroids: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Cluster-balanced diversity sampling — the selection step that
    follows SemDeDup in the published pipeline (Abbas et al. 2023 use
    cluster-uniform keep rates; DeepMind's data-recipe work applies
    the same α-temperature flattening across TOPICS that mT5 applies
    across languages): assign vectors to the deterministic k-means
    clusters, then keep per-cluster quotas ∝ size^α — α < 1 upweights
    small clusters, so the sample covers the embedding space instead
    of mirroring its density.

    Deterministic end to end, same discipline as
    ``corpus.temperature_sample``: pow quantized to 1e-9 longs per
    DISTINCT cluster size, exact integer quota arithmetic (``budget·w
    DIV Σw`` capped at n), keep-order = portable hash
    ``hex32('csample|' || vec_id)`` with vec_id tiebreak. Output:
    (vec_id, cluster, grp_rank, grp_quota) for kept vectors — rank and
    quota visible so the mixture is auditable.

    Scale: the k-means assignment is the same broadcast-centroid
    projection the other IVF/SemDeDup paths use (``assign_np`` twin
    for the vectorized route), cluster sizes are a tiny aggregation,
    the quota join broadcasts, and the rank is ONE cluster-keyed
    window — the grouped-top-k shape; the same mega-group caveats and
    remedies as temperature_sample apply."""
    from teste_carga_avro_vs_json_spark.functions.portable import hex32

    assigned = _semdedup_assigned(emb, n_centroids, iters).select(
        "vec_id", "cluster"
    )
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n")
    )
    weights = sizes.select(
        "cluster",
        "n",
        F.floor(
            F.pow(F.col("n").cast("double"), F.lit(alpha))
            * F.lit(10**9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w"),
    )
    quotas = weights.withColumn(
        "tw", F.sum("w").over(Window.partitionBy(F.lit(1)))
    ).select(
        "cluster",
        F.least(F.expr(f"({budget} * w) DIV tw"), F.col("n")).alias(
            "grp_quota"
        ),
    )
    ranked = assigned.join(F.broadcast(quotas), "cluster").withColumn(
        "_hk",
        hex32(F.concat(F.lit("csample|"), F.col("vec_id").cast("string"))),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("_hk").asc(), F.col("vec_id").asc()
    )
    return (
        ranked.withColumn("grp_rank", F.row_number().over(w))
        .filter(F.col("grp_rank") <= F.col("grp_quota"))
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.col("grp_rank").cast("long").alias("grp_rank"),
            F.col("grp_quota").cast("long").alias("grp_quota"),
        )
    )


def cluster_sample_sql(
    table: str = "embeddings",
    alpha: float = 0.5,
    budget: int = 200,
    n_centroids: int = 16,
    iters: int = 2,
) -> str:
    """DuckDB twin of :func:`cluster_sample` — the k-means replay via
    the shared :func:`_kmeans_assign_ctes` chain, then the
    temperature-quota arithmetic term for term."""
    from teste_carga_avro_vs_json_spark.functions.portable import (
        hex32_sql,
    )

    ctes, _ = _kmeans_assign_ctes(table, n_centroids, iters)
    hk = hex32_sql("'csample|' || a.vec_id::VARCHAR")
    return f"""
        WITH {", ".join(ctes)},
        sizes AS (
            SELECT cluster, COUNT(*)::BIGINT AS n
            FROM assign GROUP BY cluster
        ),
        weights AS (
            SELECT cluster, n,
                   FLOOR(POW(n::DOUBLE, {alpha}) * 1000000000 + 0.5)::BIGINT
                       AS w
            FROM sizes
        ),
        quotas AS (
            SELECT cluster,
                   LEAST(({budget} * w)
                         // (SELECT SUM(w)::BIGINT FROM weights),
                         n) AS grp_quota
            FROM weights
        ),
        ranked AS (
            SELECT a.vec_id, a.cluster, q.grp_quota,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.cluster
                       ORDER BY {hk} ASC, a.vec_id ASC
                   ) AS grp_rank
            FROM assign a JOIN quotas q USING (cluster)
        )
        SELECT vec_id, cluster::BIGINT AS cluster,
               grp_rank::BIGINT AS grp_rank,
               grp_quota::BIGINT AS grp_quota
        FROM ranked WHERE grp_rank <= grp_quota
    """
