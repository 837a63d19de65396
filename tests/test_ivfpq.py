"""IVF-PQ ANN (operators/similarity.py, r12): product-quantized
candidate scoring with an exact-integer asymmetric distance and an
IVFADC-R refine stage (Jégou, Douze, Schmid 2011).

Pins: Spark == DuckDB oracle exactly (the codebook CTE replay), the
numpy encode twin is bit-identical to the expression form, recall@10
against brute-force exact L2 (deterministic, so pinned at the measured
value), and the scale contract — raw vectors never ride the candidate
join, refine fetches ids-first via broadcast."""

import re

import numpy as np
import pyspark.sql.functions as F
import pytest

from teste_carga_avro_vs_json_spark.operators import similarity
from teste_carga_avro_vs_json_spark.plans import (
    audit,
    compact_plan,
    expensive_filter_nodes,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _exact_top10(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    out = {}
    for qi in np.where(ids % 50 == 0)[0]:
        d = ((M - M[qi]) ** 2).sum(axis=1)
        order = [
            ids[j] for j in np.argsort(d, kind="stable") if ids[j] != ids[qi]
        ]
        out[ids[qi]] = set(order[:10])
    return out


def test_ivf_pq_matches_duckdb_oracle(spark, emb, sf_dir):
    import duckdb

    got = [
        (r.query_id, r.vec_id, r.dist, r.rank)
        for r in similarity.ivf_pq_topk(emb, n_centroids=16).orderBy("query_id", "rank").collect()
    ]
    d = duckdb.connect()
    d.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = [
        tuple(r)
        for r in d.execute(
            similarity.ivf_pq_topk_sql() + " ORDER BY query_id, rank"
        ).fetchall()
    ]
    assert got == want


def test_pq_encode_np_bit_identical(spark, emb):
    books = similarity.pq_codebooks(emb, m=8, ksub=16, iters=2)
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    expr = {
        r.vec_id: r.codes
        for r in similarity.pq_encode(v, books).select("vec_id", "codes").collect()
    }
    vec = {
        r.vec_id: r.codes
        for r in similarity.pq_encode(v, books, vectorized=True)
        .select("vec_id", "codes")
        .collect()
    }
    assert expr == vec
    # every code addresses a real codeword
    for codes in expr.values():
        assert len(codes) == 8
        for j, c in enumerate(codes):
            assert c in {i for i, _ in books[j]}


def test_ivf_pq_recall_vs_exact(spark, emb):
    """Deterministic end to end, so the measured recall IS the pin:
    ADC-only (refine=None) ranks by 4-bit-per-subspace codes alone —
    lossy (0.25 here) — and the IVFADC-R refine stage recovers almost
    the whole IVF probe ceiling (0.59 vs 0.61 for exact-distance IVF
    with the same probe set)."""
    exact = _exact_top10(emb)

    def recall(df):
        by_q = {}
        for r in df.collect():
            by_q.setdefault(r.query_id, set()).add(r.vec_id)
        recs = [len(exact[q] & by_q.get(q, set())) / 10 for q in exact]
        return sum(recs) / len(recs)

    r_adc = recall(similarity.ivf_pq_topk(emb, n_centroids=16, refine=None))
    r_ref = recall(similarity.ivf_pq_topk(emb, n_centroids=16))
    r_ivf = recall(similarity.ivf_topk(emb))
    assert r_ref >= r_adc
    assert r_adc >= 0.25
    assert r_ref >= 0.59
    # refine can never beat the probe ceiling (same candidate pool)
    assert r_ref <= r_ivf + 1e-9


def test_ivf_pq_plan_carries_codes_not_vectors(spark, emb):
    """The scale pin: the candidate (cluster) join and the ADC dedup
    aggregate move PQ codes, never the 64-double vector; the refine
    fetch broadcasts the tiny shortlist into the corpus scan
    (ids-first); no cartesian, no Python, no expensive filter."""
    out = similarity.ivf_pq_topk(emb, n_centroids=16)
    plan = compact_plan(out)
    aud = audit(out)
    assert aud.cartesian == 0 and aud.bnl_joins == 0
    assert "EvalPython" not in plan
    assert expensive_filter_nodes(out) == []
    # r14: the pair-dedup exchange is GONE by proof, not by accident —
    # one cluster per corpus row × distinct probed clusters per query
    # means the equi-join emits each (query_id, vec_id) at most once
    # (value-pinned by test_ivf_pq_candidates_unique), so no
    # HashAggregate keyed on the pair may reappear between scoring and
    # the rank window.
    assert not any(
        "HashAggregate(keys=[query_id" in ln for ln in plan.splitlines()
    ), "pair-dedup aggregate reappeared (one avoidable exchange)"
    # refine + candidate joins are all broadcast (shortlist/query side
    # tiny); corpus is never the build side of an estimated broadcast
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    # r13 O(m) pin: candidate scoring is LUT element_at lookups — no
    # zip_with fold ever CONSUMES the codes column (subscript access
    # `codes#N[j]`); the r12 form had zip_with(slice(qvec...),
    # element_at(<codebook literal>, codes#N[j] + 1)) per candidate
    # row (O(d) per candidate, VERDICT r12 #1). NB: a collapsed
    # corpus-side Project line legitimately holds both a zip_with
    # (cluster assignment) and the `AS codes#N` output alias — the
    # pin keys on codes being an INPUT to a fold, not on co-location.
    for ln in plan.splitlines():
        if "zip_with" in ln and re.search(r"codes#\d+\[", ln):
            raise AssertionError(f"per-candidate O(d) fold: {ln}")
    assert any(
        "element_at" in ln and re.search(r"codes#\d+\[", ln)
        for ln in plan.splitlines()
    ), "LUT lookup scoring not found in plan"


def test_ivf_pq_candidates_unique(spark, emb):
    """The r14 justification for dropping the pair-dedup exchange: the
    UN-deduplicated ADC-scored candidate stream (refine=None with an
    unbounded k exposes every candidate row) contains each
    (query_id, vec_id) pair exactly once — one cluster per corpus row,
    distinct probed clusters per query. If an algorithm change ever
    reintroduces multi-assignment, this fails before the oracle does."""
    out = similarity.ivf_pq_topk(
        emb, n_centroids=16, refine=None, k=1 << 30
    )
    dup = (
        out.groupBy("query_id", "vec_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_ivf_pq_code_size_is_d_over_8(spark, emb, tmp_path):
    """The PQ memory claim, measured: the (vec_id, cluster, codes)
    frame written to parquet is a fraction of the raw-vector frame —
    codes are m=8 small ints (d/8 logical bytes/vector at d=64 when
    packed; parquet RLE gets close)."""
    import os

    books = similarity.pq_codebooks(emb, m=8, ksub=16, iters=2)
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    coded = similarity.pq_encode(v, books).select(
        "vec_id", F.col("codes").cast("array<tinyint>").alias("codes")
    )
    raw_dir, pq_dir = str(tmp_path / "raw"), str(tmp_path / "pq")
    emb.select("vec_id", "embedding").coalesce(1).write.parquet(raw_dir)
    coded.coalesce(1).write.parquet(pq_dir)

    def psize(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    raw_b, pq_b = psize(raw_dir), psize(pq_dir)
    n = emb.count()
    # raw float32[64] ≈ 256 B/vector payload; codes ≈ 8 B/vector
    assert pq_b < raw_b / 4, (raw_b, pq_b, n)


def test_ivf_pq_score_stream_matches_batch_exactly(spark, emb):
    """r13: the frozen-index streaming scorer (broadcast-model
    pattern) reproduces ivf_pq_topk BIT-EXACTLY for queries drawn from
    the indexed corpus — probe sort, LUT folds, integer ADC sums and
    tie-breaks all replayed — for both the ADC-only and the IVFADC-R
    refined rankings."""
    idx = similarity.collect_ivf_pq_index(
        emb, n_centroids=16, with_vectors=True
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def rows(df):
        return sorted(
            (r.query_id, r.vec_id, r.dist, r.rank) for r in df.collect()
        )

    batch_adc = rows(
        similarity.ivf_pq_topk(emb, n_centroids=16, refine=None)
    )
    stream_adc = rows(
        similarity.ivf_pq_score_stream(queries, idx, refine=None)
    )
    assert stream_adc == batch_adc

    batch_ref = rows(similarity.ivf_pq_topk(emb, n_centroids=16))
    stream_ref = rows(
        similarity.ivf_pq_score_stream(queries, idx, refine=60)
    )
    assert stream_ref == batch_ref


def test_ivf_pq_score_stream_micro_batch(spark, emb, tmp_path):
    """The scorer runs as an actual Structured Streaming projection
    (stateless: no watermark, no state store) and a micro-batch yields
    the same rows as the batch call on the same queries."""
    idx = similarity.collect_ivf_pq_index(emb, n_centroids=16)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    src = str(tmp_path / "qsrc")
    queries.write.parquet(src)
    stream_q = spark.readStream.schema(queries.schema).parquet(src)
    out = similarity.ivf_pq_score_stream(stream_q, idx, refine=None)
    q = (
        out.writeStream.format("memory")
        .queryName("ivfpq_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.query_id, r.vec_id, r.dist, r.rank)
        for r in spark.sql("select * from ivfpq_stream").collect()
    )
    want = sorted(
        (r.query_id, r.vec_id, r.dist, r.rank)
        for r in similarity.ivf_pq_score_stream(
            queries, idx, refine=None
        ).collect()
    )
    assert got == want and len(got) > 0
    # refine without vectors is a loud error, not a silent fallback
    with pytest.raises(ValueError, match="with_vectors"):
        similarity.ivf_pq_score_stream(queries, idx, refine=10)


def test_multi_kmeans_fused_equals_sequential(spark, emb):
    """r13-opt pin: the FUSED multi-space k-means (one shared sample +
    one job per Lloyd iteration for every space) is bit-identical to
    the sequential reference — ivf_centroids run per sliced frame —
    for the exact space layout ivf_pq_topk trains (1 coarse + m
    subspaces), on both assignment paths."""
    dim = len(emb.select("embedding").first()[0])
    m, ksub, dsub = 8, 16, dim // 8
    spaces = [(16, 0, None)] + [(ksub, j * dsub, dsub) for j in range(m)]
    fused = similarity.multi_kmeans(emb, spaces, iters=2)
    seq = [similarity.ivf_centroids(emb, 16, 2)]
    for j in range(m):
        sub = emb.select(
            "vec_id",
            F.slice(
                F.col("embedding").cast("array<double>"),
                j * dsub + 1,
                dsub,
            ).alias("embedding"),
        )
        seq.append(similarity.ivf_centroids(sub, ksub, 2))
    assert fused == seq
    # the pure-expression assignment path folds to the same centroids
    assert similarity.multi_kmeans(emb, spaces, iters=2, vectorized=False) == seq
