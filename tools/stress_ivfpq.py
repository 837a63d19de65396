"""IVF-PQ scale evidence (r12, VERDICT r11 order #4): at sf0.1 (and an
optional replication factor), measure the PQ representation's size
against raw vectors — the claim is ~d/8 BYTES per vector riding the
candidate join instead of d×4 (float32) — plus recall@10 of the
refined ranking vs brute-force exact L2 over the query set.

Usage: python tools/stress_ivfpq.py [replicate] [sf_dir]
Writes one JSON line; redirect to bench_runs/r12_stress_ivfpq.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from teste_carga_avro_vs_json_spark.operators import similarity  # noqa: E402
from teste_carga_avro_vs_json_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("stress-ivfpq")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if replicate > 1:
        # replicas get distinct ids past the original range (the
        # stress convention from stress10x.py)
        n = emb.count()
        emb = emb.unionByName(
            emb.crossJoin(
                spark.range(1, replicate).withColumnRenamed("id", "rep")
            ).select(
                (F.col("vec_id") + F.col("rep") * F.lit(n)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    emb = emb.persist()
    n_vec = emb.count()
    dim = len(emb.select("embedding").first()[0])

    t0 = time.time()
    books = similarity.pq_codebooks(emb, m=8, ksub=16, iters=2)
    t_books = time.time() - t0
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    coded = similarity.pq_encode(v, books, vectorized=True).select(
        "vec_id", F.col("codes").cast("array<tinyint>").alias("codes")
    )
    import tempfile

    raw_dir = tempfile.mkdtemp(prefix="ivfpq_raw_")
    pq_dir = tempfile.mkdtemp(prefix="ivfpq_codes_")
    emb.select("vec_id", "embedding").write.mode("overwrite").parquet(raw_dir)
    t1 = time.time()
    coded.write.mode("overwrite").parquet(pq_dir)
    t_encode = time.time() - t1

    def psize(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    raw_b, pq_b = psize(raw_dir), psize(pq_dir)

    t2 = time.time()
    approx = similarity.ivf_pq_topk(
        emb, vectorized_encode=True
    ).collect()
    t_topk = time.time() - t2

    # recall vs exact L2 over the query subset (numpy, driver-side —
    # evidence computation, not the operator)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    by_q: dict[int, set] = {}
    for r in approx:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    recs = []
    for qi in np.where(ids % 50 == 0)[0]:
        d = ((M - M[qi]) ** 2).sum(axis=1)
        order = [
            ids[j] for j in np.argsort(d, kind="stable") if ids[j] != ids[qi]
        ]
        recs.append(len(set(order[:10]) & by_q.get(ids[qi], set())) / 10)

    print(json.dumps({
        "metric": "stress_ivfpq",
        "replicate": replicate,
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "dim": dim,
        "raw_parquet_bytes": raw_b,
        "pq_parquet_bytes": pq_b,
        "pq_fraction_of_raw": round(pq_b / raw_b, 4),
        "logical_code_bytes_per_vector": 8,  # m=8 codes, <=256 codewords
        "logical_raw_bytes_per_vector": dim * 4,
        "n_queries": len(recs),
        "recall_at_10_refined": round(sum(recs) / len(recs), 4),
        "sec_codebooks": round(t_books, 2),
        "sec_encode_write": round(t_encode, 2),
        "sec_topk": round(t_topk, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
