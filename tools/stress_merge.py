"""Merge-at-scale stress: prove the copy-on-write bound.

Builds an Nx-replicated snapshot table (sf0.1 documents, default 30x
= 1.5M rows), clusters it on the merge key, then applies a K-key
upsert and records what ACTUALLY rewrote — the claim under test is
O(affected files + delta), never O(corpus): files_rewritten must stay
~= the number of clustered files holding the K keys (reported as the
BYTES-rewritten fraction, the metric that scales to 100 TB; wall at
fixture size is Spark fixed costs), a scattered adversarial delta
stays bounded by min(K, files), and time travel must keep the
pre-merge version exact.

Usage: python tools/stress_merge.py [replicas] [k_keys]
Emits one JSON line (commit to bench_runs/r{N}_stress_merge.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import maintenance as mt
from teste_carga_avro_vs_json_spark.session import get_spark


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    k_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-merge")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = docs.count()
    big = docs
    for i in range(1, replicas):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
        )
    tdir = tempfile.mkdtemp(prefix="stress_merge_")
    table = os.path.join(tdir, "table")

    t0 = time.perf_counter()
    mt.snapshot_commit(big, table)
    n_files = max(32, replicas)
    cluster = mt.snapshot_cluster_by(spark, table, "doc_id", n_files=n_files)
    build_sec = time.perf_counter() - t0
    n_rows = n_base * replicas
    pre_version = mt.snapshot_versions(table)[-1]
    table_bytes = mt._read_manifest(table, pre_version)["n_bytes"]
    out = {
        "replicas": replicas,
        "rows": n_rows,
        "k_keys": k_keys,
        "clustered_files": cluster["output_files"],
        "table_bytes": table_bytes,
        "build_cluster_sec": round(build_sec, 2),
    }

    # K keys drawn from ONE contiguous doc_id run per replica block so
    # the clustered bound is visible but not trivial (keys span
    # several files, never all)
    ids = [int(r.doc_id) for r in (
        mt.snapshot_read(spark, table)
        .select("doc_id").orderBy("doc_id").limit(k_keys).collect()
    )]
    delta = spark.createDataFrame(
        [(i, f"merged text for {i} with several replacement words")
         for i in ids],
        "doc_id long, text string",
    )
    t0 = time.perf_counter()
    res = mt.snapshot_merge(delta, table, keys=["doc_id"])
    out["merge_sec"] = round(time.perf_counter() - t0, 2)
    out["files_rewritten"] = res["files_rewritten"]
    out["files_kept"] = res["files_kept"]
    out["rows_replaced"] = res["rows_replaced"]
    out["rewrite_fraction"] = round(
        res["files_rewritten"]
        / max(1, res["files_rewritten"] + res["files_kept"]),
        4,
    )
    # the honest scale metric: BYTES rewritten vs table bytes — wall
    # at this fixture size is dominated by Spark fixed costs, but the
    # byte fraction is exactly what scales to 100 TB
    m_pre = mt._read_manifest(table, pre_version)
    kept_paths = {f["path"] for f in m_pre["files"]} & {
        f["path"]
        for f in mt._read_manifest(table, res["version"])["files"]
    }
    rewritten_bytes = sum(
        f["bytes"] for f in m_pre["files"] if f["path"] not in kept_paths
    )
    out["bytes_rewritten"] = rewritten_bytes
    out["bytes_rewritten_fraction"] = round(
        rewritten_bytes / max(1, table_bytes), 4
    )

    # correctness at volume: row count unchanged, replaced keys carry
    # the new text, time travel shows the pre-merge table exactly
    latest = mt.snapshot_read(spark, table)
    out["rows_after"] = latest.count()
    out["keys_updated"] = latest.where(
        F.col("text").startswith("merged text for ")
    ).count()
    old = mt.snapshot_read(spark, table, pre_version)
    out["old_version_untouched"] = (
        old.where(F.col("text").startswith("merged text for ")).count() == 0
        and old.count() == n_rows
    )

    # adversarial shape: K keys scattered ONE PER REPLICA BLOCK (each
    # lands in a different clustered range) — the bound degrades to
    # min(K, files), never to the whole table
    base_mid = int(
        docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    )  # an id present in EVERY replica block
    scattered_ids = [
        int(base_mid + i * 10_000_000) for i in range(min(k_keys, replicas))
    ]
    delta2 = spark.createDataFrame(
        [(i, f"scattered merge {i}") for i in scattered_ids],
        "doc_id long, text string",
    )
    t0 = time.perf_counter()
    res2 = mt.snapshot_merge(delta2, table, keys=["doc_id"])
    out["scattered_merge_sec"] = round(time.perf_counter() - t0, 2)
    out["scattered_keys"] = len(scattered_ids)
    out["scattered_files_rewritten"] = res2["files_rewritten"]
    out["scattered_rows_replaced"] = res2["rows_replaced"]
    out["scattered_bound_holds"] = (
        res2["rows_replaced"] == len(scattered_ids)
        and 0 < res2["files_rewritten"] <= min(
            len(scattered_ids), out["clustered_files"]
        )
    )

    # merge-on-read lane: deleting the same scattered keys must write
    # ~nothing (one DV file, zero data rewrites) where cow would have
    # rewritten min(K, files) whole files; the read-side anti-join
    # overhead is measured against the pre-delete scan, and compaction
    # folds the DVs away exactly
    rows_before_mor = mt.snapshot_read(spark, table).count()
    del_ids = scattered_ids[: min(len(scattered_ids), 200)]
    cond = "doc_id in (%s)" % ",".join(str(i) for i in del_ids)
    t0 = time.perf_counter()
    res3 = mt.snapshot_delete(spark, table, cond, mode="mor")
    out["mor_delete_sec"] = round(time.perf_counter() - t0, 2)
    out["mor_files_rewritten"] = res3["files_rewritten"]
    out["mor_rows_deleted"] = res3["rows_deleted"]
    head = mt._read_manifest(table, mt.snapshot_versions(table)[-1])
    out["mor_dv_bytes"] = sum(f["bytes"] for f in head["dv"]["files"])
    t0 = time.perf_counter()
    rows_after_mor = mt.snapshot_read(spark, table).count()
    out["mor_read_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    mt.snapshot_read(
        spark, table, mt.snapshot_versions(table)[-2]  # pre-delete head
    ).count()
    out["clean_read_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    mt.snapshot_compact(spark, table)
    out["mor_compact_sec"] = round(time.perf_counter() - t0, 2)
    folded = mt._read_manifest(table, mt.snapshot_versions(table)[-1])
    out["mor_exact"] = (
        res3["files_rewritten"] == 0
        and res3["rows_deleted"] == len(del_ids)
        and rows_after_mor == rows_before_mor - len(del_ids)
        and "dv" not in folded
        and mt.snapshot_read(spark, table).count() == rows_after_mor
    )

    out["exact"] = (
        out["rows_after"] == n_rows
        and out["keys_updated"] == res["rows_replaced"] == k_keys
        and bool(out["old_version_untouched"])
        and bool(out["mor_exact"])
    )
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 1)
    except OSError:
        pass
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
