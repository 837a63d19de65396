"""Change-feed + replication stress: prove CDC is O(changes).

Builds an Nx-replicated, key-clustered snapshot table (sf0.1
documents, default 30x), bootstraps + clusters a replica (the same
OPTIMIZE-after-load a production replica runs — an UNCLUSTERED
replica degrades toward full rewrites; verified: 1.0 fraction), then
measures the two claims that matter at 100 TB:

1. ``snapshot_changes`` touches only CHANGE SOURCES (commit-time
   change files, added files, delete-vector slices):
   ``change_source_bytes_fraction`` is their manifest bytes over
   table bytes — the feed never reads, let alone diffs, the table.
2. each ``snapshot_replicate`` sync is ONE destination merge whose
   rewrite is bounded by the affected clustered files — a benign sync
   (contiguous updates + inserts + an append block) rewrites ~1 file,
   and the adversarial scatter (one mor-deleted key per replica
   block, hitting EVERY clustered range) stays at min(K, files), the
   stress_merge worst-case bound.

Both ends are verified EXACT (replica multiset == source head; change
rows == expected per class).

Usage: python tools/stress_cdc.py [replicas] [k_keys]
Emits one JSON line (commit to bench_runs/r{N}_stress_cdc.json).
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


def _multiset_equal(a, b) -> bool:
    return (
        a.exceptAll(b).count() == 0
        and b.exceptAll(a).count() == 0
        and a.count() == b.count()
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    k_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-cdc")
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
    tdir = tempfile.mkdtemp(prefix="stress_cdc_")
    src = os.path.join(tdir, "src")
    dst = os.path.join(tdir, "dst")

    t0 = time.perf_counter()
    mt.snapshot_commit(big, src)
    n_files = max(32, replicas)
    mt.snapshot_cluster_by(spark, src, "doc_id", n_files=n_files)
    build_sec = time.perf_counter() - t0
    n_rows = n_base * replicas
    base_version = mt.snapshot_versions(src)[-1]
    table_bytes = mt._read_manifest(src, base_version)["n_bytes"]
    out = {
        "replicas": replicas,
        "rows": n_rows,
        "k_keys": k_keys,
        "table_bytes": table_bytes,
        "build_cluster_sec": round(build_sec, 2),
    }

    # bootstrap the replica (the one intentionally O(table) step),
    # then cluster it on the merge key
    t0 = time.perf_counter()
    r0 = mt.snapshot_replicate(spark, src, dst, keys=["doc_id"])
    mt.snapshot_cluster_by(spark, dst, "doc_id", n_files=n_files)
    out["bootstrap_sec"] = round(time.perf_counter() - t0, 2)
    out["bootstrap_rows"] = r0["rows_upserted"]

    def _sync(tag: str) -> dict:
        """One replicate call, instrumented: wall, applied rows, and
        how much of the destination actually rewrote."""
        pre = mt.snapshot_versions(dst)[-1]
        files_pre = {
            f["path"]: f["bytes"]
            for f in mt._read_manifest(dst, pre)["files"]
        }
        t1 = time.perf_counter()
        r = mt.snapshot_replicate(spark, src, dst, keys=["doc_id"])
        out[f"{tag}_sec"] = round(time.perf_counter() - t1, 2)
        head_files = {
            f["path"]
            for f in mt._read_manifest(
                dst, mt.snapshot_versions(dst)[-1]
            )["files"]
        }
        kept = head_files & set(files_pre)
        out[f"{tag}_upserts"] = r["rows_upserted"]
        out[f"{tag}_deletes"] = r["rows_deleted"]
        out[f"{tag}_files_rewritten"] = len(files_pre) - len(kept)
        out[f"{tag}_files_total"] = len(files_pre)
        out[f"{tag}_bytes_rewritten_fraction"] = round(
            sum(b for p, b in files_pre.items() if p not in kept)
            / max(1, sum(files_pre.values())),
            4,
        )
        return r

    # churn part A: K-key merge (updates in one clustered run + fresh
    # inserts) and an append block — the benign recurring shape
    ids = [
        int(r.doc_id)
        for r in mt.snapshot_read(spark, src)
        .select("doc_id").orderBy("doc_id").limit(k_keys).collect()
    ]
    n_ins = k_keys // 4
    delta = spark.createDataFrame(
        [(i, f"cdc updated text {i}") for i in ids]
        + [
            (2_000_000_000 + j, f"cdc inserted text {j}")
            for j in range(n_ins)
        ],
        "doc_id long, text string",
    )
    res_m = mt.snapshot_merge(delta, src, keys=["doc_id"])
    n_app = n_base // 2
    appended = docs.limit(n_app).select(
        (F.col("doc_id") + F.lit(3_000_000_000)).alias("doc_id"), "text"
    )
    mt.snapshot_commit(appended, src, mode="append")

    sync1 = _sync("sync_benign")
    benign_bounded = (
        sync1["rows_deleted"] == 0
        and out["sync_benign_files_rewritten"]
        <= max(3, out["sync_benign_files_total"] // 8)
    )
    out["benign_bounded"] = benign_bounded

    # churn part B — ADVERSARIAL scatter: one mor-deleted key per
    # replica block, so EVERY clustered range is hit and the sync
    # bound degrades to min(K, files) by construction
    base_mid = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    del_ids = [
        int(base_mid + i * 10_000_000)
        for i in range(min(k_keys, replicas))
    ]
    cond = "doc_id in (%s)" % ",".join(str(i) for i in del_ids)
    res_d = mt.snapshot_delete(spark, src, cond, mode="mor")
    head = mt.snapshot_versions(src)[-1]

    # claim 1: the feed reads change sources only -------------------
    src_bytes = 0
    for v in range(base_version + 1, head + 1):
        m = mt._read_manifest(src, v)
        pm = mt._read_manifest(src, v - 1)
        if m["op"] == "append":
            parent = {f["path"] for f in pm["files"]}
            src_bytes += sum(
                f["bytes"]
                for f in m["files"]
                if f["path"] not in parent
            )
        elif m["op"] == "delete-mor":
            parent_dv = {
                f["path"]
                for f in (pm.get("dv") or {}).get("files", [])
            }
            src_bytes += sum(
                f["bytes"]
                for f in (m.get("dv") or {}).get("files", [])
                if f["path"] not in parent_dv
            )
        else:
            src_bytes += sum(
                f["bytes"] for f in (m.get("cdf") or {}).get("files", [])
            )
    out["change_source_bytes"] = src_bytes
    out["change_source_bytes_fraction"] = round(
        src_bytes / max(1, table_bytes), 4
    )

    t0 = time.perf_counter()
    ch = mt.snapshot_changes(spark, src, base_version, head)
    by_type = {
        r[0]: r[1]
        for r in ch.groupBy(mt.CHANGE_TYPE_COL).count().collect()
    }
    out["feed_read_sec"] = round(time.perf_counter() - t0, 2)
    out["feed_rows_by_type"] = by_type
    feed_exact = (
        by_type.get("update_preimage", 0) == res_m["rows_replaced"]
        and by_type.get("update_postimage", 0) == res_m["rows_replaced"]
        and by_type.get("insert", 0) == res_m["rows_inserted"] + n_app
        and by_type.get("delete", 0) == res_d["rows_deleted"]
    )
    out["feed_exact"] = feed_exact

    # claim 2b: the scatter sync stays within min(K, files) ---------
    sync2 = _sync("sync_scatter")
    scatter_bounded = (
        sync2["rows_deleted"] == res_d["rows_deleted"]
        and 0
        < out["sync_scatter_files_rewritten"]
        <= min(len(del_ids), out["sync_scatter_files_total"])
    )
    out["scatter_bounded"] = scatter_bounded
    # bootstrap + cluster + 2 syncs
    out["dst_versions"] = len(mt.snapshot_versions(dst))

    t0 = time.perf_counter()
    replica_exact = _multiset_equal(
        mt.snapshot_read(spark, dst), mt.snapshot_read(spark, src)
    )
    out["verify_sec"] = round(time.perf_counter() - t0, 2)
    out["replica_exact"] = replica_exact

    out["exact"] = bool(
        feed_exact
        and replica_exact
        and benign_bounded
        and scatter_bounded
        and out["dst_versions"] == 4
    )
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 1)
    except OSError:
        pass
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
