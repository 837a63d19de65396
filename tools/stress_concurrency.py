"""Multi-writer stress for the r11 optimistic-concurrency work: real
racing threads, not staged interleavings.

Storm shape against ONE key-clustered snapshot table:

- A appender threads x n_ops appends each, every append a UNIQUE key
  block (the multi-writer ingest pattern — appends always win via the
  `_publish_files` retry loop);
- M merger threads x n_ops keyed merges each over DISJOINT base-key
  ranges (the concurrent MERGE pattern — a lost race rebases past
  pure-append winners internally, and only a genuinely overlapping
  winner surfaces `SnapshotConflictError` for the caller loop);
- one maintainer thread running `snapshot_maintain` mid-storm (reorg
  overwrites FOLD concurrent appends in instead of dropping them —
  the r11 fix for the silent-loss window).

Verified EXACT at the end: row count == base + every appended block
(nothing lost to any interleaving), every merger's final tag landed on
its whole key range, per-block append counts intact. Reported:
caller-visible conflict retries, internal rebases (a merge whose
committed version is > entry_head + 1 rebased past winners), and
maintain outcomes.

Usage: python tools/stress_concurrency.py [replicas] [n_ops]
Emits one JSON line (commit to bench_runs/r{N}_stress_concurrency.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import maintenance as mt
from teste_carga_avro_vs_json_spark.session import get_spark


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-concurrency")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base_docs = docs.count()
    big = docs
    for i in range(1, replicas):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
        )
    tdir = os.path.join(tempfile.mkdtemp(prefix="stress_conc_"), "t")
    t0 = time.perf_counter()
    mt.snapshot_commit(big, tdir)
    mt.snapshot_cluster_by(spark, tdir, "doc_id", n_files=32)
    out = {
        "replicas": replicas,
        "base_rows": n_base_docs * replicas,
        "n_ops": n_ops,
        "build_sec": round(time.perf_counter() - t0, 2),
    }

    append_block = 500  # rows per appended block
    n_appenders, n_mergers = 4, 2
    stats = {
        "appends_done": 0,
        "merges_done": 0,
        "caller_conflict_retries": 0,
        "internal_rebases": 0,
        "maintain_runs": [],
        "errors": [],
    }
    lock = threading.Lock()
    # base doc_ids are the sf docs' ids; mergers update disjoint slices
    base_ids = sorted(
        r[0] for r in docs.select("doc_id").limit(400).collect()
    )
    merge_slices = [base_ids[:200], base_ids[200:400]]

    def appender(t: int) -> None:
        try:
            for i in range(n_ops):
                lo = 100_000_000 + t * 1_000_000 + i * 100_000
                block = spark.range(lo, lo + append_block).select(
                    F.col("id").alias("doc_id"),
                    F.lit(f"app-{t}-{i}").alias("text"),
                )
                mt.snapshot_commit(block, tdir, mode="append")
                with lock:
                    stats["appends_done"] += 1
        except Exception as exc:  # pragma: no cover - diagnostics
            with lock:
                stats["errors"].append(f"appender{t}: {exc!r}")

    def merger(t: int) -> None:
        ids = merge_slices[t]
        try:
            for i in range(n_ops):
                delta = (
                    spark.createDataFrame(
                        [(int(d),) for d in ids], "doc_id long"
                    ).withColumn("text", F.lit(f"m-{t}-{i}"))
                )
                for _retry in range(30):
                    entry_head = mt.snapshot_versions(tdir)[-1]
                    try:
                        r = mt.snapshot_merge(
                            delta, tdir, keys=["doc_id"]
                        )
                        with lock:
                            stats["merges_done"] += 1
                            if r["version"] > entry_head + 1:
                                stats["internal_rebases"] += 1
                        break
                    except mt.SnapshotConflictError:
                        with lock:
                            stats["caller_conflict_retries"] += 1
                        time.sleep(0.05)
                else:
                    raise RuntimeError("merge retry budget exhausted")
        except Exception as exc:  # pragma: no cover - diagnostics
            with lock:
                stats["errors"].append(f"merger{t}: {exc!r}")

    def maintainer() -> None:
        for _ in range(2):
            time.sleep(1.5)
            for _retry in range(30):
                try:
                    r = mt.snapshot_maintain(spark, tdir)
                    with lock:
                        stats["maintain_runs"].append(
                            {"acted": r["acted"], "reason": r["reason"]}
                        )
                    break
                except mt.SnapshotConflictError:
                    with lock:
                        stats["caller_conflict_retries"] += 1
                    time.sleep(0.1)

    threads = (
        [threading.Thread(target=appender, args=(t,))
         for t in range(n_appenders)]
        + [threading.Thread(target=merger, args=(t,))
           for t in range(n_mergers)]
        + [threading.Thread(target=maintainer)]
    )
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    out["storm_sec"] = round(time.perf_counter() - t0, 2)
    out.update(stats)

    # ---- exactness: nothing lost to ANY interleaving
    head = mt.snapshot_read(spark, tdir)
    expected_rows = (
        n_base_docs * replicas
        + n_appenders * n_ops * append_block
    )
    got_rows = head.count()
    out["expected_rows"] = expected_rows
    out["rows"] = got_rows
    ok = got_rows == expected_rows and not stats["errors"]
    # every appended block intact
    n_app_rows = head.where("doc_id >= 100000000").count()
    out["append_rows_ok"] = (
        n_app_rows == n_appenders * n_ops * append_block
    )
    ok = ok and out["append_rows_ok"]
    # each merger's final tag owns its whole slice
    for t in range(n_mergers):
        tag = f"m-{t}-{n_ops - 1}"
        n_tag = head.where(F.col("text") == tag).count()
        out[f"merger{t}_final_tag_rows"] = n_tag
        ok = ok and n_tag == len(merge_slices[t])
    out["exact"] = ok
    out["versions"] = len(mt.snapshot_versions(tdir))

    # ---- phase 2: appends-only vs ONE merger — every lost race has a
    # pure-append winner chain, so the internal rebase path itself
    # carries the load (phase 1's mixed storm mostly conflicts, since
    # any merge/reorg in the winner chain rightly raises)
    p2 = {
        "appends_done": 0, "merges_done": 0,
        "caller_conflict_retries": 0, "internal_rebases": 0,
        "errors": [],
    }

    def p2_appender(t: int) -> None:
        try:
            for i in range(3):
                lo = 200_000_000 + t * 1_000_000 + i * 100_000
                block = spark.range(lo, lo + append_block).select(
                    F.col("id").alias("doc_id"),
                    F.lit(f"p2app-{t}-{i}").alias("text"),
                )
                mt.snapshot_commit(block, tdir, mode="append")
                with lock:
                    p2["appends_done"] += 1
        except Exception as exc:  # pragma: no cover - diagnostics
            with lock:
                p2["errors"].append(f"p2appender{t}: {exc!r}")

    def p2_merger() -> None:
        try:
            for i in range(3):
                delta = spark.createDataFrame(
                    [(int(d),) for d in base_ids[:200]], "doc_id long"
                ).withColumn("text", F.lit(f"p2m-{i}"))
                for _retry in range(30):
                    entry_head = mt.snapshot_versions(tdir)[-1]
                    try:
                        r = mt.snapshot_merge(delta, tdir, keys=["doc_id"])
                        with lock:
                            p2["merges_done"] += 1
                            if r["version"] > entry_head + 1:
                                p2["internal_rebases"] += 1
                        break
                    except mt.SnapshotConflictError:
                        with lock:
                            p2["caller_conflict_retries"] += 1
                        time.sleep(0.05)
                else:
                    raise RuntimeError("p2 merge retry budget exhausted")
        except Exception as exc:  # pragma: no cover - diagnostics
            with lock:
                p2["errors"].append(f"p2merger: {exc!r}")

    threads2 = [
        threading.Thread(target=p2_appender, args=(t,)) for t in range(4)
    ] + [threading.Thread(target=p2_merger)]
    t0 = time.perf_counter()
    for th in threads2:
        th.start()
    for th in threads2:
        th.join()
    out["p2_sec"] = round(time.perf_counter() - t0, 2)
    out["p2"] = p2
    head2 = mt.snapshot_read(spark, tdir)
    expected2 = expected_rows + 4 * 3 * append_block
    out["p2_rows"] = head2.count()
    out["p2_expected_rows"] = expected2
    p2_ok = (
        out["p2_rows"] == expected2
        and not p2["errors"]
        and head2.where(F.col("text") == "p2m-2").count() == 200
    )
    out["p2_exact"] = p2_ok
    ok = ok and p2_ok

    # ---- phase 3 (r13, VERDICT order #3): MIXED mor deletes + keyed
    # merges + appends racing. The mor deleter targets appended-block
    # keys (files disjoint from the merger's base-key slice), so the
    # DV-aware rebase lets BOTH sides commit without caller retries in
    # the common case; genuinely overlapping interleavings (a merge
    # that rewrote a file the delete's DVs target) still conflict and
    # land in the caller retry counter.
    p3 = {
        "deletes_done": 0, "merges_done": 0, "appends_done": 0,
        "caller_conflict_retries": 0, "internal_rebases": 0,
        "errors": [],
    }
    del_keys = [200_000_000 + 7 * k for k in range(3)]  # p2app-0-0 rows

    def p3_deleter() -> None:
        try:
            for key in del_keys:
                for _retry in range(30):
                    try:
                        r = mt.snapshot_delete(
                            spark, tdir, f"doc_id = {key}", mode="mor"
                        )
                        with lock:
                            p3["deletes_done"] += r["rows_deleted"]
                        break
                    except mt.SnapshotConflictError:
                        with lock:
                            p3["caller_conflict_retries"] += 1
                        time.sleep(0.05)
                else:
                    raise RuntimeError("p3 delete retry budget exhausted")
        except Exception as exc:  # pragma: no cover - diagnostics
            with lock:
                p3["errors"].append(f"p3deleter: {exc!r}")

    def p3_merger() -> None:
        try:
            for i in range(3):
                delta = spark.createDataFrame(
                    [(int(d),) for d in base_ids[200:400]], "doc_id long"
                ).withColumn("text", F.lit(f"p3m-{i}"))
                for _retry in range(30):
                    entry_head = mt.snapshot_versions(tdir)[-1]
                    try:
                        r = mt.snapshot_merge(delta, tdir, keys=["doc_id"])
                        with lock:
                            p3["merges_done"] += 1
                            if r["version"] > entry_head + 1:
                                p3["internal_rebases"] += 1
                        break
                    except mt.SnapshotConflictError:
                        with lock:
                            p3["caller_conflict_retries"] += 1
                        time.sleep(0.05)
                else:
                    raise RuntimeError("p3 merge retry budget exhausted")
        except Exception as exc:  # pragma: no cover - diagnostics
            with lock:
                p3["errors"].append(f"p3merger: {exc!r}")

    def p3_appender() -> None:
        try:
            for i in range(3):
                lo = 300_000_000 + i * 100_000
                block = spark.range(lo, lo + append_block).select(
                    F.col("id").alias("doc_id"),
                    F.lit(f"p3app-{i}").alias("text"),
                )
                mt.snapshot_commit(block, tdir, mode="append")
                with lock:
                    p3["appends_done"] += 1
        except Exception as exc:  # pragma: no cover - diagnostics
            with lock:
                p3["errors"].append(f"p3appender: {exc!r}")

    threads3 = [
        threading.Thread(target=p3_deleter),
        threading.Thread(target=p3_merger),
        threading.Thread(target=p3_appender),
    ]
    t0 = time.perf_counter()
    for th in threads3:
        th.start()
    for th in threads3:
        th.join()
    out["p3_sec"] = round(time.perf_counter() - t0, 2)
    out["p3"] = p3
    head3 = mt.snapshot_read(spark, tdir)
    expected3 = expected2 - len(del_keys) + 3 * append_block
    out["p3_rows"] = head3.count()
    out["p3_expected_rows"] = expected3
    p3_ok = (
        out["p3_rows"] == expected3
        and not p3["errors"]
        and p3["deletes_done"] == len(del_keys)
        and head3.where(
            F.col("doc_id").isin([int(k) for k in del_keys])
        ).count() == 0
        and head3.where(F.col("text") == "p3m-2").count() == 200
    )
    out["p3_exact"] = p3_ok
    ok = ok and p3_ok
    print(json.dumps(out))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
