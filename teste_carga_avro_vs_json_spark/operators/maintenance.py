"""Dataset maintenance — the housekeeping a 100 TB parquet corpus
needs between pipeline runs: small-file compaction and sort-based
clustering for scan locality. The reference engine writes flat files
with no layout management (SURVEY.md §2.2 — no table maintenance);
these are the standard lakehouse operations (Delta/Iceberg
OPTIMIZE / ZORDER are the productized forms) re-expressed as plain
Spark primitives over plain parquet directories.

Why these matter at scale:

- **Compaction** (`compact`): a streaming or per-batch ingest leaves
  thousands of KB-sized files; every one costs a scheduler task, a
  file-open round-trip and a footer read. Target-sized output files
  restore O(bytes / target) task counts. Implemented as
  ``coalesce(n)`` — a NARROW repartitioning (no shuffle: partitions
  are concatenated, never rehashed) sized from the dataset's actual
  on-disk bytes; only the rarer split direction (more files than scan
  partitions) pays one round-robin shuffle.
- **Clustering** (`cluster_by`): ``repartitionByRange(col) +
  sortWithinPartitions(col)`` gives every output file a tight,
  pairwise-disjoint min/max range on the cluster key, which parquet
  records in its footer statistics — so a point/range predicate on
  that key prunes whole files (and row groups) at planning time
  instead of scanning. One range shuffle, total ordering across
  files; the sampled range boundaries make output sizes balanced
  even on skewed keys.

Both preserve content EXACTLY (multiset equality pinned in
``tests/test_maintenance.py``; the clustering pin additionally reads
the parquet footers back with pyarrow and asserts the per-file
min/max ranges are disjoint — the pruning property itself, not a
proxy for it).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def _dataset_bytes(spark: SparkSession, src_dir: str) -> int:
    """Total on-disk bytes of a parquet dataset's data files, via the
    same file listing the scan will use (``inputFiles``) — works for
    local paths (the test/bench environment); a DFS deployment swaps
    in the FileSystem API behind this one helper."""
    total = 0
    for uri in spark.read.parquet(src_dir).inputFiles():
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            total += os.path.getsize(path)
        except OSError:
            pass
    return total


def plan_output_files(total_bytes: int, target_mb: float) -> int:
    """ceil(bytes / target), floored at 1 — pure so it is testable.
    ``target_mb`` may be fractional (small fixtures / tests)."""
    return max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_mb: float = 256,
) -> dict:
    """Rewrite ``src_dir`` as ``ceil(bytes/target_mb)`` parquet files
    in ``dst_dir``. Narrow plan: ``coalesce`` concatenates input
    partitions without a shuffle (row order within partitions is
    preserved; no key movement). Returns audit stats — the
    no-silent-caps convention: report what the rewrite did."""
    df = spark.read.parquet(src_dir)
    in_files = len(df.inputFiles())
    total = _dataset_bytes(spark, src_dir)
    n_out = plan_output_files(total, target_mb)
    # The scan itself bundles small files into <= maxPartitionBytes
    # partitions, so the common (merge) direction is a narrow
    # ``coalesce``. If the plan needs MORE files than the scan has
    # partitions (splitting oversized files), a narrow op cannot
    # create partitions — that direction genuinely requires one
    # round-robin shuffle, exactly as lakehouse OPTIMIZE does.
    n_scan = df.rdd.getNumPartitions()
    shaped = df.coalesce(n_out) if n_out <= n_scan else df.repartition(n_out)
    shaped.write.mode("overwrite").parquet(dst_dir)
    out_files = len(spark.read.parquet(dst_dir).inputFiles())
    return {
        "input_files": in_files,
        "input_bytes": total,
        "planned_files": n_out,
        "output_files": out_files,
        "shuffled": n_out > n_scan,
    }


def cluster_by(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    col: str,
    n_files: int | None = None,
    target_mb: float = 256,
) -> dict:
    """Rewrite ``src_dir`` range-clustered on ``col``: one range
    shuffle (sampled boundaries → balanced files even on skew), sorted
    within partitions, so every output file carries a tight disjoint
    [min, max] footer range on ``col`` and predicate pushdown prunes
    files instead of scanning them."""
    df = spark.read.parquet(src_dir)
    if n_files is None:
        n_files = plan_output_files(_dataset_bytes(spark, src_dir), target_mb)
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
    out_files = len(spark.read.parquet(dst_dir).inputFiles())
    return {"planned_files": n_files, "output_files": out_files}


def file_ranges(dst_dir: str, col: str) -> list[tuple[str, object, object]]:
    """Read back every data file's parquet FOOTER statistics for
    ``col`` — [(file, min, max)] — via pyarrow. This is the pruning
    contract itself: what a scan's predicate pushdown consults."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(dst_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(dst_dir, name)
        md = pq.read_metadata(path)
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((name, lo, hi))
    return out


def _zvalue_col(bucket_cols: list, bits: int):
    """Interleave the low ``bits`` bits of N bucket-index columns into
    one Morton (Z-curve) value — fixed-width JVM bit arithmetic, a
    pure projection (never filtered on, so no expensive-filter risk)."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(c.cast("long"), i).bitwiseAND(
                        F.lit(1)
                    ),
                    i * n + j,
                )
            )
    return z


def zorder_by(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    cols: list[str],
    n_files: int | None = None,
    target_mb: float = 256,
    bits: int = 6,
) -> dict:
    """Multi-column clustering via a Morton (Z-order) curve — the
    lakehouse ZORDER: single-column range clustering gives perfect
    pruning on ONE key and none on the others; interleaving the
    quantile-bucket bits of each key makes every output file cover a
    small hyper-rectangle of the key space, so footer min/max ranges
    prune usefully on EVERY listed column at once.

    Per column: 2^bits QUANTILE boundaries from ``approxQuantile``
    (driver-side, 2^bits doubles — bounded; quantile buckets, not
    equal-width, so skewed keys still fill the curve evenly, the same
    choice Delta's ZORDER makes via range_partition_id). The bucket
    lookup is a fold over the broadcast-constant boundary array —
    O(2^bits) interpreted per row, which is why ``bits`` defaults to
    6: 64 buckets/column = 4096 z-cells for two columns, far more
    granularity than file-level pruning can use (cells >> files), at
    63 compares/row. Do NOT raise bits past ~8 without moving the
    lookup JVM-side (the k-means HOF-fold lesson). Then
    bit-interleave → one range shuffle on the z-value + sort within
    partitions. Content preserved exactly (multiset pin in tests);
    pruning asserted by reading the per-file footer statistics back,
    same contract as :func:`cluster_by`."""
    df = spark.read.parquet(src_dir)
    if n_files is None:
        n_files = plan_output_files(_dataset_bytes(spark, src_dir), target_mb)
    n_buckets = 1 << bits
    bucket_exprs = []
    for c in cols:
        qs = df.stat.approxQuantile(
            c, [i / n_buckets for i in range(1, n_buckets)], 0.001
        )
        # strictly increasing boundary list (dedup ties) keeps the
        # bucket lookup a sorted-array search
        bounds = sorted(set(qs))
        arr = F.array(*[F.lit(b) for b in bounds])
        # bucket = count of boundaries <= value: a fixed-size fold on a
        # broadcast-constant array, row-local
        bucket = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(c) >= b, F.lit(1)).otherwise(F.lit(0)),
        )
        bucket_exprs.append(F.coalesce(bucket, F.lit(0)))
    z = _zvalue_col(bucket_exprs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
    out_files = len(spark.read.parquet(dst_dir).inputFiles())
    return {"planned_files": n_files, "output_files": out_files}
