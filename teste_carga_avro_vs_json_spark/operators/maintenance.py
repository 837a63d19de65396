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
    (
        _zorder_frame(df, cols, n_files, bits)
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
    out_files = len(spark.read.parquet(dst_dir).inputFiles())
    return {"planned_files": n_files, "output_files": out_files}


def _zorder_frame(
    df: DataFrame, cols: list[str], n_files: int, bits: int
) -> DataFrame:
    """The Z-order rewrite as a frame transform (shared by
    :func:`zorder_by` and :func:`snapshot_zorder_by`)."""
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
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


# ----------------------------------------------------------- snapshots
#
# Versioned table snapshots — a minimal TRANSACTION LOG over plain
# parquet, the mechanism behind Delta/Iceberg time travel re-expressed
# as first principles: data files are immutable, each commit writes
# its files into a fresh subdirectory and then publishes ONE manifest
# json listing the full file set of that version. The manifest write
# is the commit point — data directories without a manifest are
# invisible to readers (a crashed writer leaves garbage, never a
# half-visible table). Readers pin a version by reading its manifest's
# explicit file list, so concurrent compaction/vacuum never moves data
# under a running query — the core correctness property a mutable
# 100 TB corpus needs between pipeline runs.
#
# Concurrency (r9, VERDICT order #8): concurrent APPENDS are safe.
# Each commit writes its data files into a dir unique to the ATTEMPT
# (``data/c-<unique>/``, mkdtemp — never keyed by the version number,
# so two racing writers cannot clobber each other's parquet), then
# publishes manifest vN+1 with create-exclusive semantics (os.link of
# a private tmp onto the final name — fails atomically with EEXIST if
# another writer already committed that version). The loser re-reads
# the new latest manifest, recomputes its file list, and retries the
# next version number — exactly the optimistic-concurrency loop
# Delta/Iceberg run against a conditional-put object store. Bounded
# retries; exhaustion raises SnapshotConflictError. ``overwrite``
# retries the same way (last overwrite wins — a linear history is
# still produced; cross-writer semantic conflicts, e.g. overwrite vs
# append of the same logical rows, are the caller's domain, as in any
# log store).

class SnapshotConflictError(RuntimeError):
    """Commit lost the version race ``max_retries`` times in a row."""


class ConstraintViolationError(ValueError):
    """Incoming rows (or, when ADDING a constraint, existing rows)
    violate a table CHECK constraint — the commit publishes nothing."""


_SNAP_DIR = "_snapshots"
#: fixed default commit timestamp (determinism rule: never wall-clock)
SNAP_EPOCH = 1704067200

#: change-data-feed metadata columns (:func:`snapshot_changes` output —
#: the Delta CDF column names, so downstream recipes port verbatim)
CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAP_DIR, f"v{version:08d}.json")


def snapshot_versions(table_dir: str) -> list[int]:
    """Committed versions, ascending (manifest listing IS the log)."""
    snap = os.path.join(table_dir, _SNAP_DIR)
    if not os.path.isdir(snap):
        return []
    out = []
    for name in os.listdir(snap):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    import json

    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def snapshot_commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    ts: int = SNAP_EPOCH,
    max_retries: int = 8,
    extra: dict | None = None,
    bloom_cols=None,
    parent_version: int | None = None,
) -> int:
    """Commit ``df`` as the next version. ``append`` unions the new
    files with the parent version's file list; ``overwrite`` replaces
    it. Data lands in an attempt-unique ``data/c-*/`` dir FIRST;
    publishing the manifest via create-exclusive link is the atomic
    commit point, and losing the version race re-reads the new parent
    and retries (optimistic concurrency — see the module comment).
    Returns the committed version number.

    ``bloom_cols`` names columns to Bloom-index per file in the
    manifest (equality data skipping on scattered high-cardinality
    keys, where min/max spans everything — see
    :func:`snapshot_read`). The default ``None`` INHERITS the parent
    version's bloom columns, so one bloom-indexed commit keeps the
    table indexed through appends, compactions and merges; pass
    ``()`` to stop indexing new files.

    ``parent_version`` (reorg overwrites only — compact/cluster/
    zorder pass it) names the version the rewrite was computed FROM:
    commits that landed after it are folded in when they are pure
    appends (their files ride along unreorganized) and raise
    :class:`SnapshotConflictError` otherwise — without it, a reorg
    losing a race to an append would silently drop the appended rows
    (r11, VERDICT order #3)."""
    import json
    import tempfile

    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be append|overwrite")
    if bloom_cols is None:
        prior = snapshot_versions(table_dir)
        if prior:
            bloom_cols = _manifest_bloom_cols(
                _read_manifest(table_dir, prior[-1])
            )
    cons = snapshot_constraints(table_dir)
    if cons and not (extra or {}).get("reorg"):
        # CHECK constraints gate every commit's NEW rows — one filter
        # pass over df, never the table (r11). Reorg commits preserve
        # content exactly, so re-validating them would add an O(table)
        # pass for rows that already passed.
        _enforce_constraints(df, cons, "commit")
    # data dir is unique per ATTEMPT, never keyed by version: two
    # racing writers must not write into the same parquet directory.
    # Entries carry per-file footer min/max stats (data skipping).
    new_files = _write_new_files(
        df.sparkSession, table_dir, df, bloom_cols=bloom_cols
    )
    return _publish_files(
        table_dir, new_files, mode, ts, extra, max_retries,
        parent_version=parent_version,
    )


def _publish_files(
    table_dir: str,
    new_files: list[dict],
    mode: str,
    ts: int,
    extra: dict | None,
    max_retries: int = 8,
    parent_version: int | None = None,
    constraints: dict[str, str] | None = None,
) -> int:
    """The manifest-publish retry loop shared by :func:`snapshot_commit`
    and the ``format("snapshot")`` writer: compute the next version
    against the current head, publish via create-exclusive link, and
    on a lost race re-read the winner and retry (append recomputes the
    union; the new data files are attempt-unique so a retry never
    collides on disk)."""
    import json
    import tempfile

    os.makedirs(os.path.join(table_dir, _SNAP_DIR), exist_ok=True)
    for _attempt in range(max_retries):
        versions = snapshot_versions(table_dir)
        version = (versions[-1] + 1) if versions else 1
        files = new_files
        dv = None
        if mode == "append" and versions:
            parent_manifest = _read_manifest(table_dir, versions[-1])
            files = parent_manifest["files"] + new_files
            # appends carry the parent's delete vectors: the carried
            # files still have deleted positions. Overwrites drop them
            # (the new file set starts clean — how snapshot_compact
            # folds DVs away).
            dv = parent_manifest.get("dv")
        elif (
            mode == "overwrite"
            and parent_version is not None
            and versions
            and versions[-1] != parent_version
        ):
            # a reorg overwrite computed from parent_version, but the
            # head moved: fold compatible appends in (their files ride
            # along unreorganized, with no dv — the rewrite folded the
            # parent's DVs and appends carry none of their own) or
            # raise. Checked on EVERY attempt — even the first may see
            # a head that moved between the caller's read and here,
            # and the blind overwrite used to drop those rows.
            # affected_paths=None: only pure appends fold in (a reorg
            # rewrote every parent file, so any cow/mor winner overlaps
            # by construction and conflicts in the op check; appends
            # carry the parent's dv unchanged, so no dv carry either)
            _head, added, _dv_carry = _rebase_onto_appends(
                table_dir,
                parent_version,
                "reorg",
                _read_manifest(table_dir, parent_version).get("dv"),
                None,
            )
            files = new_files + added
        # CHECK constraints are table properties (Delta semantics):
        # they ride EVERY commit — appends, semantic overwrites and
        # reorgs alike — until explicitly dropped. ``constraints``
        # overrides (the add/drop commits); None inherits the head's.
        cons = constraints
        if cons is None and versions:
            cons = _read_manifest(table_dir, versions[-1]).get(
                "constraints"
            )
        manifest = {
            "version": version,
            "op": mode,
            "ts": ts,
            "n_files": len(files),
            "n_bytes": sum(f["bytes"] for f in files),
            "files": files,
        }
        if cons:
            manifest["constraints"] = dict(cons)
        if dv and dv.get("files"):
            manifest["dv"] = dv
        if extra:
            # application metadata rides the commit (e.g. the
            # incremental builder's high-water raw version); readers
            # that don't know the keys ignore them
            manifest["extra"] = dict(extra)
        fd, tmp = tempfile.mkstemp(
            suffix=".tmp", dir=os.path.join(table_dir, _SNAP_DIR)
        )
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        try:
            # commit point: link() is create-EXCLUSIVE — exactly one
            # writer can publish v{N}; EEXIST means we lost the race
            os.link(tmp, _manifest_path(table_dir, version))
            return version
        except FileExistsError:
            continue  # re-read the winner's manifest and retry N+1
        finally:
            os.unlink(tmp)
    raise SnapshotConflictError(
        f"lost the commit race {max_retries} times on {table_dir!r}"
    )


def _prune_keep(entry: dict, prune: dict, use_bloom: bool = True) -> bool:
    """True when the file COULD contain a matching row. Never wrong in
    the skip direction: missing stats, unknown columns or incomparable
    types all keep the file; a skip requires recorded bounds that
    provably miss the predicate range — or, for an EQUALITY predicate
    on a bloom-indexed column, a per-file Bloom filter that provably
    does not contain the value (Bloom filters have zero false
    negatives, so a bloom miss is as safe as a min/max miss)."""
    stats = entry.get("stats") or {}
    blooms = (entry.get("bloom") or {}) if use_bloom else {}
    for col, cond in prune.items():
        lo, hi = (
            cond if isinstance(cond, (tuple, list)) else (cond, cond)
        )
        if col in stats:
            mn, mx = stats[col]
            try:
                if lo is not None and mx < lo:
                    return False
                if hi is not None and mn > hi:
                    return False
            except TypeError:
                pass  # predicate/stats type mismatch — min/max unusable
        if col in blooms and lo is not None and lo == hi:
            key = _bloom_key(lo)
            if key is not None and not _bloom_contains(blooms[col], key):
                return False
    return True


def _prune_condition(prune: dict):
    """The row-level twin of ``prune`` — ALWAYS applied on top of the
    file skip, so results are exact whatever the stats quality."""
    cond = F.lit(True)
    for col, c in prune.items():
        lo, hi = c if isinstance(c, (tuple, list)) else (c, c)
        if lo is not None and hi is not None:
            cond = cond & F.col(col).between(F.lit(lo), F.lit(hi))
        elif lo is not None:
            cond = cond & (F.col(col) >= F.lit(lo))
        elif hi is not None:
            cond = cond & (F.col(col) <= F.lit(hi))
    return cond


def snapshot_prune_report(
    table_dir: str, prune: dict, version: int | None = None
) -> dict:
    """Audit companion for ``snapshot_read(prune=...)`` (no-silent-
    caps rule): how many files/bytes/rows the manifest stats skip for
    this predicate, without touching any data file."""
    versions = snapshot_versions(table_dir)
    if version is None:
        version = versions[-1]
    files = _read_manifest(table_dir, version)["files"]
    kept = [f for f in files if _prune_keep(f, prune)]
    # breakdown: files min/max alone would keep but the bloom skipped
    n_minmax_kept = sum(
        1 for f in files if _prune_keep(f, prune, use_bloom=False)
    )
    return {
        "version": version,
        "n_files": len(files),
        "n_kept": len(kept),
        "n_skipped": len(files) - len(kept),
        "n_skipped_minmax": len(files) - n_minmax_kept,
        "n_skipped_bloom": n_minmax_kept - len(kept),
        "bytes_total": sum(f["bytes"] for f in files),
        "bytes_kept": sum(f["bytes"] for f in kept),
        "rows_total": sum(f.get("rows", 0) for f in files),
        "rows_kept": sum(f.get("rows", 0) for f in kept),
    }


# ------------------------------------------------- CHECK constraints
def snapshot_constraints(table_dir: str) -> dict[str, str]:
    """The table's CHECK constraints (``{name: sql_expr}``) from the
    HEAD manifest — a table property that rides every commit (Delta
    semantics) until :func:`snapshot_drop_constraint`."""
    versions = snapshot_versions(table_dir)
    if not versions:
        return {}
    return dict(
        _read_manifest(table_dir, versions[-1]).get("constraints") or {}
    )


def _constraint_violations(df: DataFrame, expr: str) -> DataFrame:
    """Rows VIOLATING a CHECK constraint: the standard-SQL rule — a
    row violates only when the expression evaluates to FALSE (UNKNOWN/
    NULL passes, like every SQL engine's CHECK)."""
    return df.where(
        ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
    )


def _enforce_constraints(
    df: DataFrame, constraints: dict[str, str], what: str
) -> None:
    """Raise :class:`ConstraintViolationError` when any incoming row
    violates a table constraint — one filter pass over the NEW rows
    only (never the table), with a bounded sample in the message."""
    for name, expr in sorted(constraints.items()):
        sample = _constraint_violations(df, expr).limit(3).collect()
        if sample:
            rows = "; ".join(str(r.asDict()) for r in sample)
            raise ConstraintViolationError(
                f"{what} violates CHECK constraint {name!r} "
                f"({expr}): {rows}"
            )


def snapshot_add_constraint(
    spark: SparkSession,
    table_dir: str,
    name: str,
    expr: str,
    ts: int = SNAP_EPOCH,
) -> int:
    """ALTER TABLE ADD CONSTRAINT ... CHECK (expr) over the manifest
    log (r11): validates the CURRENT table once (one full scan — the
    Delta semantics for adding a constraint to existing data; rows
    where the expression is UNKNOWN pass, per standard SQL), then
    publishes a zero-added-file append commit carrying the updated
    constraint set. From that commit on, every
    :func:`snapshot_commit`, :func:`snapshot_merge` delta and
    ``format("snapshot")`` write validates its NEW rows — O(delta),
    never O(table) — and refuses with
    :class:`ConstraintViolationError` naming the constraint and a
    bounded row sample. Stream readers see nothing (no files were
    added). Constraints should be PORTABLE ANSI SQL boolean
    expressions: the Arrow writer path evaluates them with DuckDB
    executor-side (the repo's portable-SQL discipline)."""
    if not name or not name.replace("_", "").isalnum():
        raise ValueError(f"constraint name {name!r} must be [a-zA-Z0-9_]+")
    F.expr(expr)  # parse check (raises on syntax errors)
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed snapshots under {table_dir}")
    cons = snapshot_constraints(table_dir)
    if name in cons:
        raise ValueError(
            f"constraint {name!r} already exists ({cons[name]!r}) — "
            "drop it first to change the expression"
        )
    current = snapshot_read(spark, table_dir)
    sample = _constraint_violations(current, expr).limit(3).collect()
    if sample:
        rows = "; ".join(str(r.asDict()) for r in sample)
        raise ConstraintViolationError(
            f"existing rows violate CHECK {name!r} ({expr}): {rows} — "
            "clean the table (snapshot_delete) before adding it"
        )
    cons[name] = expr
    return _publish_files(
        table_dir, [], "append", ts,
        {"constraint_added": name}, constraints=cons,
    )


def snapshot_drop_constraint(
    table_dir: str, name: str, ts: int = SNAP_EPOCH
) -> int:
    """ALTER TABLE DROP CONSTRAINT: manifest-only commit removing the
    named constraint (unknown names raise)."""
    cons = snapshot_constraints(table_dir)
    if name not in cons:
        raise ValueError(
            f"no constraint {name!r} on {table_dir!r} "
            f"(have: {sorted(cons)})"
        )
    del cons[name]
    return _publish_files(
        table_dir, [], "append", ts,
        {"constraint_dropped": name},
        # a now-empty dict must still OVERRIDE inheritance
        constraints=cons if cons else {},
    )


def _version_schema_info(
    table_dir: str, manifest: dict
) -> tuple[bool, list[str]]:
    """``(heterogeneous, union_cols)`` across one version's files —
    the schema-evolution detector the copy-on-write ops consult so a
    merge/delete/compact can never silently operate on the first
    file's schema when the version's files diverge (r11, VERDICT
    order #2). Manifest-only for r11+ commits (``cols`` is recorded
    per file entry at commit time from the footer already being read
    for stats); a legacy entry without it pays one driver-side footer
    read. ``union_cols`` keeps first-file column order, then first
    appearance — the same order parquet ``mergeSchema`` produces."""
    union: list[str] = []
    seen: set[str] = set()
    shapes: set[tuple] = set()
    for f in manifest["files"]:
        cols = f.get("cols")
        if cols is None:
            try:
                import pyarrow.parquet as pq

                cols = [
                    fld.name
                    for fld in pq.ParquetFile(
                        os.path.join(table_dir, f["path"])
                    ).schema_arrow
                ]
            except Exception:
                continue  # unreadable footer: no evidence either way
        shapes.add(tuple(cols))
        for c in cols:
            if c not in seen:
                seen.add(c)
                union.append(c)
    return len(shapes) > 1, union


def snapshot_read(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    merge_schema: bool = False,
    prune: dict | None = None,
    as_of_ts: int | None = None,
) -> DataFrame:
    """Read a pinned version (latest when None) — time travel. The
    reader takes the manifest's EXPLICIT file list, never a directory
    listing, so later commits/compactions/vacuums of other versions
    cannot change what this query sees.

    ``merge_schema=True`` reads with the UNION schema across the
    version's files (parquet ``mergeSchema``) — the lakehouse
    schema-evolution read: appends that ADDED columns surface them,
    older rows null-fill. Off by default (single-schema tables skip
    the per-file footer sampling, and column order stays exactly the
    first file's — what the oracle pins rely on). The copy-on-write
    ops (:func:`snapshot_merge`, :func:`snapshot_delete`,
    :func:`snapshot_compact`) detect schema-evolved versions from the
    manifest and switch to the union read themselves (r11), so a
    merge can no longer silently drop an evolved column.

    ``prune`` is manifest-level DATA SKIPPING — ``{col: value}`` for
    equality or ``{col: (lo, hi)}`` for an inclusive range (None =
    open end), conjoined across columns. Files whose recorded footer
    min/max provably miss the range are dropped from the scan BEFORE
    Spark ever lists them — on a 100 TB key-clustered table (see
    :func:`snapshot_cluster_by`) a point lookup plans ~1 file instead
    of all of them, and the pruning cost is manifest-only (no footer
    I/O, no file listing). The same predicate is ALSO applied as a
    row filter, so the result is exactly the filtered frame no matter
    how partial the stats are; files without usable stats are always
    kept. :func:`snapshot_prune_report` shows the skip counts.

    On a table committed with ``bloom_cols`` (see
    :func:`snapshot_commit`), EQUALITY predicates additionally probe
    each file's manifest Bloom filter — the skip path for scattered
    high-cardinality keys, where every file's min/max spans the whole
    key range and range stats prune nothing (the Iceberg
    bloom/puffin case). Bloom misses have zero false negatives, so
    the skip is as exact as a min/max miss; range predicates never
    consult blooms.

    ``as_of_ts`` (r13) is Delta's ``timestampAsOf``: the newest
    committed version whose manifest ``ts`` is <= the given epoch
    value (commit clocks here are caller-supplied epochs, never
    wall-clock — the repo determinism rule). Mutually exclusive with
    ``version``; a timestamp before the first commit raises (nothing
    existed to read), and a vacuumed-away version raises through the
    normal version check."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed snapshots under {table_dir}")
    if as_of_ts is not None:
        if version is not None:
            raise ValueError("pass version OR as_of_ts, not both")
        at = [
            v for v in versions
            if _read_manifest(table_dir, v).get("ts", 0) <= as_of_ts
        ]
        if not at:
            raise ValueError(
                f"no version of {table_dir!r} committed at or before "
                f"ts {as_of_ts}"
            )
        version = at[-1]
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    manifest = _read_manifest(table_dir, version)
    files = manifest["files"]
    if prune:
        pruned = [f for f in files if _prune_keep(f, prune)]
        if not pruned and files:
            # every file skipped: schema-correct empty frame from the
            # version's own first file (limit(0) reads footer only)
            return (
                spark.read.parquet(
                    os.path.join(table_dir, files[0]["path"])
                )
                .limit(0)
                .where(_prune_condition(prune))
            )
        files = pruned
    paths = [os.path.join(table_dir, f["path"]) for f in files]
    if not paths:
        # An empty-manifest version (e.g. a zero-survivor incremental
        # append after an overwrite-to-empty) must return ZERO rows.
        # Never fall back to scanning data/ — with attempt-unique
        # c-* dirs it can hold parquet from failed or concurrent
        # commit attempts that are not part of this version. Borrow
        # the schema from any other version's files; a table that has
        # never had a file has no knowable schema.
        for v in reversed(snapshot_versions(table_dir)):
            other = _read_manifest(table_dir, v)["files"]
            if other:
                return spark.read.parquet(
                    os.path.join(table_dir, other[0]["path"])
                ).limit(0)
        raise ValueError(
            f"version {version} of {table_dir!r} has no files and no "
            "other version defines a schema"
        )
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = _apply_dv(spark, table_dir, manifest, reader.parquet(*paths))
    if prune:
        df = df.where(_prune_condition(prune))
    return df


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_mb: float = 128.0,
    ts: int = SNAP_EPOCH,
) -> dict:
    """Rewrite the LATEST version's files at target size as a new
    ``overwrite`` commit (content preserved exactly — the OPTIMIZE
    operation). Readers pinned to older versions keep their files;
    reclaim space afterwards with :func:`snapshot_vacuum`.

    On a schema-evolved version (files with diverging columns) the
    rewrite reads the UNION schema (r11) — compaction CONSOLIDATES an
    evolution instead of silently collapsing it to the first file's
    columns, which is what makes compact the documented evolution
    fix-up step."""
    head = snapshot_versions(table_dir)[-1]
    manifest = _read_manifest(table_dir, head)
    hetero, _ = _version_schema_info(table_dir, manifest)
    latest = snapshot_read(spark, table_dir, version=head,
                           merge_schema=hetero)
    n_files = plan_output_files(manifest["n_bytes"], target_mb)
    compacted = latest.coalesce(n_files)
    # reorg commits preserve content exactly — the marker is Delta's
    # dataChange=false: change readers and streams emit NOTHING for them
    version = snapshot_commit(
        compacted, table_dir, mode="overwrite", ts=ts,
        extra={"reorg": True}, parent_version=head,
    )
    return {
        "version": version,
        "planned_files": n_files,
        "input_files": manifest["n_files"],
    }


def snapshot_cluster_by(
    spark: SparkSession,
    table_dir: str,
    col: str,
    n_files: int | None = None,
    target_mb: float = 256.0,
    ts: int = SNAP_EPOCH,
) -> dict:
    """Range-cluster the LATEST snapshot version on ``col`` as a new
    ``overwrite`` commit (content preserved exactly — OPTIMIZE with a
    sort order). This is what keeps :func:`snapshot_merge` cheap over
    time: merges rewrite whole files containing matched keys, so a
    key-clustered layout bounds a K-key upsert to ~K files, while an
    unclustered one degrades toward rewriting everything. Run it the
    way Delta runs OPTIMIZE ZORDER — periodically, after merge churn.
    Readers pinned to older versions keep their files (reclaim with
    :func:`snapshot_vacuum`). Schema-evolved versions rewrite with the
    UNION schema, like :func:`snapshot_compact`."""
    head = snapshot_versions(table_dir)[-1]
    manifest = _read_manifest(table_dir, head)
    hetero, _ = _version_schema_info(table_dir, manifest)
    latest = snapshot_read(spark, table_dir, version=head,
                           merge_schema=hetero)
    if n_files is None:
        n_files = plan_output_files(manifest["n_bytes"], target_mb)
    clustered = latest.repartitionByRange(
        n_files, F.col(col)
    ).sortWithinPartitions(col)
    version = snapshot_commit(
        clustered, table_dir, mode="overwrite", ts=ts,
        extra={"reorg": True},  # content-preserving (dataChange=false)
        parent_version=head,
    )
    return {
        "version": version,
        "planned_files": n_files,
        "output_files": _read_manifest(table_dir, version)["n_files"],
        "input_files": manifest["n_files"],
    }


def snapshot_zorder_by(
    spark: SparkSession,
    table_dir: str,
    cols: list[str],
    n_files: int | None = None,
    target_mb: float = 256.0,
    bits: int = 6,
    ts: int = SNAP_EPOCH,
) -> dict:
    """Z-order the LATEST snapshot version on ``cols`` as a new
    ``overwrite`` commit — OPTIMIZE ZORDER over the manifest log.
    Where :func:`snapshot_cluster_by` gives perfect pruning on ONE
    key, the Morton layout makes every rewritten file cover a small
    hyper-rectangle, so the commit-time manifest stats let
    ``snapshot_read(prune=...)`` skip files on EVERY listed column at
    once — the multi-dimensional point/range lookup a 100 TB corpus
    needs for (e.g.) (domain, fetch-date) slices. Content preserved
    exactly; readers pinned to older versions keep their files
    (reclaim with :func:`snapshot_vacuum`). Schema-evolved versions
    rewrite with the UNION schema, like :func:`snapshot_compact`."""
    head = snapshot_versions(table_dir)[-1]
    manifest = _read_manifest(table_dir, head)
    hetero, _ = _version_schema_info(table_dir, manifest)
    latest = snapshot_read(spark, table_dir, version=head,
                           merge_schema=hetero)
    if n_files is None:
        n_files = plan_output_files(manifest["n_bytes"], target_mb)
    version = snapshot_commit(
        _zorder_frame(latest, cols, n_files, bits),
        table_dir,
        mode="overwrite",
        ts=ts,
        extra={"reorg": True},  # content-preserving (dataChange=false)
        parent_version=head,
    )
    return {
        "version": version,
        "planned_files": n_files,
        "output_files": _read_manifest(table_dir, version)["n_files"],
        "input_files": manifest["n_files"],
    }


def snapshot_merge(
    delta: DataFrame,
    table_dir: str,
    keys: list[str],
    ts: int = SNAP_EPOCH,
    extra: dict | None = None,
    cdf: bool = True,
    delete_keys: DataFrame | None = None,
    not_matched_by_source: str = "keep",
    source_keys: DataFrame | None = None,
) -> dict:
    """Keyed UPSERT as a copy-on-write commit (r10, VERDICT order #4)
    — the Delta/Iceberg MERGE pattern on plain parquet: rows in
    ``delta`` REPLACE existing rows with the same key, new keys
    append. Only files that actually CONTAIN a matched key are
    rewritten; every untouched file is carried into the new manifest
    by reference — the re-crawl-replaces-stale-doc economics a 100 TB
    corpus needs (rewriting the whole table per merge would be an
    O(corpus) job; this is O(affected files + delta)).

    Concurrency (r11, the Delta conflict check): computed against the
    LATEST version at entry and published with the same
    create-exclusive manifest link as :func:`snapshot_commit`. A lost
    race now REBASES internally when every winning commit is a pure
    append whose added files carry NO key this merge touches (checked
    by reading just those files) — the winner's rows ride along and
    the merge commits against the new head with no caller retry.
    Anything else — a winner that rewrote/removed files, changed
    delete vectors, or appended an overlapping key — still raises
    :class:`SnapshotConflictError`, because the affected-file set is
    stale (blind retry could resurrect rows the winner replaced); the
    caller re-invokes, the standard optimistic MERGE loop.

    ``cdf=True`` (default) additionally records the commit's ROW-LEVEL
    changes — update preimages/postimages and inserts — as change
    files under ``changes/`` referenced from the manifest (the Delta
    ``_change_data`` mechanism), which is what makes
    :func:`snapshot_changes` exact over merge commits: a rewrite
    commit's file diff alone cannot be reconstructed into a row delta
    after the fact. Costs one extra O(changed rows) write; pass
    ``cdf=False`` to skip it (downstream change readers then need
    ``on_rewrite="skip"``).

    ``delete_keys`` (a frame of just the key columns) is Delta's WHEN
    MATCHED THEN DELETE clause: live rows with those keys are removed
    in the SAME commit, through the same affected-file machinery —
    what a change-feed apply needs to land one source commit range as
    one destination commit (see :func:`snapshot_replicate`). Keys in
    both ``delta`` and ``delete_keys`` are ambiguous and raise.

    ``not_matched_by_source="delete"`` (r12, VERDICT r11 order #6) is
    Delta's third clause — WHEN NOT MATCHED BY SOURCE THEN DELETE:
    live table rows whose key is absent from the SOURCE die in the
    same commit. The source reference set defaults to the keys this
    merge carries (``delta`` ∪ ``delete_keys``); pass ``source_keys``
    when the delta was pre-filtered to changed rows (the Delta
    footgun: a filtered source would otherwise delete every unchanged
    row) — :func:`snapshot_mirror` does exactly that to bootstrap-sync
    a drifted replica with only the files that actually changed
    rewritten. The absent-key set is computed with one keys-only
    anti-join over the live scan; for a drifted replica it is small
    and rides the same broadcast probe as explicit delete keys.

    Returns ``{version, files_rewritten, files_kept, files_new,
    rows_replaced, rows_inserted, rows_deleted}`` so callers can
    verify the copy-on-write bound (manifest-diff evidence)."""
    from urllib.parse import unquote, urlparse

    if not keys:
        raise ValueError("merge requires at least one key column")
    spark = delta.sparkSession
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed snapshots under {table_dir}")
    parent = versions[-1]
    manifest = _read_manifest(table_dir, parent)
    if not manifest["files"]:
        raise ValueError("cannot merge into an empty version")
    by_abspath = {
        os.path.normpath(os.path.join(table_dir, f["path"])): f
        for f in manifest["files"]
    }

    delta_keys = delta.select(*keys).distinct()
    if delta_keys.count() != delta.count():
        raise ValueError("delta contains duplicate merge keys")
    dkeys = (
        delete_keys.select(*keys).distinct()
        if delete_keys is not None
        else None
    )
    if dkeys is not None:
        if dkeys.join(delta_keys, on=keys, how="left_semi").count():
            raise ValueError(
                "delete_keys overlap the delta's merge keys — a key "
                "cannot be upserted and deleted in one merge"
            )
        all_keys = delta_keys.unionByName(dkeys)
    else:
        all_keys = delta_keys
    if not_matched_by_source not in ("keep", "delete"):
        raise ValueError(
            f"not_matched_by_source={not_matched_by_source!r}: "
            "'keep' (default) or 'delete'"
        )
    if source_keys is not None and not_matched_by_source != "delete":
        raise ValueError(
            "source_keys only applies with not_matched_by_source="
            "'delete' (it is that clause's reference set)"
        )
    src_keys = (
        source_keys.select(*keys).distinct()
        if source_keys is not None
        else all_keys
    )
    if source_keys is not None and (
        all_keys.join(src_keys, on=keys, how="left_anti").count()
    ):
        # a delta/delete key outside source_keys would come back as
        # "absent from source" — upserted AND deleted in one commit
        raise ValueError(
            "source_keys must cover every delta and delete_keys key "
            "(the source reference set is the WHOLE source, not the "
            "changed subset)"
        )

    # schema-evolution guard (r11): when the parent's files diverge
    # (an evolving append added columns), reading first-file schema
    # would silently DROP the evolved columns from every rewritten
    # row. Detect from the manifest and read the UNION schema instead
    # (parquet mergeSchema, old rows null-filled) — the same table
    # compact-then-merge would produce. Homogeneous tables keep the
    # single-schema read (no footer sampling, oracle-pinned order).
    hetero, _union_cols = _version_schema_info(table_dir, manifest)
    reader = (
        spark.read.option("mergeSchema", "true") if hetero else spark.read
    )
    base = reader.parquet(*by_abspath)
    cols = base.columns
    unknown_delta = [c for c in delta.columns if c not in cols]
    if unknown_delta:
        # select(*cols) below would drop them SILENTLY — refuse loudly
        # (schema evolution through merge is not supported; append the
        # new column first)
        raise ValueError(
            f"delta carries columns {unknown_delta} absent from the "
            "table schema — commit them via an append first"
        )
    if hetero:
        for c in cols:
            if c not in delta.columns:
                # Delta MERGE semantics for unspecified columns:
                # null-fill with the table's type
                delta = delta.withColumn(
                    c, F.lit(None).cast(base.schema[c].dataType)
                )
    cons = manifest.get("constraints") or {}
    if cons:
        # CHECK constraints gate the delta's rows — survivors of the
        # rewrite already passed when they were committed (r11)
        _enforce_constraints(delta, cons, "merge delta")
    current = _apply_dv(
        spark,
        table_dir,
        manifest,
        base.withColumn("_merge_file", F.input_file_name()),
    )
    if not_matched_by_source == "delete":
        # WHEN NOT MATCHED BY SOURCE THEN DELETE (r12): live keys
        # absent from the source reference set become delete keys and
        # ride the same machinery. One keys-only anti-join over the
        # scan (no broadcast hint: the source key set is table-scale
        # for a mirror — AQE picks; the RESULT is drift-sized)
        absent = (
            current.select(*keys)
            .distinct()
            .join(src_keys, on=keys, how="left_anti")
            .persist()
        )
        if absent.count():
            dkeys = (
                absent if dkeys is None else dkeys.unionByName(absent)
                .distinct()
            )
            all_keys = all_keys.unionByName(absent).distinct()
    # broadcast the (small) key set: the affected-file probe and the
    # anti join below must not shuffle the full table
    affected_uris = [
        r["_merge_file"]
        for r in current.join(
            F.broadcast(all_keys), on=keys, how="left_semi"
        ).select("_merge_file").distinct().collect()
    ]
    affected = sorted(
        os.path.normpath(unquote(urlparse(u).path)) for u in affected_uris
    )
    unknown = [p for p in affected if p not in by_abspath]
    if unknown:  # pragma: no cover - defensive
        raise ValueError(f"scan returned files outside the manifest: {unknown}")

    pre_update = pre_delete = None
    rows_replaced = rows_deleted = 0
    if affected:
        affected_frame = reader.parquet(*affected)
        # the affected subset may not span the full union (e.g. every
        # matched file predates the evolution) — null-fill up to cols
        for c in cols:
            if c not in affected_frame.columns:
                affected_frame = affected_frame.withColumn(
                    c, F.lit(None).cast(base.schema[c].dataType)
                )
        affected_live = _apply_dv(
            spark, table_dir, manifest, affected_frame
        )
        survivors = affected_live.join(
            F.broadcast(all_keys), on=keys, how="left_anti"
        ).select(*cols)
        # preimages: the live rows the delta replaces / deletes —
        # bounded by the affected rows, never the table
        pre_update = affected_live.join(
            F.broadcast(delta_keys), on=keys, how="left_semi"
        ).select(*cols)
        rows_replaced = pre_update.count()
        if dkeys is not None:
            pre_delete = affected_live.join(
                F.broadcast(dkeys), on=keys, how="left_semi"
            ).select(*cols)
            rows_deleted = pre_delete.count()
        rewritten = survivors.unionByName(delta.select(*cols))
    else:
        rewritten = delta.select(*cols)
    rows_inserted = delta.count() - rows_replaced

    cdf_entry = None
    if cdf:
        if pre_update is not None:
            # the preimage keys split the delta into postimages vs
            # pure inserts
            matched_keys = pre_update.select(*keys).distinct()
            post = delta.join(
                F.broadcast(matched_keys), on=keys, how="left_semi"
            ).select(*cols)
            inserts = delta.join(
                F.broadcast(matched_keys), on=keys, how="left_anti"
            ).select(*cols)
            change = (
                pre_update.withColumn(
                    CHANGE_TYPE_COL, F.lit("update_preimage")
                )
                .unionByName(
                    post.withColumn(
                        CHANGE_TYPE_COL, F.lit("update_postimage")
                    )
                )
                .unionByName(
                    inserts.withColumn(CHANGE_TYPE_COL, F.lit("insert"))
                )
            )
            if pre_delete is not None:
                change = change.unionByName(
                    pre_delete.withColumn(
                        CHANGE_TYPE_COL, F.lit("delete")
                    )
                )
        else:
            change = delta.select(*cols).withColumn(
                CHANGE_TYPE_COL, F.lit("insert")
            )
        cdf_entry = {
            "files": _write_change_files(spark, table_dir, change),
            "n_rows": 2 * rows_replaced + rows_inserted + rows_deleted,
        }

    new_files = _write_new_files(
        spark, table_dir, rewritten,
        bloom_cols=_manifest_bloom_cols(manifest),
    )
    kept = [
        f for p, f in sorted(by_abspath.items()) if p not in set(affected)
    ]

    def _winner_guard(added_entries):
        # a concurrent append is rebase-compatible ONLY if none of its
        # rows carry a key this merge upserts/deletes — otherwise the
        # merge's outcome would have differed (Delta's concurrent-
        # append check, evaluated over just the added files)
        paths = [
            os.path.join(table_dir, f["path"]) for f in added_entries
        ]
        try:
            n = (
                spark.read.parquet(*paths)
                .join(F.broadcast(all_keys), on=keys, how="left_semi")
                .limit(1)
                .count()
            )
        except Exception as exc:
            raise SnapshotConflictError(
                f"cannot validate concurrently appended files against "
                f"this merge's keys ({exc}) — re-run the merge against "
                "the new head"
            ) from exc
        if n:
            raise SnapshotConflictError(
                "concurrent append added rows whose keys overlap this "
                "merge — re-run the merge against the new head"
            )

    version = _publish_cow_manifest(
        table_dir, parent, kept + new_files, "merge", ts,
        {
            **(extra or {}),
            "merge_keys": list(keys),
            "files_rewritten": len(affected),
            "rows_replaced": rows_replaced,
            "rows_deleted": rows_deleted,
        },
        dv=manifest.get("dv"),  # kept files may still carry deletions
        cdf=cdf_entry,
        rebase={
            "affected_paths": {by_abspath[p]["path"] for p in affected},
            "new_entries": new_files,
            "parent_dv": manifest.get("dv"),
            "winner_guard": _winner_guard,
            # the delta's rows are NEW — a constraint ADDED between
            # parent and head never saw them, so revalidate (r12)
            "recheck_constraints": lambda c: _enforce_constraints(
                delta, c, "merge delta (rebased past constraint change)"
            ),
        },
    )
    if not_matched_by_source == "delete":
        absent.unpersist()
    return {
        "version": version,
        "files_rewritten": len(affected),
        "files_kept": len(kept),
        "files_new": len(new_files),
        "rows_replaced": rows_replaced,
        "rows_inserted": rows_inserted,
        "rows_deleted": rows_deleted,
    }


#: string min/max beyond this length are omitted from manifest stats —
#: a TRUNCATED max compares wrongly (could skip a matching file), and
#: unbounded strings would bloat the manifest; omission is always safe
#: (stats-less columns are never pruned on)
_STATS_MAX_STR = 64

#: per-file manifest Bloom filters (equality data skipping): target
#: false-positive rate, and a hard cap on the bitmap so manifests stay
#: small — a file whose distinct-key count would need a bigger bitmap
#: gets NO bloom (omission is always safe: bloom-less columns fall back
#: to min/max-only pruning). 2^18 bits = 32 KiB ≈ 27k distinct keys at
#: 1% fpp — far above a well-sized clustered file's key count.
_BLOOM_FPP = 0.01
_BLOOM_MAX_BITS = 1 << 18


def _bloom_key(v) -> str | None:
    """Canonical string a value hashes as in a manifest bloom — shared
    by the commit-time build and the read-time probe so membership is
    exact. Only bool/int/str are indexed; anything else (floats, whose
    equality is fragile; binary; dates) returns None and is neither
    inserted nor pruned on."""
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool IS an int in Python
        return "b:1" if v else "b:0"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, str):
        return "s:" + v
    return None


def _bloom_contains(spec: dict, key: str) -> bool:
    import base64

    from .dedup import BloomFilter

    return BloomFilter(
        spec["m"], spec["k"], base64.b64decode(spec["b64"])
    ).contains(key)


def _file_blooms(path: str, cols) -> dict:
    """Per-file Bloom filters over the DISTINCT values of each named
    column, for manifest-level equality skipping. Built once per file
    at commit time from one column read (the Iceberg puffin-file /
    parquet-bloom shape — at 1000-executor scale this rides inside the
    writer task; here it is a per-file column scan, still O(file) and
    paid exactly once). Columns missing from the file, with no
    indexable values, or needing a bitmap over ``_BLOOM_MAX_BITS``
    are omitted — omission can never cause a wrong skip."""
    import base64

    from .dedup import BloomFilter, _bloom_h

    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        present = [c for c in cols if c in pf.schema_arrow.names]
        if not present:
            return {}
        table = pf.read(columns=present)
    except Exception:
        return {}
    out: dict[str, dict] = {}
    for col in present:
        keys = set()
        for v in table.column(col).to_pylist():
            k = _bloom_key(v)
            if k is not None:
                keys.add(k)
        if not keys:
            continue
        m_bits, k_hashes = BloomFilter.params(len(keys), _BLOOM_FPP)
        if m_bits > _BLOOM_MAX_BITS:
            continue  # file too high-cardinality — bloom omitted
        bits = bytearray(m_bits // 8)
        for key in keys:
            h1, h2 = _bloom_h(key)
            for i in range(k_hashes):
                pos = (h1 + i * h2) % m_bits
                bits[pos >> 3] |= 1 << (pos & 7)
        out[col] = {
            "m": m_bits,
            "k": k_hashes,
            "b64": base64.b64encode(bytes(bits)).decode("ascii"),
        }
    return out


def _rel_file_expr(table_dir: str):
    """``_metadata.file_path`` → manifest-relative path (the delete-
    vector join key). Spark reports local files as ``file:`` +
    abspath; manifests store paths relative to ``table_dir``, so DVs
    survive a table-directory move as long as reads go through
    ``snapshot_read`` (which rebuilds the prefix from the table_dir
    the caller passes)."""
    prefix = "file:" + os.path.abspath(table_dir) + os.sep
    return F.col("_metadata.file_path").substr(
        F.lit(len(prefix) + 1), F.lit(1 << 30)
    )


def _apply_dv(
    spark: SparkSession, table_dir: str, manifest: dict, df: DataFrame
) -> DataFrame:
    """Apply a version's positional delete vectors to a scan of its
    data files: anti-join on (relative file path, row position within
    the file) — the Iceberg v2 merge-on-read shape. ``df`` must still
    be a file-scan-level frame (``_metadata`` is resolvable only at
    the source). The DV frame is broadcast: its size is bounded by
    rows deleted since the last compaction, and
    :func:`snapshot_compact` folds DVs away — the maintenance loop
    that keeps the read-side join small at 100 TB."""
    dv = manifest.get("dv")
    if not dv or not dv.get("files"):
        return df
    cols = df.columns
    dvf = spark.read.parquet(
        *[os.path.join(table_dir, f["path"]) for f in dv["files"]]
    ).select(
        F.col("path").alias("_dv_path"), F.col("pos").alias("_dv_pos")
    )
    keyed = df.withColumn("_row_path", _rel_file_expr(table_dir)).withColumn(
        "_row_pos", F.col("_metadata.row_index")
    )
    out = keyed.join(
        F.broadcast(dvf),
        (keyed["_row_path"] == dvf["_dv_path"])
        & (keyed["_row_pos"] == dvf["_dv_pos"]),
        "left_anti",
    )
    return out.select(*cols)


def _write_aux_files(
    spark: SparkSession,
    table_dir: str,
    frame: DataFrame,
    subdir: str,
    prefix: str,
) -> list[dict]:
    """Write an auxiliary (non-data) frame under an attempt-unique
    ``{subdir}/{prefix}*/`` dir (the multi-writer rule) and return its
    manifest entries. One output file: aux commits hold only what ONE
    operation produced — delete vectors sized by the positions one
    delete matched, change files sized by one commit's changed rows —
    so a single writer is the right shape (a change set big enough for
    this to matter means the op itself was table-scale)."""
    import tempfile

    os.makedirs(os.path.join(table_dir, subdir), exist_ok=True)
    aux_dir = tempfile.mkdtemp(
        prefix=prefix, dir=os.path.join(table_dir, subdir)
    )
    frame.coalesce(1).write.mode("overwrite").parquet(aux_dir)
    out = []
    for uri in spark.read.parquet(aux_dir).inputFiles():
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        out.append(
            {
                "path": os.path.relpath(path, table_dir),
                "bytes": os.path.getsize(path),
            }
        )
    out.sort(key=lambda f: f["path"])
    return out


def _write_delete_vectors(
    spark: SparkSession, table_dir: str, dv_frame: DataFrame
) -> list[dict]:
    """Positional-delete frame ``(path string, pos long)`` under
    ``deletes/d-*/`` — see :func:`_write_aux_files`."""
    return _write_aux_files(spark, table_dir, dv_frame, "deletes", "d-")


def _write_change_files(
    spark: SparkSession, table_dir: str, cdf_frame: DataFrame
) -> list[dict]:
    """Row-level change frame (table columns + ``_change_type``) under
    ``changes/x-*/`` — the commit-time CDF files :func:`snapshot_changes`
    reads for copy-on-write commits (Delta's ``_change_data`` shape)."""
    return _write_aux_files(spark, table_dir, cdf_frame, "changes", "x-")


def _manifest_bloom_cols(manifest: dict) -> tuple[str, ...]:
    """The table's bloom-indexed columns = union across file entries
    (how appends/compactions/merges INHERIT the bloom config without a
    separate table-properties file)."""
    cols: set[str] = set()
    for f in manifest.get("files", []):
        cols.update((f.get("bloom") or {}).keys())
    return tuple(sorted(cols))


def _file_stats(
    path: str,
) -> tuple[dict | None, int | None, list[str] | None]:
    """Per-file column min/max from the parquet FOOTER only (no data
    scan — the Iceberg/Delta stats-collection shape, paid once per
    file at commit time). Returns ``(stats, n_rows)`` where stats maps
    column path -> [min, max] for columns whose bounds are usable in
    EVERY row group: bool/int/float/str, no NaN, strings capped at
    ``_STATS_MAX_STR``. Anything else (binary, timestamps, missing
    row-group stats) drops the column — readers treat a missing column
    as unboundable and keep the file, so omission can never cause a
    wrong skip."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
    except Exception:
        return None, None, None
    ok: dict[str, list] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name in bad:
                continue
            st = col.statistics
            has = st is not None and st.has_min_max
            mn = st.min if has else None
            mx = st.max if has else None
            usable = (
                isinstance(mn, (bool, int, float, str))
                and isinstance(mx, (bool, int, float, str))
                and not (isinstance(mn, float) and mn != mn)
                and not (isinstance(mx, float) and mx != mx)
                and not (
                    isinstance(mn, str)
                    and (
                        len(mn) > _STATS_MAX_STR
                        or len(mx) > _STATS_MAX_STR
                    )
                )
            )
            if not usable:
                bad.add(name)
                ok.pop(name, None)
                continue
            if name in ok:
                ok[name] = [min(ok[name][0], mn), max(ok[name][1], mx)]
            else:
                ok[name] = [mn, mx]
    # TOP-LEVEL column names (arrow schema order) — recorded per file
    # so schema-evolution checks stay manifest-only (r11); nested
    # leaves in path_in_schema would mis-compare against frame columns
    try:
        cols = [f.name for f in pq.ParquetFile(path).schema_arrow]
    except Exception:
        cols = None
    return (ok or None), md.num_rows, cols


def _file_entry(table_dir: str, path: str, bloom_cols=None) -> dict:
    entry = {
        "path": os.path.relpath(path, table_dir),
        "bytes": os.path.getsize(path),
    }
    stats, n_rows, cols = _file_stats(path)
    if n_rows is not None:
        entry["rows"] = n_rows
    if stats:
        entry["stats"] = stats
    if cols:
        entry["cols"] = cols
    if bloom_cols:
        blooms = _file_blooms(path, bloom_cols)
        if blooms:
            entry["bloom"] = blooms
    return entry


def _write_new_files(
    spark, table_dir: str, df: DataFrame, bloom_cols=None
) -> list[dict]:
    """Write ``df`` into an attempt-unique ``data/c-*`` dir (the
    multi-writer rule) and return its manifest file entries —
    including per-file footer min/max stats and (for ``bloom_cols``)
    per-file Bloom filters for data skipping."""
    import tempfile

    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    data_dir = tempfile.mkdtemp(
        prefix="c-", dir=os.path.join(table_dir, "data")
    )
    df.write.mode("overwrite").parquet(data_dir)
    new_files = []
    for uri in spark.read.parquet(data_dir).inputFiles():
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        new_files.append(_file_entry(table_dir, path, bloom_cols))
    new_files.sort(key=lambda f: f["path"])
    return new_files


def _dv_delta_entries(
    cur_dv: dict | None, new_dv: dict | None
) -> list[dict]:
    """Manifest-level DV diff: the delete-vector file entries ``new_dv``
    ADDED over ``cur_dv``. Raises SnapshotConflictError if any current
    entry disappeared — DV removal means a fold/rewrite (overwrite,
    compact, restore), which never rebases."""
    cur_paths = {f["path"] for f in (cur_dv or {}).get("files", [])}
    new_files = (new_dv or {}).get("files", [])
    new_paths = {f["path"] for f in new_files}
    if cur_paths - new_paths:
        raise SnapshotConflictError(
            "concurrent commit removed/folded delete vectors — re-run "
            "against the new head"
        )
    return [f for f in new_files if f["path"] not in cur_paths]


def _dv_touched_data_paths(
    table_dir: str, dv_entries: list[dict]
) -> set:
    """The DATA files (rel paths) a set of delete-vector files touch —
    read driver-side via pyarrow (DV files are bounded aux artifacts:
    rows deleted since the last compaction, the same bound that keeps
    the read-side `_apply_dv` join broadcastable)."""
    import pyarrow.parquet as pq

    touched: set = set()
    for f in dv_entries:
        t = pq.read_table(
            os.path.join(table_dir, f["path"]), columns=["path"]
        )
        touched.update(t.column("path").to_pylist())
    return touched


def _rebase_onto_appends(
    table_dir: str,
    parent: int,
    op: str,
    parent_dv: dict | None,
    winner_guard,
    affected_paths: set | None = None,
    dv_touched_paths: set | None = None,
) -> tuple[int, list[dict], tuple[list[dict], int, dict | None]]:
    """Delta-style conflict resolution after a lost CAS (r11, VERDICT
    order #3): fold every commit that landed after ``parent`` into
    this copy-on-write commit — PROVIDED each one is a pure append
    that removed nothing, left the delete vectors untouched, and
    passes the caller's row-level ``winner_guard`` over its added
    files (a merge checks key overlap, a delete checks condition
    matches — a guard failure means the concurrent rows would have
    changed THIS commit's outcome, so it must be recomputed).

    r12 extension (VERDICT order #2): a winning copy-on-write
    ``merge``/``delete`` whose rewritten+removed file set is DISJOINT
    from this commit's ``affected_paths`` also rebases — the files
    this commit recomputed are byte-identical at the new head, and
    the winner's output files go through the same row-level
    ``winner_guard`` (an updated/inserted row that matches this
    commit's keys/condition would have changed its outcome →
    conflict; survivor rows riding in those files cannot match, or
    their source files would have been in BOTH affected sets).
    r13 extension (VERDICT order #3): a winner whose DELETE-VECTOR
    delta only ADDS vectors touching data files disjoint from this
    commit's ``affected_paths`` (and from ``dv_touched_paths`` — the
    data files this commit's OWN new DVs touch, so two mor deletes on
    the same file conflict instead of double-counting) also rebases:
    its DV entries are carried forward into the rebased commit, so the
    winner's deletions on kept files survive. A deleted row that could
    have changed this commit's outcome lives in a file BOTH commits
    touched, which the disjointness check rejects. DV changes on
    overlapping files, DV folds/removals, reorg overwrites, and
    restores still raise. Returns ``(new_parent, added_entries,
    (carried_dv_entries, carried_dv_rows, head_dv))``; raises
    SnapshotConflictError otherwise."""
    head = snapshot_versions(table_dir)[-1]
    parent_paths = {
        f["path"] for f in _read_manifest(table_dir, parent)["files"]
    }
    added: list[dict] = []
    cur_dv = parent_dv
    carried_dv: list[dict] = []
    carried_rows = 0
    blocked = set(affected_paths or ()) | set(dv_touched_paths or ())
    for v in range(parent + 1, head + 1):
        w = _read_manifest(table_dir, v)
        w_paths = {f["path"] for f in w["files"]}
        removed = parent_paths - w_paths
        compatible = (w["op"] == "append" and not removed) or (
            w["op"] in ("merge", "delete", "delete-mor")
            and affected_paths is not None
            and not (removed & affected_paths)
        )
        if not compatible:
            raise SnapshotConflictError(
                f"{op} computed against v{parent} but v{v} "
                f"(op={w['op']!r}) rewrote or removed files this "
                f"{op} read — re-run the {op} against the new head"
            )
        w_dv = w.get("dv") or None
        if w_dv != (cur_dv or None):
            new_dv = _dv_delta_entries(cur_dv, w_dv)
            touched = _dv_touched_data_paths(table_dir, new_dv)
            overlap = touched & blocked
            if overlap:
                raise SnapshotConflictError(
                    f"{op} computed against v{parent} but v{v} added "
                    f"delete vectors on files this {op} touched "
                    f"({sorted(overlap)[:3]}…) — re-run the {op} "
                    "against the new head"
                )
            carried_dv.extend(new_dv)
            carried_rows += int((w_dv or {}).get("n_rows") or 0) - int(
                (cur_dv or {}).get("n_rows") or 0
            )
            cur_dv = w_dv
        added.extend(
            f for f in w["files"] if f["path"] not in parent_paths
        )
        parent_paths = w_paths
    if added and winner_guard is not None:
        winner_guard(added)  # raises SnapshotConflictError on overlap
    return head, added, (carried_dv, carried_rows, cur_dv)


def _publish_cow_manifest(
    table_dir: str, parent: int, files: list[dict], op: str, ts: int,
    extra: dict, dv: dict | None = None, cdf: dict | None = None,
    rebase: dict | None = None, max_retries: int = 8,
) -> int:
    """Create-exclusive publish of a copy-on-write commit computed
    against ``parent``.

    Without ``rebase``, a lost race raises SnapshotConflictError
    IMMEDIATELY (no silent retry — the caller's affected-file set is
    stale against the new head and must be recomputed).

    With ``rebase`` (r11) the Delta conflict check runs instead:
    ``rebase`` carries ``affected_paths`` (rel paths this commit
    rewrote/removed from its parent), ``new_entries`` (the file
    entries it wrote), and an optional ``winner_guard(added_entries)``
    for row-level validation of concurrently appended files. When
    every winning commit is a compatible append, the commit REBASES —
    the winner's files ride along untouched, kept files are recomputed
    against the new head — and retries internally; anything else
    raises as before."""
    import json
    import tempfile

    cons = _read_manifest(table_dir, parent).get("constraints")
    parent_dv = (rebase or {}).get("parent_dv")
    for _attempt in range(max_retries):
        version = parent + 1
        out_manifest = {
            "version": version,
            "op": op,
            "ts": ts,
            "n_files": len(files),
            "n_bytes": sum(f["bytes"] for f in files),
            "files": files,
            "extra": extra,
        }
        if cons:  # table property: rides every commit until dropped
            out_manifest["constraints"] = dict(cons)
        if dv and dv.get("files"):
            out_manifest["dv"] = dv
        if cdf and cdf.get("files"):
            out_manifest["cdf"] = cdf
        os.makedirs(os.path.join(table_dir, _SNAP_DIR), exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            suffix=".tmp", dir=os.path.join(table_dir, _SNAP_DIR)
        )
        with os.fdopen(fd, "w") as f:
            json.dump(out_manifest, f, indent=1)
        try:
            os.link(tmp, _manifest_path(table_dir, version))
            return version
        except FileExistsError:
            if rebase is None:
                raise SnapshotConflictError(
                    f"{op} computed against v{parent} but v{version} "
                    f"was committed concurrently — re-run the {op} "
                    "against the new head"
                ) from None
            affected = set(rebase["affected_paths"])
            new_parent, added, dv_carry = _rebase_onto_appends(
                table_dir,
                parent,
                op,
                parent_dv,
                rebase.get("winner_guard"),
                affected_paths=affected,
                dv_touched_paths=rebase.get("dv_touched_paths"),
            )
            carried_dv, carried_rows, head_dv = dv_carry
            if carried_dv:
                # the winner's delete vectors ride forward (r13): its
                # deletions on kept files must survive this commit
                base_dv = dv or {"files": [], "n_rows": 0}
                dv = {
                    "files": list(base_dv.get("files") or [])
                    + carried_dv,
                    "n_rows": int(base_dv.get("n_rows") or 0)
                    + carried_rows,
                }
            # later retry iterations must diff DVs against the head we
            # just rebased onto, not the original parent
            parent_dv = head_dv
            head_files = _read_manifest(table_dir, new_parent)["files"]
            files = [
                f for f in head_files if f["path"] not in affected
            ] + list(rebase["new_entries"])
            # A winner may have been a zero-file ADD/DROP CONSTRAINT
            # commit (a pure append that rebases structurally): adopt
            # the head's constraint set — publishing the parent's
            # stale set would silently drop/resurrect the constraint
            # as a table property. A NEW constraint must also be
            # enforced over rows this commit introduces: callers whose
            # rows are not a subset of already-validated table rows
            # (merge deltas) supply ``recheck_constraints`` to
            # revalidate; a cow delete's survivors were validated by
            # the ADD-constraint commit's own full-table scan, so it
            # passes a no-op. Without a recheck hook, a changed set
            # conflicts conservatively.
            new_cons = _read_manifest(table_dir, new_parent).get(
                "constraints"
            )
            if (new_cons or None) != (cons or None):
                recheck = rebase.get("recheck_constraints")
                if recheck is None:
                    raise SnapshotConflictError(
                        f"{op} raced a constraint change (parent "
                        f"v{parent} vs head v{new_parent}) — re-run "
                        f"the {op} against the new head"
                    )
                recheck(dict(new_cons or {}))
                cons = new_cons
            parent = new_parent
        finally:
            os.unlink(tmp)
    raise SnapshotConflictError(
        f"lost the {op} publish race {max_retries} times on "
        f"{table_dir!r}"
    )


def _delete_winner_guard(spark, table_dir: str, cond, condition: str):
    """Row-level rebase check for DELETE racing an append: the
    concurrently appended files must contain NO row matching the
    delete condition (those rows were never scanned, so rebasing past
    them would silently leave them alive). An unresolvable condition
    over the added files (e.g. it names a column they lack, which
    null-evaluation could MATCH for IS NULL shapes) conflicts
    conservatively."""

    def guard(added_entries):
        paths = [
            os.path.join(table_dir, f["path"]) for f in added_entries
        ]
        try:
            n = (
                spark.read.option("mergeSchema", "true")
                .parquet(*paths)
                .where(cond)
                .limit(1)
                .count()
            )
        except Exception as exc:
            raise SnapshotConflictError(
                f"cannot evaluate {condition!r} over concurrently "
                f"appended files ({exc}) — re-run the delete against "
                "the new head"
            ) from exc
        if n:
            raise SnapshotConflictError(
                "concurrent append added rows matching the delete "
                "condition — re-run the delete against the new head"
            )

    return guard


def snapshot_delete(
    spark: SparkSession,
    table_dir: str,
    condition: str,
    ts: int = SNAP_EPOCH,
    extra: dict | None = None,
    mode: str = "cow",
    cdf: bool = True,
) -> dict:
    """DELETE WHERE over the manifest log — the right-to-erasure
    operation a production corpus must support. Two physical modes:

    - ``cow`` (default, copy-on-write): rows matching ``condition``
      (a SQL boolean expression over the table's columns) are removed
      by rewriting ONLY the files that contain a match; untouched
      files carry by reference. Right for large deletes (the rewrite
      amortizes) and for keeping the read path join-free.
    - ``mor`` (merge-on-read, the Iceberg v2 positional-delete shape):
      NO data file is rewritten — the commit records (file, row
      position) delete vectors, and ``snapshot_read`` anti-joins them
      at scan time. Right for small/frequent deletes on a 100 TB
      table, where rewriting a whole file per matched row would be
      O(file) write I/O for O(1) rows. The read-side cost grows with
      accumulated DVs; :func:`snapshot_compact` (or any overwrite
      commit) folds them away — run it when DV row counts approach a
      few percent of the table.

    Same optimistic concurrency as :func:`snapshot_merge` (lost race
    raises, caller re-runs). NOTE: older versions still CONTAIN the
    rows (time travel is the point of snapshots) — a compliance
    erasure completes with :func:`snapshot_vacuum` to retire
    pre-delete versions; for ``mor`` the matched row DATA also remains
    in the current version's files until a compaction rewrites them,
    so a strict erasure is cow-delete (or mor-delete + compact) +
    vacuum.

    ``cdf=True`` (default) records the deleted rows as change files
    for ``cow`` commits so :func:`snapshot_changes` stays exact over
    them (``mor`` commits need no change files — their delete vectors
    ARE the row-level change record, derived at read time for free).

    Returns ``{version, files_rewritten, files_kept, files_new,
    rows_deleted}``; a condition matching nothing publishes NO new
    version (returns the parent with zeros)."""
    from urllib.parse import unquote, urlparse

    if mode not in ("cow", "mor"):
        raise ValueError("mode must be cow|mor")
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed snapshots under {table_dir}")
    parent = versions[-1]
    manifest = _read_manifest(table_dir, parent)
    if not manifest["files"]:
        return {
            "version": parent, "files_rewritten": 0, "files_kept": 0,
            "files_new": 0, "rows_deleted": 0,
        }
    by_abspath = {
        os.path.normpath(os.path.join(table_dir, f["path"])): f
        for f in manifest["files"]
    }
    cond = F.expr(condition)
    # schema-evolution guard (r11, same rule as snapshot_merge): on a
    # version whose files diverge, evaluate the condition against the
    # UNION schema (old rows null-filled) — first-file schema would
    # either drop evolved columns or make the match depend on which
    # file Spark sampled
    hetero, _union_cols = _version_schema_info(table_dir, manifest)
    reader = (
        spark.read.option("mergeSchema", "true") if hetero else spark.read
    )

    if mode == "mor":
        # positions matching the condition, minus positions an earlier
        # DV already deleted (stacked mor deletes must not double-count)
        matched = (
            reader.parquet(*by_abspath)
            .withColumn("_dv_path", _rel_file_expr(table_dir))
            .withColumn("_dv_pos", F.col("_metadata.row_index"))
            .where(cond)
            .select(
                F.col("_dv_path").alias("path"),
                F.col("_dv_pos").alias("pos"),
            )
        )
        prior = manifest.get("dv") or {}
        if prior.get("files"):
            prior_dv = spark.read.parquet(
                *[os.path.join(table_dir, f["path"]) for f in prior["files"]]
            ).select("path", "pos")
            matched = matched.join(
                F.broadcast(prior_dv), on=["path", "pos"], how="left_anti"
            )
        rows_deleted = matched.count()
        if not rows_deleted:
            return {
                "version": parent, "files_rewritten": 0,
                "files_kept": len(by_abspath), "files_new": 0,
                "rows_deleted": 0,
            }
        dv_files = _write_delete_vectors(spark, table_dir, matched)
        # data files OUR new vectors touch — a concurrent DV winner on
        # any of them conflicts instead of double-counting (r13)
        own_touched = {
            r.path for r in matched.select("path").distinct().collect()
        }
        version = _publish_cow_manifest(
            table_dir, parent, manifest["files"], "delete-mor", ts,
            {
                **(extra or {}),
                "delete_condition": condition,
                "rows_deleted": rows_deleted,
            },
            dv={
                "files": list(prior.get("files") or []) + dv_files,
                "n_rows": int(prior.get("n_rows") or 0) + rows_deleted,
            },
            # mor rewrites nothing: a concurrent append rides along as
            # long as its rows can't match the delete condition
            rebase={
                "affected_paths": set(),
                "new_entries": [],
                "parent_dv": manifest.get("dv"),
                "dv_touched_paths": own_touched,
                "winner_guard": _delete_winner_guard(
                    spark, table_dir, cond, condition
                ),
                # a mor delete writes only delete vectors — removing
                # rows can never violate a CHECK; adopt the head's
                # constraint set with no revalidation (r12)
                "recheck_constraints": lambda c: None,
            },
        )
        return {
            "version": version,
            "files_rewritten": 0,
            "files_kept": len(by_abspath),
            "files_new": 0,
            "rows_deleted": rows_deleted,
        }

    base = reader.parquet(*by_abspath)
    current = _apply_dv(
        spark,
        table_dir,
        manifest,
        base.withColumn("_del_file", F.input_file_name()),
    )
    affected_uris = [
        r["_del_file"]
        for r in current.where(cond)
        .select("_del_file").distinct().collect()
    ]
    affected = sorted(
        os.path.normpath(unquote(urlparse(u).path)) for u in affected_uris
    )
    if not affected:
        return {
            "version": parent, "files_rewritten": 0,
            "files_kept": len(by_abspath), "files_new": 0,
            "rows_deleted": 0,
        }
    cols = base.columns
    affected_frame = reader.parquet(*affected)
    for c in cols:  # the affected subset may predate the evolution
        if c not in affected_frame.columns:
            affected_frame = affected_frame.withColumn(
                c, F.lit(None).cast(base.schema[c].dataType)
            )
    affected_live = _apply_dv(
        spark, table_dir, manifest, affected_frame
    )
    survivors = affected_live.where(~cond).select(*cols)
    n_affected_rows = affected_live.count()
    n_survivors = survivors.count()
    rows_deleted = n_affected_rows - n_survivors
    cdf_entry = None
    if cdf and rows_deleted:
        change = (
            affected_live.where(cond)
            .select(*cols)
            .withColumn(CHANGE_TYPE_COL, F.lit("delete"))
        )
        cdf_entry = {
            "files": _write_change_files(spark, table_dir, change),
            "n_rows": rows_deleted,
        }
    new_files = (
        _write_new_files(
            spark, table_dir, survivors,
            bloom_cols=_manifest_bloom_cols(manifest),
        )
        if n_survivors
        else []
    )
    kept = [
        f for p, f in sorted(by_abspath.items()) if p not in set(affected)
    ]
    version = _publish_cow_manifest(
        table_dir, parent, kept + new_files, "delete", ts,
        {
            **(extra or {}),
            "delete_condition": condition,
            "files_rewritten": len(affected),
            "rows_deleted": rows_deleted,
        },
        # kept files may still carry deleted positions; rewritten
        # files got their DVs folded in, and stale DV rows pointing at
        # replaced paths match nothing (compaction retires them)
        dv=manifest.get("dv"),
        cdf=cdf_entry,
        rebase={
            "affected_paths": {by_abspath[p]["path"] for p in affected},
            "new_entries": new_files,
            "parent_dv": manifest.get("dv"),
            "winner_guard": _delete_winner_guard(
                spark, table_dir, cond, condition
            ),
            # a cow delete's survivors are a SUBSET of rows the
            # concurrent ADD-constraint commit validated with its own
            # full-table scan (winners never touch this delete's
            # affected files) — adopt with no revalidation (r12)
            "recheck_constraints": lambda c: None,
        },
    )
    return {
        "version": version,
        "files_rewritten": len(affected),
        "files_kept": len(kept),
        "files_new": len(new_files),
        "rows_deleted": rows_deleted,
    }


def snapshot_diff(
    table_dir: str, from_version: int, to_version: int | None = None
) -> dict:
    """File-level delta between two committed versions (``from_version
    = 0`` means the empty table). The manifest file lists are the
    entire truth, so this touches NO data files — the primitive behind
    incremental consumption: an append-only history's ``files_added``
    contain exactly the rows added, with per-file ``rows`` counts
    already recorded. ``append_only`` is True when every INTERMEDIATE
    commit still present in the log is an append; copy-on-write ops
    (merge/delete/overwrite/compact) rewrite surviving rows into new
    files, so their file diff over-counts row changes — consumers must
    decide replay vs skip (see ``format("snapshot")``'s
    ``on_rewrite``)."""
    versions = snapshot_versions(table_dir)
    if to_version is None:
        if not versions:
            raise ValueError(f"no committed snapshots under {table_dir}")
        to_version = versions[-1]
    if from_version != 0 and from_version not in versions:
        raise ValueError(f"version {from_version} not in {versions}")
    if to_version not in versions:
        raise ValueError(f"version {to_version} not in {versions}")
    base = (
        {}
        if from_version == 0
        else {
            f["path"]: f
            for f in _read_manifest(table_dir, from_version)["files"]
        }
    )
    head = {
        f["path"]: f
        for f in _read_manifest(table_dir, to_version)["files"]
    }
    added = [f for p, f in sorted(head.items()) if p not in base]
    removed = [f for p, f in sorted(base.items()) if p not in head]
    ops = [
        _read_manifest(table_dir, v)["op"]
        for v in versions
        if from_version < v <= to_version
    ]
    return {
        "from_version": from_version,
        "to_version": to_version,
        "ops": ops,
        "files_added": added,
        "files_removed": removed,
        "append_only": all(op == "append" for op in ops)
        and not removed,
        "rows_added": sum(f.get("rows", 0) for f in added),
        "bytes_added": sum(f["bytes"] for f in added),
        # merge-on-read deletions accumulated across the range (0 when
        # neither endpoint carries DVs); negative after a compaction
        # folded DVs away
        "dv_rows_delta": _dv_rows(table_dir, to_version)
        - (0 if from_version == 0 else _dv_rows(table_dir, from_version)),
    }


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
    on_rewrite: str = "fail",
) -> DataFrame:
    """ROW-level change feed between two committed versions — the
    Delta CDF / Iceberg changelog read (``table_changes()``): every
    row inserted, deleted or updated by the commits in
    ``(from_version, to_version]``, as the table's columns plus
    ``_change_type`` (``insert`` / ``delete`` / ``update_preimage`` /
    ``update_postimage`` — the Delta names) and ``_commit_version``.
    Replaying the feed against a copy of version ``from_version``
    reproduces version ``to_version`` exactly (pinned in tests) — the
    downstream-sync primitive: incremental index updates, cache
    invalidation, audit trails, sibling-table replication.

    Where each commit's changes come from (never a table diff — every
    source is bounded by the CHANGED rows, so a feed over a 100 TB
    table costs O(changes), with per-commit planning manifest-only):

    - ``append``: the files added vs the parent manifest ARE the
      inserted rows;
    - ``merge`` / cow ``delete``: the commit-time change files the
      writer recorded under ``changes/`` (``cdf=True``, the default —
      a rewrite's file diff alone is NOT a row delta, so commits
      written with ``cdf=False`` fall under ``on_rewrite``);
    - ``delete-mor``: the delete vectors added by the commit, joined
      back to their data files — the DV IS the change record, free at
      write time;
    - reorg commits (compact / cluster_by / zorder_by): content-
      preserving by construction (``extra.reorg``, Delta's
      ``dataChange=false``) — emit NOTHING;
    - semantic ``overwrite`` / ``restore`` (and any commit whose row
      delta is unrecoverable): ``on_rewrite="fail"`` (default) raises;
      ``"skip"`` emits nothing for that commit and moves on.

    Schema is pinned to the table's oldest data file (the stream-
    source convention): change rows missing a pinned column null-fill,
    extra columns drop."""
    from functools import reduce

    if on_rewrite not in ("fail", "skip"):
        raise ValueError("on_rewrite must be fail|skip")
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed snapshots under {table_dir}")
    if to_version is None:
        to_version = versions[-1]
    if from_version != 0 and from_version not in versions:
        raise ValueError(f"version {from_version} not in {versions}")
    if to_version not in versions:
        raise ValueError(f"version {to_version} not in {versions}")

    base = None
    for v in versions:
        files = _read_manifest(table_dir, v)["files"]
        if files:
            base = spark.read.parquet(
                os.path.join(table_dir, files[0]["path"])
            ).limit(0)
            break
    if base is None:
        raise ValueError(
            f"no version of {table_dir!r} has any data file to define "
            "a schema"
        )
    fields = base.columns
    dtypes = dict(base.dtypes)

    def _shape(df: DataFrame, version: int) -> DataFrame:
        cols = []
        have = set(df.columns)
        for name in fields:
            if name in have:
                cols.append(F.col(name))
            else:  # evolution: pinned column absent from this commit
                cols.append(F.lit(None).cast(dtypes[name]).alias(name))
        cols.append(F.col(CHANGE_TYPE_COL))
        cols.append(
            F.lit(int(version)).cast("long").alias(COMMIT_VERSION_COL)
        )
        return df.select(*cols)

    def _vacuumed(v: int) -> ValueError:
        return ValueError(
            f"cannot derive changes for commit v{v}: its parent "
            f"manifest v{v - 1} was vacuumed — start the feed from an "
            "existing version"
        )

    pieces: list[DataFrame] = []
    for v in range(from_version + 1, to_version + 1):
        if v not in versions:
            raise ValueError(
                f"cannot derive changes for commit v{v}: its manifest "
                "was vacuumed — start the feed from an existing version"
            )
        m = _read_manifest(table_dir, v)
        op = m["op"]
        extra = m.get("extra") or {}
        if op == "append":
            if v - 1 > 0 and v - 1 not in versions:
                raise _vacuumed(v)
            parent_paths = (
                {
                    f["path"]
                    for f in _read_manifest(table_dir, v - 1)["files"]
                }
                if v - 1 > 0
                else set()
            )
            added = [
                os.path.join(table_dir, f["path"])
                for f in m["files"]
                if f["path"] not in parent_paths
            ]
            if not added:
                continue
            pieces.append(
                _shape(
                    spark.read.parquet(*added).withColumn(
                        CHANGE_TYPE_COL, F.lit("insert")
                    ),
                    v,
                )
            )
        elif op in ("merge", "delete"):
            cdfm = m.get("cdf") or {}
            if cdfm.get("files"):
                pieces.append(
                    _shape(
                        spark.read.parquet(
                            *[
                                os.path.join(table_dir, f["path"])
                                for f in cdfm["files"]
                            ]
                        ),
                        v,
                    )
                )
            elif on_rewrite == "fail":
                raise ValueError(
                    f"commit v{v} is op={op!r} but recorded no change "
                    "files (written with cdf=False): its row delta "
                    "cannot be reconstructed. Set on_rewrite='skip' to "
                    "move past it."
                )
        elif op == "delete-mor":
            if v - 1 not in versions:
                raise _vacuumed(v)
            prior = {
                f["path"]
                for f in (
                    _read_manifest(table_dir, v - 1).get("dv") or {}
                ).get("files", [])
            }
            new_dv = [
                os.path.join(table_dir, f["path"])
                for f in (m.get("dv") or {}).get("files", [])
                if f["path"] not in prior
            ]
            if not new_dv:
                continue
            dvf = spark.read.parquet(*new_dv).select(
                F.col("path").alias("_dv_path"),
                F.col("pos").alias("_dv_pos"),
            )
            # only the files the DVs actually touch are scanned —
            # the DV frame is small (mor is the small-delete mode)
            touched = sorted(
                {
                    r["_dv_path"]
                    for r in dvf.select("_dv_path").distinct().collect()
                }
            )
            scan = (
                spark.read.parquet(
                    *[os.path.join(table_dir, p) for p in touched]
                )
                .withColumn("_row_path", _rel_file_expr(table_dir))
                .withColumn("_row_pos", F.col("_metadata.row_index"))
            )
            deleted = (
                scan.join(
                    F.broadcast(dvf),
                    (scan["_row_path"] == dvf["_dv_path"])
                    & (scan["_row_pos"] == dvf["_dv_pos"]),
                    "inner",
                )
                .drop("_row_path", "_row_pos", "_dv_path", "_dv_pos")
                .withColumn(CHANGE_TYPE_COL, F.lit("delete"))
            )
            pieces.append(_shape(deleted, v))
        elif op == "overwrite" and extra.get("reorg"):
            continue  # content-preserving reorganization: no changes
        elif on_rewrite == "fail":
            raise ValueError(
                f"commit v{v} is op={op!r}: its row delta is not "
                "recorded (a full replace has no bounded change set). "
                "Set on_rewrite='skip' to move past it, or start the "
                "feed after it."
            )
    if not pieces:
        return _shape(
            base.withColumn(CHANGE_TYPE_COL, F.lit("insert")), 0
        ).limit(0)
    return reduce(lambda a, b: a.unionByName(b), pieces)


def snapshot_mirror(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    keys: list[str],
    ts: int = SNAP_EPOCH,
    extra: dict | None = None,
    maintain_cluster_col: str | None = None,
    target_mb: float = 128.0,
) -> dict:
    """Bootstrap-sync a DRIFTED replica as one merge commit (r12,
    VERDICT r11 order #6) — the full-mirror move
    :func:`snapshot_replicate` cannot make when the destination's
    history diverged from the change feed (manual edits, a restored
    version, a feed gap past vacuum): make ``dst`` row-identical to
    ``src`` WITHOUT a full overwrite.

    changed = src_live ∖ dst_live (multiset except — rows missing or
    differing in dst) becomes the upsert delta; the WHEN NOT MATCHED
    BY SOURCE THEN DELETE clause (``source_keys`` = the FULL src key
    set, so pre-filtering the delta to changed rows cannot nuke
    unchanged dst rows) removes dst keys absent from src. Only files
    actually containing a changed/absent key rewrite; identical
    replicas commit nothing. CDF records the deletes, so downstream
    feeds keep working. Cost: one full-row compare shuffle of both
    tables (that IS bootstrap), then drift-bounded copy-on-write.

    Requires a keyed src (one live row per key — the
    :func:`snapshot_replicate` table model) and matching column sets.

    ``maintain_cluster_col`` (r13, VERDICT order #6) makes
    bootstrap→sync→cluster one call: after the sync commit the
    :func:`snapshot_maintain` policy runs with the merge's rewrite
    fraction fed in — a scatter-degraded sync (most files rewritten)
    or tripped file/DV thresholds recluster on the spot, keeping later
    merges at the bounded min(K, files) economics; a healthy sync adds
    no version. The audit dict lands under ``result['maintain']``."""
    src_live = snapshot_read(spark, src_dir)
    dst_live = snapshot_read(spark, dst_dir)
    if set(src_live.columns) != set(dst_live.columns):
        raise ValueError(
            f"mirror requires matching columns: src {src_live.columns} "
            f"vs dst {dst_live.columns}"
        )
    changed = src_live.exceptAll(dst_live.select(*src_live.columns))
    if not changed.count():
        # still honor pure-delete drift (extra dst keys, no changes)
        absent = (
            dst_live.select(*keys).distinct()
            .join(src_live.select(*keys).distinct(), on=keys, how="left_anti")
        )
        if not absent.count():
            head = snapshot_versions(dst_dir)[-1]
            return {"version": head, "files_rewritten": 0,
                    "files_kept": len(_read_manifest(dst_dir, head)["files"]),
                    "files_new": 0, "rows_replaced": 0,
                    "rows_inserted": 0, "rows_deleted": 0}
    res = snapshot_merge(
        changed,
        dst_dir,
        keys,
        ts=ts,
        extra={**(extra or {}), "mirror_src": os.path.abspath(src_dir)},
        not_matched_by_source="delete",
        source_keys=src_live.select(*keys),
    )
    if maintain_cluster_col is not None:
        res["maintain"] = _maintain_after_sync(
            spark, dst_dir, maintain_cluster_col, target_mb, ts, res
        )
    return res


def _maintain_after_sync(
    spark: SparkSession,
    dst_dir: str,
    cluster_col: str,
    target_mb: float,
    ts: int,
    merge_res: dict | None,
) -> dict:
    """Shared mirror/replicate post-sync hook: feed the sync's rewrite
    fraction into the maintain policy. A bootstrap append (no merge
    stats) counts as fraction 1.0 — the fresh replica is one
    unclustered blob, exactly the state where the next merge degrades
    to a full rewrite (the measured 1.0 fraction, CLAUDE.md r10)."""
    if merge_res is None:
        frac = 1.0
    else:
        rw = merge_res.get("files_rewritten", 0)
        kept = merge_res.get("files_kept", 0)
        frac = rw / max(1, rw + kept)
    return snapshot_maintain(
        spark,
        dst_dir,
        target_mb=target_mb,
        cluster_col=cluster_col,
        ts=ts,
        last_rewrite_frac=frac,
    )


def snapshot_replicate(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    keys: list[str],
    ts: int = SNAP_EPOCH,
    on_rewrite: str = "fail",
    maintain_cluster_col: str | None = None,
    target_mb: float = 128.0,
) -> dict:
    """Keyed CDC apply: land everything that happened to ``src_dir``
    since the last sync as ONE commit on ``dst_dir`` — the
    change-feed-consumer loop every sibling table (a search index, a
    regional replica, a downstream feature store) runs against a
    production corpus. Incremental and exactly-once by the same
    mechanism as ``build_corpus_incremental``: the destination commit
    carries the consumed source version in its manifest ``extra``
    (``replicate_src_version``), so the high-water mark advances
    ATOMICALLY with the data — a crash between syncs just re-derives
    the same net changes and re-applies them to the same effect.

    Per sync: read :func:`snapshot_changes` over ``(high_water,
    src_head]``, reduce to the NET outcome per key (latest
    non-preimage change wins — a key updated five times lands once),
    and apply upserts + deletes through ONE :func:`snapshot_merge`
    commit (``delete_keys``). Cost is O(changed rows) on the source
    side and O(affected files + changes) on the destination — never a
    table diff, which is the point at 100 TB.

    First sync onto an empty destination bootstraps with a plain
    commit. A range with no net changes (e.g. only reorg commits)
    applies nothing and leaves the high-water mark where it was (the
    skipped commits are manifest-cheap to re-classify next sync). A
    destination racing another writer raises
    :class:`SnapshotConflictError` through the merge — re-run.
    Returns ``{from_version, to_version, version, rows_upserted,
    rows_deleted, applied}``.

    Vacuum caveat: the high-water mark lives in the newest RETAINED
    destination manifest that carries one — ``snapshot_vacuum`` on the
    destination with a ``keep_last`` smaller than the number of
    commits since the last sync can drop it, after which the next
    sync re-derives from 0. With keys that re-apply is IDEMPOTENT
    (upserts replace, deletes re-delete) but needs source history
    back to 0 — a vacuumed source range raises instead (never silent
    double-apply). Keep the destination's vacuum horizon at least one
    sync deep.

    ``maintain_cluster_col`` (r13, VERDICT order #6): run the
    :func:`snapshot_maintain` policy after each applied sync with the
    merge's rewrite fraction fed in — a bootstrap append or a
    scatter-degraded merge (the measured 1.0 rewrite fraction on
    unclustered replicas) reclusters immediately, keeping subsequent
    syncs at bounded rewrite economics; healthy syncs add no version.
    Audit dict under ``result['maintain']``."""
    src_id = os.path.abspath(src_dir)
    src_versions = snapshot_versions(src_dir)
    if not src_versions:
        raise ValueError(f"no committed snapshots under {src_dir}")
    to_version = src_versions[-1]

    high_water = 0
    for v in reversed(snapshot_versions(dst_dir)):
        extra = _read_manifest(dst_dir, v).get("extra") or {}
        if "replicate_src_version" in extra:
            if extra.get("replicate_src") not in (None, src_id):
                raise ValueError(
                    f"{dst_dir!r} replicates {extra.get('replicate_src')!r},"
                    f" not {src_id!r} — one source feed per destination"
                )
            high_water = int(extra["replicate_src_version"])
            break
    out = {
        "from_version": high_water,
        "to_version": to_version,
        "version": None,
        "rows_upserted": 0,
        "rows_deleted": 0,
        "applied": False,
    }
    if to_version <= high_water:
        return out  # nothing new

    changes = snapshot_changes(
        spark, src_dir, high_water, to_version, on_rewrite=on_rewrite
    )
    upserts, deletes = _net_outcome(changes, keys)
    n_up, n_del = upserts.count(), deletes.count()
    if not n_up and not n_del:
        return out  # reorg/skip-only range: high water stays put

    hw_extra = {
        "replicate_src": src_id,
        "replicate_src_version": to_version,
    }
    version, merge_res = _apply_net(
        upserts, deletes if n_del else None, dst_dir, keys, ts, hw_extra
    )
    out.update(
        version=version,
        rows_upserted=n_up,
        rows_deleted=n_del,
        applied=True,
    )
    if maintain_cluster_col is not None:
        out["maintain"] = _maintain_after_sync(
            spark, dst_dir, maintain_cluster_col, target_mb, ts, merge_res
        )
    return out


def _net_outcome(changes: DataFrame, keys: list[str]):
    """Reduce a CDF slice to its NET outcome per key: preimages are
    never an outcome (always paired with their postimage), then the
    latest commit wins. The secondary keys make row_number
    deterministic when ONE source commit carries duplicate rows for a
    key (r11: xxhash64 over the full row is a sort key only, never an
    output value). Returns ``(upserts, delete_keys)``."""
    from pyspark.sql.window import Window

    cols = [
        c
        for c in changes.columns
        if c not in (CHANGE_TYPE_COL, COMMIT_VERSION_COL)
    ]
    net = changes.where(
        F.col(CHANGE_TYPE_COL) != "update_preimage"
    ).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(
                F.col(COMMIT_VERSION_COL).desc(),
                F.col(CHANGE_TYPE_COL).desc(),
                F.xxhash64(*cols).desc(),
            )
        ),
    ).where(F.col("_rk") == 1)
    upserts = net.where(
        F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage")
    ).select(*cols)
    deletes = net.where(F.col(CHANGE_TYPE_COL) == "delete").select(*keys)
    return upserts, deletes


def _apply_net(
    upserts: DataFrame,
    deletes: DataFrame | None,
    dst_dir: str,
    keys: list[str],
    ts: int,
    extra: dict,
) -> tuple[int, dict | None]:
    """Land one net change set as ONE destination commit: bootstrap
    append on an empty destination (deletes of never-present keys are
    no-ops), keyed merge with WHEN-MATCHED-DELETE otherwise. Returns
    ``(version, merge_stats)`` — stats None for the bootstrap append
    (the maintain hook treats that as fully-scattered, r13)."""
    if not snapshot_versions(dst_dir):
        return snapshot_commit(
            upserts, dst_dir, mode="append", ts=ts, extra=extra
        ), None
    res = snapshot_merge(
        upserts, dst_dir, keys, ts=ts, extra=extra, delete_keys=deletes
    )
    return res["version"], res


def snapshot_replicate_stream(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    keys: list[str],
    checkpoint: str,
    ts: int = SNAP_EPOCH,
    on_rewrite: str = "fail",
    block: bool = True,
    timeout_sec: float = 300.0,
):
    """Continuous CDC (r11, VERDICT order #5): the streaming twin of
    :func:`snapshot_replicate`, composed from the existing pieces —
    the ``format("snapshot")`` change-feed stream source
    (``read_changes``) driving ``foreachBatch``, each micro-batch
    reduced to its net outcome and landed as ONE destination merge.

    Exactly-once across restarts by the ``SnapshotStreamWriter`` epoch
    mechanism: every applied batch's destination commit carries
    ``(replicate_stream, replicate_stream_batch)`` in its manifest
    extra; when Structured Streaming replays a batch whose commit
    already landed (crash between commit and checkpoint ack), the
    apply detects the marker and folds to a no-op. Each commit also
    records ``replicate_src_version`` (the batch's max source commit),
    so batch-mode :func:`snapshot_replicate` can take over from where
    the stream stopped and vice versa — one high-water protocol.

    With ``block=True`` (default) runs an ``availableNow`` drain and
    returns ``{batches_applied, version}``; with ``block=False``
    returns the started StreamingQuery (continuous mode — the caller
    owns its lifecycle). A destination racing another writer raises
    through the merge and fails the stream; restarting replays the
    batch (exactly-once holds — the failed attempt committed
    nothing)."""
    from teste_carga_avro_vs_json_spark.sources import snapshot_source as ss

    ss.register(spark)
    src_id = os.path.abspath(src_dir)
    stream_id = f"cdc:{src_id}"
    applied = {"n": 0, "version": None}

    def apply_batch(batch_df, batch_id: int) -> None:
        for v in reversed(snapshot_versions(dst_dir)):
            ex = _read_manifest(dst_dir, v).get("extra") or {}
            if ex.get("replicate_stream") == stream_id:
                if int(ex.get("replicate_stream_batch", -1)) >= batch_id:
                    return  # replayed epoch: already applied
                break
            if (
                "replicate_src" in ex
                and ex["replicate_src"] != src_id
            ):
                raise ValueError(
                    f"{dst_dir!r} replicates {ex['replicate_src']!r}, "
                    f"not {src_id!r} — one source feed per destination"
                )
        upserts, deletes = _net_outcome(batch_df, keys)
        n_up, n_del = upserts.count(), deletes.count()
        if not n_up and not n_del:
            return  # reorg/skip-only batch
        hw = batch_df.agg(
            F.max(COMMIT_VERSION_COL).cast("long")
        ).collect()[0][0]
        version, _merge_res = _apply_net(
            upserts,
            deletes if n_del else None,
            dst_dir,
            keys,
            ts,
            {
                "replicate_src": src_id,
                "replicate_src_version": int(hw),
                "replicate_stream": stream_id,
                "replicate_stream_batch": int(batch_id),
            },
        )
        applied["n"] += 1
        applied["version"] = version

    reader = (
        spark.readStream.format("snapshot")
        .option("read_changes", "true")
        .option("on_rewrite", on_rewrite)
    )
    writer = (
        reader.load(src_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
    )
    if not block:
        return writer.start()
    q = writer.trigger(availableNow=True).start()
    if not q.awaitTermination(timeout_sec):
        # the availableNow drain is STILL RUNNING: returning partial
        # counts would look complete and leak the query — stop it and
        # raise instead (ADVICE r11)
        q.stop()
        raise TimeoutError(
            f"snapshot_replicate_stream drain exceeded {timeout_sec}s "
            f"({applied['n']} batch(es) applied before the stop)"
        )
    return {"batches_applied": applied["n"], "version": applied["version"]}


def _dv_rows(table_dir: str, version: int) -> int:
    return (
        _read_manifest(table_dir, version).get("dv") or {}
    ).get("n_rows", 0)


def snapshot_history(table_dir: str) -> list[dict]:
    """Per-version audit log from the manifests alone (the Delta
    DESCRIBE HISTORY shape): version, op, ts, file/byte/row counts,
    accumulated merge-on-read deletions, and the commit's application
    ``extra`` metadata. Touches NO data files."""
    out = []
    for v in snapshot_versions(table_dir):
        m = _read_manifest(table_dir, v)
        out.append(
            {
                "version": v,
                "op": m["op"],
                "ts": m["ts"],
                "n_files": m["n_files"],
                "n_bytes": m["n_bytes"],
                "n_rows": sum(f.get("rows", 0) for f in m["files"]),
                "dv_rows": (m.get("dv") or {}).get("n_rows", 0),
                "cdf_rows": (m.get("cdf") or {}).get("n_rows", 0),
                "extra": m.get("extra") or {},
            }
        )
    return out


def snapshot_restore(
    table_dir: str, version: int, ts: int = SNAP_EPOCH
) -> int:
    """RESTORE: make an older version the new head by publishing its
    file list (and delete vectors) as a NEW commit — history moves
    only forward, so the bad versions stay inspectable and a
    concurrent writer races the same create-exclusive publish as every
    other commit (lost race raises; re-run after reviewing the new
    head). Manifest-only: no data file is read, written or moved —
    the O(1)-data rollback a 100 TB table needs. The restored version
    must still exist (not vacuumed)."""
    versions = snapshot_versions(table_dir)
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    src = _read_manifest(table_dir, version)
    return _publish_cow_manifest(
        table_dir,
        versions[-1],
        src["files"],
        "restore",
        ts,
        {"restored_version": version},
        dv=src.get("dv"),
    )


def snapshot_maintain(
    spark: SparkSession,
    table_dir: str,
    target_mb: float = 128.0,
    max_dv_frac: float = 0.02,
    file_slack: float = 2.0,
    cluster_col: str | None = None,
    ts: int = SNAP_EPOCH,
    last_rewrite_frac: float | None = None,
    max_rewrite_frac: float = 0.5,
) -> dict:
    """The auto-OPTIMIZE policy loop a production table runs after
    churn (what Delta's auto-compaction + DV-threshold maintenance
    automate): inspect the HEAD manifest only and rewrite exactly when
    a documented threshold trips —

    - accumulated merge-on-read deletions exceed ``max_dv_frac`` of
      live rows (the read-side anti-join has grown past its budget:
      fold the DVs away), or
    - the file count exceeds ``file_slack ×`` the byte-planned count
      at ``target_mb`` (small-file churn from frequent appends/syncs:
      compact).

    The rewrite is :func:`snapshot_cluster_by` when ``cluster_col`` is
    given (restoring the merge/skipping economics in the same pass —
    the right default for keyed tables) else :func:`snapshot_compact`.
    r13 (VERDICT order #6): ``last_rewrite_frac`` — the fraction of
    files the CALLER's just-committed keyed merge rewrote — trips a
    ``rewrite_fraction`` recluster (requires ``cluster_col``) when it
    exceeds ``max_rewrite_frac``. Key scatter is invisible in the
    manifest (file counts and DV rows look healthy while every merge
    rewrites the whole table — the measured 1.0 fraction on
    unclustered replicas, CLAUDE.md r10); the merge outcome itself is
    the evidence, so the sync paths (:func:`snapshot_mirror` /
    :func:`snapshot_replicate` with ``maintain_cluster_col``) feed it
    back here.

    No threshold tripped = NO new version (decide from the manifest,
    never scan data to decide). Returns the audit dict
    ``{acted, reason, n_files, planned_files, dv_rows, live_rows,
    version}`` — the no-silent-caps rule applied to maintenance."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed snapshots under {table_dir}")
    head = versions[-1]
    m = _read_manifest(table_dir, head)
    n_files = m["n_files"]
    planned = plan_output_files(m["n_bytes"], target_mb)
    dv_rows = (m.get("dv") or {}).get("n_rows", 0)
    total_rows = sum(f.get("rows", 0) for f in m["files"])
    live_rows = max(total_rows - dv_rows, 1)
    out = {
        "acted": False,
        "reason": None,
        "n_files": n_files,
        "planned_files": planned,
        "dv_rows": dv_rows,
        "live_rows": live_rows,
        "version": head,
    }
    if dv_rows and dv_rows > max_dv_frac * live_rows:
        out["reason"] = "dv_fraction"
    elif (
        cluster_col is not None
        and last_rewrite_frac is not None
        and last_rewrite_frac > max_rewrite_frac
    ):
        out["reason"] = "rewrite_fraction"
    elif n_files > file_slack * planned:
        out["reason"] = "file_count"
    else:
        return out
    if cluster_col is not None:
        res = snapshot_cluster_by(
            spark, table_dir, cluster_col, target_mb=target_mb, ts=ts
        )
    else:
        res = snapshot_compact(spark, table_dir, target_mb=target_mb, ts=ts)
    out["acted"] = True
    out["version"] = res["version"]
    return out


def snapshot_vacuum(
    table_dir: str, keep_last: int = 2, grace_sec: float = 600.0
) -> list[str]:
    """Retire old versions: drop all but the last ``keep_last``
    manifests, then delete data files no RETAINED manifest references.
    Returns the deleted paths (no silent destruction). The deletion
    order (manifests first) means a crashed vacuum can only strand
    unreferenced files, never break a readable version.

    ``grace_sec`` (r12): files YOUNGER than this are never deleted —
    the Delta retention check. A concurrent writer materializes its
    attempt-unique data files BEFORE the create-exclusive manifest
    publish; without the grace window a racing vacuum would see them
    as unreferenced, delete them, and the commit would then publish a
    manifest pointing at nothing (silent table corruption on the next
    read). Fresh orphans from FAILED attempts age past the window and
    are reclaimed by the next vacuum. ``grace_sec=0`` restores the
    immediate sweep (single-writer maintenance windows only)."""
    import time as _time

    versions = snapshot_versions(table_dir)
    retained = versions[-keep_last:] if keep_last > 0 else []
    live: set[str] = set()
    for v in retained:
        manifest = _read_manifest(table_dir, v)
        for f in manifest["files"]:
            live.add(os.path.normpath(os.path.join(table_dir, f["path"])))
        for f in (manifest.get("dv") or {}).get("files", []):
            live.add(os.path.normpath(os.path.join(table_dir, f["path"])))
        for f in (manifest.get("cdf") or {}).get("files", []):
            live.add(os.path.normpath(os.path.join(table_dir, f["path"])))
    removed = []
    for v in versions:
        if v not in retained:
            os.remove(_manifest_path(table_dir, v))
    cutoff = _time.time() - grace_sec
    for sub in ("data", "deletes", "changes"):
        for dirpath, _dirs, names in os.walk(os.path.join(table_dir, sub)):
            for name in names:
                path = os.path.normpath(os.path.join(dirpath, name))
                if not name.endswith(".parquet") or path in live:
                    continue
                try:
                    if os.path.getmtime(path) > cutoff:
                        continue  # possibly an in-flight commit's file
                except OSError:
                    continue  # deleted concurrently: nothing to do
                os.remove(path)
                removed.append(path)
    return sorted(removed)
