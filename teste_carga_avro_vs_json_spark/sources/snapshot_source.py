"""``format("snapshot")`` — a Structured Streaming SOURCE over the
manifest-log snapshot tables of :mod:`operators.maintenance` (the
Delta/Iceberg "table streaming / change feed" pattern on plain
parquet).

Offsets ARE committed version numbers: micro-batch N+1 contains the
rows of every file ADDED between the last consumed version and the
current head, stepped version by version against each commit's parent
manifest — so an append-only producer (``snapshot_commit(mode=
"append")``, ``build_corpus_incremental``) streams EXACTLY-ONCE into
any downstream pipeline (the broadcast-model streaming twins, Kafka
sinks, windowed aggs), with replay driven by the immutable manifests
(``readBetweenOffsets`` re-reads the same version range and gets the
same rows, byte for byte).

Copy-on-write commits (merge / delete / overwrite / compact /
cluster_by) REWRITE surviving rows into new files, so their file diff
is not a row delta. ``on_rewrite`` picks the policy, mirroring Delta's
streaming-source options:

- ``fail`` (default) — stop the stream with a clear error (the
  consumer must decide; silently replaying merged files would
  double-count surviving rows);
- ``skip`` — emit nothing for that commit and move past it (Delta's
  ``skipChangeCommits``: correct when downstream only needs NEW
  entities, e.g. dedup gates keyed on content).

Options: ``path`` (the table dir, required), ``starting_version``
(``"earliest"`` = everything since v1, the default; ``"latest"`` =
only commits after stream start; or an integer N = "already consumed
through N"), ``on_rewrite`` (above), ``max_versions_per_batch``
(flow control; default all available).

Scale notes: the full ``DataSourceStreamReader`` contract — the
driver plans a micro-batch from MANIFESTS ONLY (one InputPartition
per added file) and each Spark task reads its parquet file
executor-side, so batch parallelism is the file count, the driver
never touches row data, and a large backfill is just a wide batch.
(Bootstrapping a 100 TB base is still better done with
``snapshot_read`` — prunable, no per-batch planning — then stream
with ``starting_version`` set to that base version.) The schema is
pinned at stream start from the table's first data file; files later
appended with EXTRA columns have them dropped, files missing pinned
columns null-fill (the merge-schema caveat of ``snapshot_read``
applies to streams too).

A vacuumed parent manifest (``snapshot_vacuum`` retiring versions the
stream has not consumed yet) raises — the missing history cannot be
reconstructed, matching Delta's "version no longer available".

No SQL oracle: DuckDB has no streaming; pinned by stream==batch
equality in tests/test_snapshot_source.py (the documented convention
for streaming twins).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

try:  # pickle-by-value: executors don't need the repo on PYTHONPATH
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


def _mt():
    from teste_carga_avro_vs_json_spark.operators import maintenance

    return maintenance


def _table_schema_arrow(table_dir: str):
    """Arrow schema from the FIRST data file of the oldest version
    that has one (footer read only)."""
    import pyarrow.parquet as pq

    mt = _mt()
    for v in mt.snapshot_versions(table_dir):
        files = mt._read_manifest(table_dir, v)["files"]
        if files:
            path = os.path.join(table_dir, files[0]["path"])
            return pq.ParquetFile(path).schema_arrow
    raise ValueError(
        f"no version of {table_dir!r} has any data file to define a schema"
    )


class _FilePartition(InputPartition):
    """One added data file of the micro-batch's version range — read
    executor-side."""

    def __init__(self, table_dir: str, rel_path: str, fields: list[str]):
        self.table_dir = table_dir
        self.rel_path = rel_path
        self.fields = fields


class SnapshotStreamReader(DataSourceStreamReader):
    """Version-stepped micro-batches; the offset is ``{"version": N}``
    = "consumed through commit N". The driver plans from manifests
    only; rows are read in the tasks."""

    def __init__(self, options):
        self.table_dir = options.get("path") or options.get("table_dir")
        if not self.table_dir:
            raise ValueError("format('snapshot') requires a path")
        self.on_rewrite = str(options.get("on_rewrite", "fail"))
        if self.on_rewrite not in ("fail", "skip"):
            raise ValueError("on_rewrite must be fail|skip")
        self.max_versions = int(options.get("max_versions_per_batch", 0))
        self.starting = str(options.get("starting_version", "earliest"))
        self._fields = [f.name for f in _table_schema_arrow(self.table_dir)]
        #: pacing cursor: the last offset this reader handed to Spark
        #: (latestOffset must not leap past max_versions_per_batch)
        self._cur: int | None = None

    # -- offsets
    def initialOffset(self) -> dict:
        mt = _mt()
        if self.starting == "earliest":
            off = 0
        elif self.starting == "latest":
            versions = mt.snapshot_versions(self.table_dir)
            off = versions[-1] if versions else 0
        else:
            off = int(self.starting)
        self._cur = off
        return {"version": off}

    def latestOffset(self) -> dict:
        mt = _mt()
        versions = mt.snapshot_versions(self.table_dir)
        head = versions[-1] if versions else 0
        if self._cur is None:
            self._cur = int(self.initialOffset()["version"])
        end = head
        if self.max_versions > 0:
            end = min(head, self._cur + self.max_versions)
        end = max(end, self._cur)
        self._cur = end
        return {"version": end}

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; nothing to finalize here
        pass

    def _added_paths(self, version: int) -> list[str]:
        """Relative paths added by commit ``version`` vs its direct
        parent, applying the rewrite policy. Manifest-only."""
        mt = _mt()
        versions = mt.snapshot_versions(self.table_dir)
        manifest = mt._read_manifest(self.table_dir, version)
        if version - 1 > 0 and version - 1 not in versions:
            raise ValueError(
                f"cannot stream commit v{version}: its parent manifest "
                f"v{version - 1} was vacuumed — restart the stream from "
                "an existing version (starting_version)"
            )
        if manifest["op"] != "append":
            if self.on_rewrite == "fail":
                raise ValueError(
                    f"commit v{version} is op={manifest['op']!r} (copy-on-"
                    "write rewrite): its file diff is not a row delta. "
                    "Set on_rewrite='skip' to move past rewrite commits, "
                    "or restart from a newer starting_version."
                )
            return []
        parent_paths = (
            {
                f["path"]
                for f in mt._read_manifest(
                    self.table_dir, version - 1
                )["files"]
            }
            if version - 1 > 0
            else set()
        )
        return [
            f["path"]
            for f in manifest["files"]
            if f["path"] not in parent_paths
        ]

    def partitions(self, start: dict, end: dict):
        paths = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            paths.extend(self._added_paths(v))
        # deterministic plan: replay of a committed range (restart
        # recovery) re-derives the identical partition list from the
        # immutable manifests
        return [
            _FilePartition(self.table_dir, p, self._fields)
            for p in paths
        ]

    def read(self, partition: _FilePartition):
        """Executor-side: one parquet file, projected onto the pinned
        schema (extra columns dropped, missing columns null-filled)."""
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(partition.table_dir, partition.rel_path)
        )
        cols = {}
        for name in partition.fields:
            if name in tbl.column_names:
                cols[name] = tbl.column(name).to_pylist()
            else:
                cols[name] = [None] * len(tbl)
        return iter(
            tuple(cols[n][i] for n in partition.fields)
            for i in range(len(tbl))
        )


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self):
        try:
            from pyspark.sql.pandas.types import from_arrow_schema
        except ImportError:  # pragma: no cover - very old pyspark
            from pyspark.sql.pandas.types import (  # type: ignore
                from_arrow_schema,
            )
        table_dir = self.options.get("path") or self.options.get(
            "table_dir"
        )
        if not table_dir:
            raise ValueError("format('snapshot') requires a path")
        return from_arrow_schema(_table_schema_arrow(table_dir))

    def reader(self, schema):
        raise NotImplementedError(
            "batch reads of snapshot tables go through "
            "maintenance.snapshot_read (manifest-pinned native parquet "
            "scan with data skipping) — format('snapshot') is the "
            "STREAMING surface"
        )

    def streamReader(self, schema):
        return SnapshotStreamReader(self.options)


def register(spark) -> None:
    """``spark.dataSource.register`` wrapper (idempotent)."""
    spark.dataSource.register(SnapshotDataSource)
