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

Scale notes: this is a SimpleDataSourceStreamReader — rows of a
micro-batch flow through the driver, which is the right cost class
for CONTINUOUS TAIL CONSUMPTION (per-commit deltas: thousands of
docs, not the corpus). Bootstrapping a 100 TB table through it would
be wrong — do the base load with ``snapshot_read`` (manifest-pinned,
fully parallel, prunable) and stream with ``starting_version`` set to
that base version. The schema is pinned at stream start from the
table's first data file; files later appended with EXTRA columns have
them dropped, files missing pinned columns null-fill (the
merge-schema caveat of ``snapshot_read`` applies to streams too).

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
    SimpleDataSourceStreamReader,
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


class SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Version-stepped micro-batches; the offset is ``{"version": N}``
    = "consumed through commit N"."""

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

    # -- offsets
    def initialOffset(self) -> dict:
        mt = _mt()
        if self.starting == "earliest":
            return {"version": 0}
        versions = mt.snapshot_versions(self.table_dir)
        if self.starting == "latest":
            return {"version": versions[-1] if versions else 0}
        return {"version": int(self.starting)}

    # -- row materialization
    def _rows_for_step(self, version: int):
        """Rows added by commit ``version`` relative to its direct
        parent — projected onto the pinned schema (extra columns
        dropped, missing columns null-filled)."""
        import pyarrow.parquet as pq

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
        rows = []
        for entry in manifest["files"]:
            if entry["path"] in parent_paths:
                continue
            tbl = pq.read_table(
                os.path.join(self.table_dir, entry["path"])
            )
            cols = {}
            for name in self._fields:
                if name in tbl.column_names:
                    cols[name] = tbl.column(name).to_pylist()
                else:
                    cols[name] = [None] * len(tbl)
            rows.extend(
                tuple(cols[n][i] for n in self._fields)
                for i in range(len(tbl))
            )
        return rows

    def _step_range(self, start_v: int, end_v: int):
        rows = []
        for v in range(start_v + 1, end_v + 1):
            rows.extend(self._rows_for_step(v))
        return rows

    # -- SimpleDataSourceStreamReader contract
    def read(self, start: dict):
        mt = _mt()
        start_v = int(start["version"])
        versions = mt.snapshot_versions(self.table_dir)
        head = versions[-1] if versions else 0
        if head <= start_v:
            return iter([]), {"version": start_v}
        end_v = head
        if self.max_versions > 0:
            end_v = min(head, start_v + self.max_versions)
        return iter(self._step_range(start_v, end_v)), {"version": end_v}

    def readBetweenOffsets(self, start: dict, end: dict):
        # committed-range replay: manifests are immutable, so the same
        # version range yields the same rows (exactly-once on restart)
        return iter(
            self._step_range(int(start["version"]), int(end["version"]))
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

    def simpleStreamReader(self, schema):
        return SnapshotStreamReader(self.options)


def register(spark) -> None:
    """``spark.dataSource.register`` wrapper (idempotent)."""
    spark.dataSource.register(SnapshotDataSource)
