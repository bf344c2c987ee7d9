"""Spark DataSource over the minilake commit log — the table format
(`sources/minilake.py`) surfaced as a first-class `format("minilake")`
for both batch and Structured Streaming.

- **Batch** (`spark.read.format("minilake").load(path)`): reads the
  CURRENT snapshot; one live data file → one `InputPartition`, so the
  scan parallelizes across files and a task touches exactly one
  immutable parquet file.
- **Streaming** (`spark.readStream.format("minilake").load(path)`):
  the commit log IS the offset log — `{"version": v}` marks the last
  consumed commit, each micro-batch is the rows ADDED by the append
  commits in `(start, end]` (read incrementally from only those files,
  never the table), and `readBetweenOffsets` replays any committed
  range byte-identically after a restart.  Exactly-once end to end:
  the sink sees each commit's rows once because versions are claimed
  atomically at write time.  An overwrite/compact commit inside the
  range fails the batch loudly (incremental consumers must re-sync
  from a snapshot — the same signal `minilake.read_changes` gives).

The readers run in Python workers and parse parquet with pyarrow;
rows are emitted as tuples in schema field order.  This is the slow
general path by design — the fast path for bulk snapshot reads stays
`minilake.read_snapshot` (JVM parquet scans); the DataSource exists
for the STREAMING contract, where the per-trigger delta is small.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from . import minilake

FORMAT_NAME = "minilake"


def _cdf_option(options: dict) -> bool:
    """The readChangeFeed option (Spark hands DataSource options with
    case-insensitive keys; accept both spellings)."""
    v = options.get("readchangefeed", options.get("readChangeFeed", "false"))
    return str(v).lower() == "true"


def _latest_schema(path: str) -> StructType:
    vs = minilake.versions(path)
    if not vs:
        raise ValueError(f"no minilake log under {path}")
    from .deltastream import _strip_field_metadata

    # field metadata (e.g. a generation expression stamped by the
    # writer) must not reach the stream's declared schema: Spark's
    # streaming scan compares the prefetched Arrow batches' schema
    # metadata-inclusively (see deltastream._strip_field_metadata)
    return _strip_field_metadata(
        StructType.fromJson(
            json.loads(minilake._read_commit(path, vs[-1])["schema"])
        )
    )


def _file_rows(
    path: str,
    data_file: str,
    field_names: list[str],
    dv_names: tuple[str, ...] = (),
) -> list[tuple]:
    """All VISIBLE rows of one immutable data file as schema-ordered
    tuples — row positions listed for this file in `dv_names` deletion
    vectors are skipped (the Python-side twin of the JVM scan's
    broadcast anti-join)."""
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(minilake._data_dir(path), data_file))
    hidden: set[int] = set()
    for n in dv_names:
        dv = pq.read_table(
            os.path.join(minilake._dv_dir(path), n),
            columns=["file", "row_index"],
        )
        files = dv.column("file").to_pylist()
        ris = dv.column("row_index").to_pylist()
        hidden.update(ri for f, ri in zip(files, ris) if f == data_file)
    cols = {name: table.column(name).to_pylist() for name in table.column_names}
    n = table.num_rows
    return [
        tuple(cols[name][i] if name in cols else None for name in field_names)
        for i in range(n)
        if i not in hidden
    ]


@dataclass
class _LakePartition(InputPartition):
    data_file: str
    dv_names: tuple[str, ...] = ()


class MinilakeReader(DataSourceReader):
    """Batch: the current snapshot, one task per live file (each task
    carries its file's deletion-vector names)."""

    def __init__(self, options: dict, schema: StructType):
        path = options.get("path")
        if not path:
            raise ValueError("minilake requires a path")
        self.path = path
        self.field_names = [f.name for f in schema.fields]

    def partitions(self) -> list[_LakePartition]:
        state = minilake._fold_state(self.path)
        return [
            _LakePartition(f, tuple(state["dvs"].get(f, [])))
            for f in sorted(state["live"])
        ]

    def read(self, partition: _LakePartition) -> Iterator[tuple]:
        yield from _file_rows(
            self.path,
            partition.data_file,
            self.field_names,
            partition.dv_names,
        )


def _dv_positions(path: str, dv_names, data_file: str) -> set[int]:
    """Row indices of `data_file` listed in the given DV sidecars."""
    import pyarrow.parquet as pq

    hidden: set[int] = set()
    for n in sorted(set(dv_names)):
        dv = pq.read_table(
            os.path.join(minilake._dv_dir(path), n),
            columns=["file", "row_index"],
        )
        files = dv.column("file").to_pylist()
        ris = dv.column("row_index").to_pylist()
        hidden.update(ri for f, ri in zip(files, ris) if f == data_file)
    return hidden


def _file_rows_at(
    path: str, data_file: str, field_names: list[str], keep: set[int]
) -> list[tuple]:
    """Rows of one data file AT the given positions only."""
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(minilake._data_dir(path), data_file))
    cols = {name: table.column(name).to_pylist() for name in table.column_names}
    return [
        tuple(cols[name][i] if name in cols else None for name in field_names)
        for i in range(table.num_rows)
        if i in keep
    ]


class MinilakeStreamReader(SimpleDataSourceStreamReader):
    """The commit log as the streaming offset log (see module doc).

    With `option("readChangeFeed", "true")` the stream is the CHANGE
    FEED instead of the plain row feed (Delta's CDF streaming
    counterpart): each micro-batch carries `_change_type`
    ('insert' | 'delete') and `_commit_version` columns — appends emit
    inserts, DV deletes emit exactly their newly-hidden positions,
    predicate deletes emit the removed files' visible matching rows,
    and compact/optimize emit nothing.  Overwrite/restore/merge still
    end the stream loudly (a streaming consumer across a full rewrite
    must re-sync — same rule as the batch feed's merge case)."""

    def __init__(self, options: dict, schema: StructType):
        path = options.get("path")
        if not path:
            raise ValueError("minilake requires a path")
        self.path = path
        self.cdf = _cdf_option(options)
        base = [f.name for f in schema.fields]
        if self.cdf:
            base = [n for n in base if n not in ("_change_type", "_commit_version")]
        self.field_names = base

    def initialOffset(self) -> dict:
        # start BEFORE the first commit: the first micro-batch carries
        # the full committed history, after which batches are deltas
        return {"version": -1}

    def _change_rows(self, start_v: int, end_v: int) -> list[tuple]:
        """CDF rows for the commits in (start_v, end_v] — the Python
        row-level twin of `minilake.read_changes(change_feed=True)`
        for the stream's small per-trigger deltas."""
        rows: list[tuple] = []
        for v in minilake.versions(self.path):
            if not start_v < v <= end_v:
                continue
            c = minilake._read_commit(self.path, v)
            mode = c["mode"]
            if mode in ("compact", "optimize"):
                continue
            if mode == "append":
                for f in c["add"]:
                    for r in _file_rows(self.path, f, self.field_names):
                        rows.append(r + ("insert", v))
            elif mode == "delete" and c.get("dv"):
                names = {n for ns in c["dv"].values() for n in ns}
                for f in sorted(c["dv"]):
                    keep = _dv_positions(self.path, names, f)
                    if keep:
                        for r in _file_rows_at(
                            self.path, f, self.field_names, keep
                        ):
                            rows.append(r + ("delete", v))
            elif mode == "delete" and c.get("predicate"):
                pred = c["predicate"]
                col_i = self.field_names.index(pred["col"])
                prior_dvs = minilake._fold_state(self.path, as_of=v - 1)["dvs"]
                for f in sorted(c["remove"]):
                    # visible rows only: prior DVs already emitted their
                    # positions as deletes when they were committed
                    visible = _file_rows(
                        self.path,
                        f,
                        self.field_names,
                        tuple(prior_dvs.get(f, [])),
                    )
                    for r in visible:
                        val = r[col_i]
                        if val is not None and pred["lo"] <= val <= pred["hi"]:
                            rows.append(r + ("delete", v))
            else:
                raise ValueError(
                    f"minilake change-feed stream hit a {mode!r} commit at "
                    f"version {v} — re-sync from a fresh snapshot"
                )
        return rows

    def _added_files(self, start_v: int, end_v: int) -> list[str]:
        files: list[str] = []
        for v in minilake.versions(self.path):
            if start_v < v <= end_v:
                c = minilake._read_commit(self.path, v)
                if c["mode"] in ("compact", "optimize"):
                    # pure rewrite: every row was already delivered by
                    # the append commit that introduced it — routine
                    # maintenance must not break a running stream
                    continue
                if c["mode"] != "append":
                    raise ValueError(
                        f"minilake stream hit a {c['mode']!r} commit at "
                        f"version {v} — incremental consumption only spans "
                        "appends; restart the stream from a fresh snapshot"
                    )
                files.extend(c["add"])
        return files

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        vs = minilake.versions(self.path)
        end_v = vs[-1] if vs else start["version"]
        if self.cdf:
            rows = self._change_rows(start["version"], end_v)
        else:
            rows = [
                r
                for f in self._added_files(start["version"], end_v)
                for r in _file_rows(self.path, f, self.field_names)
            ]
        # materialized list, not a generator: the engine's prefetch
        # cache copies the returned iterator for replay
        return iter(rows), {"version": end_v}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        if self.cdf:
            return iter(self._change_rows(start["version"], end["version"]))
        return iter(
            [
                r
                for f in self._added_files(start["version"], end["version"])
                for r in _file_rows(self.path, f, self.field_names)
            ]
        )


@dataclass
class _LakeWriteMessage(WriterCommitMessage):
    file_name: str | None
    n_rows: int


class MinilakeWriter(DataSourceWriter):
    """Batch write path (`df.write.format("minilake").save(path)`):
    the Python DataSource two-phase commit mapped onto the commit log.

    - `write` (executors): each task lands its rows as ONE immutable
      uuid-named parquet file under data/ — invisible until committed —
      and reports the name.  A retried/speculative task lands a second
      file, but only the message Spark keeps is committed; losers stay
      unreferenced and are reclaimed by `vacuum` (the same crashed-
      writer story as the native API).
    - `commit` (driver): ONE log commit claiming all reported files —
      append enforces the table's schema contract; overwrite re-derives
      its remove list at claim time like `minilake.commit_overwrite`.
    - `abort`: unlinks every landed file.

    Rows cross the Python boundary tuple-at-a-time, so this is the
    general/slow path by design — bulk writes stay on the JVM via
    `minilake.commit_append`.  The format exists so the table is
    READ/WRITE complete as a `format("minilake")` citizen."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("minilake requires a path")
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        if minilake.partition_spec(path):
            # partitioned landing needs the JVM writer's partitionBy
            # split; the tuple-at-a-time Python write path would commit
            # files without partition tuples, silently disabling the
            # partition-pruning tier — refuse instead
            raise ValueError(
                "format('minilake') cannot write to a PARTITIONED table; "
                "use the native API (minilake.commit_append/"
                "commit_overwrite) which lands partition tuples"
            )
        if not overwrite:
            minilake._check_schema_struct(schema, path, allow_evolution=False)

    def write(self, rows) -> _LakeWriteMessage:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        tuples = [tuple(r) for r in rows]
        if not tuples:
            return _LakeWriteMessage(file_name=None, n_rows=0)
        arrow_schema = to_arrow_schema(self.schema)
        cols = list(zip(*tuples))
        table = pa.Table.from_arrays(
            [
                pa.array(col, type=arrow_schema.field(i).type)
                for i, col in enumerate(cols)
            ],
            schema=arrow_schema,
        )
        ddir = minilake._data_dir(self.path)
        os.makedirs(ddir, exist_ok=True)
        name = f"{_uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(ddir, name))
        return _LakeWriteMessage(file_name=name, n_rows=len(tuples))

    def commit(self, messages) -> None:
        files = sorted(m.file_name for m in messages if m and m.file_name)
        if self.overwrite:
            minilake._claim_version(
                self.path,
                {
                    "mode": "overwrite",
                    "add": files,
                    "remove": sorted(minilake._live_files(self.path)),
                    "schema": self.schema.json(),
                },
                refresh=lambda c: c.__setitem__(
                    "remove", sorted(minilake._live_files(self.path))
                ),
            )
        else:
            minilake._claim_version(
                self.path,
                {
                    "mode": "append",
                    "add": files,
                    "remove": [],
                    "schema": self.schema.json(),
                },
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.file_name:
                full = os.path.join(minilake._data_dir(self.path), m.file_name)
                if os.path.exists(full):
                    os.unlink(full)


class MinilakeStreamWriter(DataSourceStreamWriter):
    """Streaming sink (`df.writeStream.format("minilake")`): the
    engine's at-least-once micro-batch replay becomes exactly-once by
    keying each log commit with its batch id — the identical
    `txnAppId`/`txnVersion` contract `minilake.commit_stream_batch`
    implements for foreachBatch, now as a native sink.  A replayed
    batch (restart from checkpoint, speculative re-commit) finds its
    id already in the log and commits NOTHING; its landed files stay
    unreferenced for vacuum.  Tasks land immutable uuid parquet files
    exactly like the batch writer; `commit` claims one version per
    micro-batch."""

    def __init__(self, options: dict, schema: StructType):
        path = options.get("path")
        if not path:
            raise ValueError("minilake requires a path")
        self.path = path
        self.schema = schema
        if minilake.partition_spec(path):
            raise ValueError(
                "format('minilake') streaming sink cannot write to a "
                "PARTITIONED table; use minilake.lake_stream_sink "
                "(foreachBatch over the native API)"
            )
        # same write-time schema contract as the batch append path: a
        # stream must never silently commit a divergent schema
        minilake._check_schema_struct(schema, path, allow_evolution=False)

    # task-side: identical landing protocol to the batch writer
    write = MinilakeWriter.write

    def commit(self, messages, batchId: int) -> None:
        files = sorted(m.file_name for m in messages if m and m.file_name)
        if batchId in minilake.committed_stream_batches(self.path):
            # replay of a committed batch: exactly-once no-op; the
            # just-landed duplicates stay unreferenced (vacuum fodder)
            for f in files:
                full = os.path.join(minilake._data_dir(self.path), f)
                if os.path.exists(full):
                    os.unlink(full)
            return
        minilake._claim_version(
            self.path,
            {
                "mode": "append",
                "add": files,
                "remove": [],
                "schema": self.schema.json(),
                "stream_batch_id": int(batchId),
            },
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.file_name:
                full = os.path.join(minilake._data_dir(self.path), m.file_name)
                if os.path.exists(full):
                    os.unlink(full)


class MinilakeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        from pyspark.sql.types import LongType, StringType

        schema = _latest_schema(self.options["path"])
        if _cdf_option(self.options):
            schema = schema.add("_change_type", StringType()).add(
                "_commit_version", LongType()
            )
        return schema

    def reader(self, schema: StructType) -> MinilakeReader:
        return MinilakeReader(self.options, schema)

    def simpleStreamReader(self, schema: StructType) -> MinilakeStreamReader:
        return MinilakeStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> MinilakeWriter:
        return MinilakeWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> MinilakeStreamWriter:
        return MinilakeStreamWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(MinilakeDataSource)
