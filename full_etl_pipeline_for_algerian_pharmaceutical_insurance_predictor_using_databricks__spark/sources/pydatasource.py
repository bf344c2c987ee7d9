"""Custom Python DataSource for the letter-keyed medication feed —
operator S1/S2 re-expressed on Spark 4's DataSource API
(`pyspark.sql.datasource`), the modern extension point for formats
Spark doesn't ship.

Where `json_ingest.read_letter_keyed_json` flattens the landed document
with a logical-plan transform (stack→explode), this source moves the
parse itself off the driver and into partitioned tasks:

- **Batch** (`format("letterjson").load(path)`): a landing DIRECTORY
  maps one file → one `InputPartition` (the true scale path — the
  upstream publishes per-letter documents, and 26 tasks parse 26 files
  independently); a single landed FILE maps one letter key → one
  partition (each task parses only its letter's array).  Partition
  listing reads ONLY the JSON's top-level keys / the directory listing
  — never the record payload — so the driver stays O(#partitions).
- **Streaming** (`readStream.format("letterjson")`): a
  `SimpleDataSourceStreamReader` replays the landing directory in
  filename order with a monotone `{"count": n}` offset — new files
  become the next micro-batch, `readBetweenOffsets` makes recovery
  replay exact, and `commit` is a no-op (the landing zone is the
  write-ahead log).  This is the continuous-ingest shape of ING:15-27
  with exactly-once offsets instead of a driver loop.

The emitted rows follow `schemas.RAW_MEDICATION` exactly, so everything
downstream (clean → dashboard → ML) is source-agnostic.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ..schemas import RAW_MEDICATION

FORMAT_NAME = "letterjson"


def _record_tuple(letter: str, med: dict) -> tuple:
    """One RAW_MEDICATION-shaped tuple from a raw feed dict (missing
    keys → NULL, matching spark.read.json's permissive behavior)."""
    lab = med.get("lab") or {}
    cls = med.get("class") or {}
    return (
        med.get("name"),
        (lab.get("name"), lab.get("address"), lab.get("tel"), lab.get("web")),
        (cls.get("therapeutic"), cls.get("pharmacological")),
        med.get("form"),
        med.get("generic"),
        med.get("reference_rate"),
        med.get("refundable"),
        letter,
    )


def _read_landed_file(path: str, letters: list[str] | None = None) -> Iterator[tuple]:
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    for letter in sorted(doc) if letters is None else letters:
        for med in doc.get(letter, []):
            yield _record_tuple(letter, med)


class _LetterPartition(InputPartition):
    def __init__(self, path: str, letter: str | None):
        self.path = path
        self.letter = letter


class LetterJsonReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("letterjson requires a path")
        self.path = path

    def partitions(self) -> list[_LetterPartition]:
        if os.path.isdir(self.path):
            # directory landing: one file per partition (per-letter
            # documents at the real feed; any file count works)
            return [
                _LetterPartition(os.path.join(self.path, f), None)
                for f in sorted(os.listdir(self.path))
                if f.endswith(".json")
            ]
        # single document: one top-level letter key per partition —
        # json.load here is the partition LISTING (top-level keys), and
        # runs once on the driver; the per-letter payload parse happens
        # in the tasks
        with open(self.path, encoding="utf-8") as f:
            letters = sorted(json.load(f))
        return [_LetterPartition(self.path, letter) for letter in letters]

    def read(self, partition: _LetterPartition) -> Iterator[tuple]:
        letters = None if partition.letter is None else [partition.letter]
        yield from _read_landed_file(partition.path, letters)


class LetterJsonStreamReader(SimpleDataSourceStreamReader):
    """Landing-directory replay: offset = how many (sorted) files have
    been consumed.  Filename order is the arrival contract (the landing
    writer names files monotonically), so offsets are stable across
    restarts and `readBetweenOffsets` replays are byte-identical."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("letterjson requires a path")
        self.path = path

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"count": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = self._files()
        new = files[start["count"]:]
        # materialized list, not a generator: the engine's prefetch
        # cache copies the returned iterator for replay, and a
        # generator is neither copyable nor picklable
        rows = [r for path in new for r in _read_landed_file(path)]
        return iter(rows), {"count": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = self._files()[start["count"]:end["count"]]
        return iter([r for path in files for r in _read_landed_file(path)])


@dataclass
class _LetterWriteMessage(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class LetterJsonWriter(DataSourceWriter):
    """Write side of the format — the two-phase commit shape every
    distributed writer needs: each task lands its rows as an INVISIBLE
    `*.json.tmp` letter-keyed document (a suffix the reader's
    `*.json` filters never match) and reports it in its commit
    message; only the driver's `commit` renames them into visible
    `part-*.json` files (after clearing old parts under overwrite), and
    `abort` deletes the temps — a failed/speculative task can never
    leave a half-written visible file.  One file per task: repartition
    by `first_letter` upstream to get the canonical one-document-per-
    letter layout; the reader accepts any file granularity either way."""

    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("letterjson requires a path")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> _LetterWriteMessage:
        import uuid

        doc: dict[str, list] = {}
        n = 0
        for row in iterator:
            lab = row["lab"]
            cls = row["class"]
            doc.setdefault(row["first_letter"], []).append(
                {
                    "name": row["name"],
                    "lab": {
                        "name": lab["name"] if lab else None,
                        "address": lab["address"] if lab else None,
                        "tel": lab["tel"] if lab else None,
                        "web": lab["web"] if lab else None,
                    },
                    "class": {
                        "therapeutic": cls["therapeutic"] if cls else None,
                        "pharmacological": cls["pharmacological"] if cls else None,
                    },
                    "form": row["form"],
                    "generic": row["generic"],
                    "reference_rate": row["reference_rate"],
                    "refundable": row["refundable"],
                }
            )
            n += 1
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(doc, f, sort_keys=True)
        return _LetterWriteMessage(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") and f.endswith(".json"):
                    os.remove(os.path.join(self.path, f))
        # Append mode must not reuse part numbers from a prior commit —
        # os.rename would silently clobber committed files.  Start the
        # index past the highest existing part-*.json.
        base = 0
        for f in os.listdir(self.path):
            if f.startswith("part-") and f.endswith(".json"):
                try:
                    base = max(base, int(f[5:10]) + 1)
                except ValueError:
                    pass
        i = base
        for m in messages:
            if m.n_rows == 0:
                os.remove(m.tmp_path)
                continue
            os.rename(m.tmp_path, os.path.join(self.path, f"part-{i:05d}.json"))
            i += 1

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class LetterJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return RAW_MEDICATION

    def reader(self, schema: StructType) -> LetterJsonReader:
        return LetterJsonReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> LetterJsonWriter:
        return LetterJsonWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> LetterJsonStreamReader:
        return LetterJsonStreamReader(self.options)


def register(spark) -> None:
    """Idempotent format registration: after this,
    `spark.read.format("letterjson")` / `readStream.format(...)` work
    session-wide."""
    spark.dataSource.register(LetterJsonDataSource)
