"""Custom Python DataSource for the reference change-batch format.

Spark 4's Python DataSource API (pyspark.sql.datasource) lets the
engine's wire format plug into the ordinary reader surface:

    spark.dataSource.register(CDCBatchDataSource)
    df = spark.read.format("cdc_batches").load(cdc_dir)
    stream = spark.readStream.format("cdc_batches").load(cdc_dir)

One InputPartition PER BATCH (envelope file or jsonl directory), so a
directory of thousands of batches reads with full task parallelism and
each task touches exactly one batch — the same unit the loader's
ledger tracks. Rows carry the full CHANGE_SCHEMA plus ``batch_file``
for lineage (which batch produced each row — the per-file provenance
the JVM readers expose via input_file_name).

Positioning: this is the INTEROP seam — ad-hoc SQL over a CDC
directory, third-party tools, notebooks. The pipeline hot path stays
on sources/change_batches.py (JVM JSON reader, explicit schema,
FAILFAST): a Python-side parse is a row-at-a-time path by nature and
is priced accordingly. Parity between the two readers is pinned by
tests/test_cdc_datasource.py.
"""

from __future__ import annotations

import datetime as _dt
import json
from decimal import Decimal
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    DataSourceWriter,
    WriterCommitMessage,
)

from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA

__all__ = ["CDCBatchDataSource"]

# batch names are timestamp-ordered by construction (batch_name uses
# strftime + a uniquifier), so "every batch with name > last" is a
# complete, replayable offset — the property the streaming reader
# leans on. An empty-string offset precedes every real name.

_TS_FIELDS = {
    f.name for f in CHANGE_SCHEMA.fields if f.dataType.typeName() == "timestamp"
}
_DEC_FIELDS = {
    f.name for f in CHANGE_SCHEMA.fields if f.dataType.typeName() == "decimal"
}
_INT_FIELDS = {
    f.name
    for f in CHANGE_SCHEMA.fields
    if f.dataType.typeName() in ("integer", "long")
}
_FIELD_ORDER = [f.name for f in CHANGE_SCHEMA.fields]


def _coerce(name: str, value):
    """Wire value → CHANGE_SCHEMA type, mirroring cast_json_changes:
    timestamps/decimals arrive stringified (the writer's default=str
    discipline), numerics arrive native; unparseable values become
    NULL exactly like a Spark cast."""
    if value is None:
        return None
    try:
        if name in _TS_FIELDS:
            return _dt.datetime.fromisoformat(str(value))
        if name in _DEC_FIELDS:
            return Decimal(str(value))
        if name in _INT_FIELDS:
            return int(value)
        return str(value)
    except (ValueError, ArithmeticError):
        return None


class _BatchPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _CDCBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_batches requires a path: .load(cdc_dir)")

    def partitions(self):
        from cdc_historical_warehouse_platform_spark.sources.change_batches import discover_batches

        root = Path(self.path)
        batches = (
            discover_batches(root) if root.is_dir() and not root.name.startswith("changes_") else [root]
        )
        return [_BatchPartition(str(p)) for p in batches]

    def read(self, partition):
        yield from _parse_batch(Path(partition.path))


def _parse_batch(p: Path):
    """Yield CHANGE_SCHEMA+batch_file tuples from one batch (either
    wire format) — shared by the batch partitions and the stream."""
    if p.is_dir():
        records = (
            json.loads(line)
            for part in sorted(p.glob("part-*"))
            for line in part.read_text().splitlines()
            if line.strip()
        )
    else:
        records = json.loads(p.read_text()).get("changes", [])
    name = p.name
    for rec in records:
        yield tuple(_coerce(f, rec.get(f)) for f in _FIELD_ORDER) + (name,)


class _CDCBatchStreamReader(SimpleDataSourceStreamReader):
    """Tail a CDC directory as a stream: each micro-batch is "every
    batch file whose (timestamp-ordered) name sorts after the last
    committed one". Offsets are just that name, so replay between two
    committed offsets re-reads exactly the same files — the
    exactly-once contract Structured Streaming requires of a source.
    Notably this STREAMS THE ENVELOPE FORMAT, which the JVM file
    source cannot (it has no per-file envelope parse)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_batches requires a path: .load(cdc_dir)")

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _between(self, start: str, end: str | None):
        from cdc_historical_warehouse_platform_spark.sources.change_batches import discover_batches

        for b in discover_batches(Path(self.path)):
            if b.name > start and (end is None or b.name <= end):
                yield b

    def read(self, start: dict):
        batches = list(self._between(start["last"], None))
        if not batches:
            return iter(()), start
        end = {"last": max(b.name for b in batches)}
        # LIST iterator, not a generator: the runner's prefetch cache
        # copy.copy()s the returned iterator (generators raise) —
        # micro-batches are batch-file-sized, so materializing is the
        # contract's own cost model
        rows = [row for b in batches for row in _parse_batch(b)]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                row
                for b in self._between(start["last"], end["last"])
                for row in _parse_batch(b)
            ]
        )


class CDCBatchDataSource(DataSource):
    """``spark.read.format("cdc_batches").load(dir_or_batch)``."""

    @classmethod
    def name(cls) -> str:
        return "cdc_batches"

    def schema(self):
        # StructType.add MUTATES in place — never call it on the shared
        # contract schema (it would grow a batch_file field per call,
        # session-wide); build a fresh copy instead
        from pyspark.sql import types as T

        return T.StructType(
            list(CHANGE_SCHEMA.fields) + [T.StructField("batch_file", T.StringType())]
        )

    def reader(self, schema):
        return _CDCBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _CDCBatchStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "cdc_batches is append-only (a CDC directory is a log); "
                "use mode('append')"
            )
        return _CDCBatchWriter(self.options)


class _PartMessage(WriterCommitMessage):
    def __init__(self, filename: str, n: int):
        self.filename = filename
        self.n = n


class _CDCBatchWriter(DataSourceWriter):
    """``df.write.format("cdc_batches").mode("append").save(dir)`` —
    emits one jsonl batch (the distributed wire format) under the same
    atomic contract as write_change_batch: every task writes its part
    file into a hidden ``.{name}.tmp`` directory, and commit() writes
    the batch metadata then renames ONCE — a concurrent loader globbing
    ``changes_*`` can never observe a half-written batch. abort()
    removes the temp dir, leaving no trace.

    ``extracted_at`` (ISO string option) is REQUIRED: the batch name is
    derived from it on the driver, so a task retry lands in the same
    temp dir instead of forking a second batch. Part files are
    uuid-named (concurrent speculative attempts of one partition never
    clash on a file), and commit() keeps ONLY the files named in the
    WriterCommitMessages — a failed or losing attempt's partial part
    file is pruned before the rename, so retries can never leak
    duplicate or truncated rows into the committed batch.
    """

    def __init__(self, options):
        from cdc_historical_warehouse_platform_spark.sources.change_batches import batch_name

        self.path = options.get("path")
        ts = options.get("extracted_at")
        if not self.path or not ts:
            raise ValueError(
                "cdc_batches write requires .save(dir) and "
                ".option('extracted_at', '<iso timestamp>')"
            )
        self.extracted_at = ts
        self.name = batch_name(_dt.datetime.fromisoformat(ts))
        self.tmp = str(Path(self.path) / f".{self.name}.tmp")

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.tmp, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.json"
        n = 0
        with open(Path(self.tmp) / fname, "w") as f:
            for row in iterator:
                rec = {}
                for k, v in row.asDict().items():
                    if isinstance(v, _dt.datetime):
                        rec[k] = v.isoformat(sep="T")
                    elif isinstance(v, Decimal):
                        rec[k] = str(v)
                    else:
                        rec[k] = v
                f.write(json.dumps(rec) + "\n")
                n += 1
        return _PartMessage(fname, n)

    def commit(self, messages):
        # exactly the winning attempts' files survive: Spark hands one
        # commit message per SUCCEEDED task; anything else in the temp
        # dir is a failed/speculative attempt's leftover
        keep = {m.filename for m in messages}
        for p in Path(self.tmp).glob("part-*.json"):
            if p.name not in keep:
                p.unlink()
        total = sum(m.n for m in messages)
        meta = {
            "extracted_at": self.extracted_at,
            "change_count": total,
            "watermark": None,
        }
        (Path(self.tmp) / "_batch_metadata.json").write_text(json.dumps(meta))
        Path(self.tmp).rename(Path(self.path) / self.name)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.tmp, ignore_errors=True)
