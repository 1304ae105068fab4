"""Pipeline state: watermark file, processed-batch ledger, batch ids.

Mirrors the reference's state files (FIXTURES.md §1.6):
- ``.watermark`` — single ISO timestamp (log_extractor.py:81-106);
- ``.processed_files`` — append-only ``filename|batch_id`` lines
  (scd2_loader.py:165-187).

In streaming deployments the Structured Streaming checkpoint subsumes
both (ST1/ST4); these file twins keep batch runs reproducible and make
the idempotency contract testable without a streaming context.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Watermark", "ProcessedLedger", "generate_batch_id"]


class Watermark:
    """High-watermark state (ST1). Default first-run value: now − 5 min
    (log_extractor.py:94-97)."""

    def __init__(self, path: str | Path, lookback: _dt.timedelta = _dt.timedelta(minutes=5)):
        self.path = Path(path)
        self.lookback = lookback

    def get(self, now: _dt.datetime | None = None) -> _dt.datetime:
        try:
            return _dt.datetime.fromisoformat(self.path.read_text().strip())
        except FileNotFoundError:
            now = now or _dt.datetime.utcnow()
            return now - self.lookback

    def set(self, value: _dt.datetime) -> None:
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(value.isoformat())
        tmp.replace(self.path)


class ProcessedLedger:
    """Append-only exactly-once ledger of ``filename|batch_id``."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def entries(self) -> set[tuple[str, str]]:
        try:
            lines = self.path.read_text().splitlines()
        except FileNotFoundError:
            return set()
        out = set()
        for line in lines:
            if "|" in line:
                name, batch_id = line.split("|", 1)
                out.add((name, batch_id))
        return out

    def processed_names(self) -> set[str]:
        return {name for name, _ in self.entries()}

    def is_processed(self, filename: str, batch_id: str) -> bool:
        return (filename, batch_id) in self.entries()

    def mark(self, filename: str, batch_id: str) -> None:
        with self.path.open("a") as f:
            f.write(f"{filename}|{batch_id}\n")


def generate_batch_id(changes: DataFrame, id_col: str = "id") -> str:
    """F7: deterministic content hash — md5 of the JSON of sorted ids
    (scd2_loader.py:184-187). Computed with a distributed agg; only the
    final sorted-id array ever reaches the driver."""
    row = changes.agg(F.sort_array(F.collect_list(id_col)).alias("ids")).collect()[0]
    ids = [int(x) for x in row["ids"]]
    return hashlib.md5(json.dumps(ids).encode()).hexdigest()
