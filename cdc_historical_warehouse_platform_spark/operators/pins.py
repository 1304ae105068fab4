"""Storage policy for shared-subtree ``localCheckpoint`` pins.

The engine pins a derived frame (``localCheckpoint``) wherever several
consumers would otherwise re-run an expensive subtree (guide §2.4/§5).
Two size classes with different storage economics:

- **Batch / dimension / candidate-sized pins** (CDC batches, drop
  sets, candidate pairs, aggregated catalogs): small at any corpus
  scale. They keep Spark's default level (``MEMORY_AND_DISK``) — the
  deserialized blocks are hot-path cheap and bounded.

- **Corpus-sized pins** (per-doc shingle sets, token/bigram
  histograms, the TF table): O(corpus) rows. They are worth pinning —
  each replaces at least one full corpus re-scan plus the regex-heavy
  normalize/tokenize — but at 100 TB their blocks compete with
  execution memory for the whole consumer job (guide §5's spill
  warning). These route through :func:`pin_corpus_sized`, which makes
  the storage level an explicit, cluster-settable decision:
  ``SPARK_GRAFT_CORPUS_PIN_STORAGE=DISK_ONLY`` stores the pin
  serialized on executor disk — one sequential write + read instead
  of memory pressure against the shuffle/aggregation that consumes it.
  The local default stays Spark's default (unset ⇒ ``MEMORY_AND_DISK``)
  so bench numbers remain comparable; on a page-cache-backed sandbox
  the two are near-identical and the knob is about cluster memory
  budgeting, not local speed.

Fault story (both classes): ``localCheckpoint`` truncates lineage to
executor-local blocks. On executor loss the pinned partitions are
UNRECOVERABLE and the consuming job fails — acceptable here because
every pin in this engine is scoped to a single query invocation (the
caller's retry recomputes the whole query from its parquet inputs);
nothing durable is ever kept only in a pin — all cross-job state
(dedup indexes, dim stores, corpus shards) is written as real parquet
under a commit marker. A deployment that wants within-job recovery
instead sets a reliable ``spark.sparkContext.setCheckpointDir`` and
swaps ``localCheckpoint`` for ``checkpoint`` at the call sites — a
deliberate trade of an HDFS round-trip per pin for executor-loss
tolerance; the engine defaults to the cheap local form (guide §5:
"``localCheckpoint()`` is a cheaper way to cut lineage when fault
tolerance of that intermediate is not critical").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["corpus_pin_storage_level", "pin_corpus_sized"]


def corpus_pin_storage_level():
    """The StorageLevel for corpus-sized pins, or None for Spark's
    default. Parsed once per call from ``SPARK_GRAFT_CORPUS_PIN_STORAGE``
    (a ``pyspark.StorageLevel`` attribute name, e.g. ``DISK_ONLY``,
    ``MEMORY_AND_DISK_SER`` — unknown names raise loudly rather than
    silently falling back)."""
    name = os.environ.get("SPARK_GRAFT_CORPUS_PIN_STORAGE")
    if not name:
        return None
    from pyspark.storagelevel import StorageLevel

    try:
        return getattr(StorageLevel, name)
    except AttributeError:
        raise ValueError(
            f"SPARK_GRAFT_CORPUS_PIN_STORAGE={name!r} is not a "
            "pyspark.StorageLevel attribute (try DISK_ONLY, "
            "MEMORY_AND_DISK_SER, MEMORY_AND_DISK)"
        ) from None


def pin_corpus_sized(df: DataFrame, eager: bool = False) -> DataFrame:
    """``localCheckpoint`` a corpus-sized derived frame under the
    explicit storage policy above. Lazy by default (materializes
    inside the consumer's own job)."""
    return df.localCheckpoint(eager=eager, storageLevel=corpus_pin_storage_level())
