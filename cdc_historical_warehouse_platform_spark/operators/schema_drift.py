"""Schema-drift alignment — tolerate upstream column evolution.

The reference pins both ends of its pipeline with DDL
(init-scripts/01-init-orders-table.sql; scd2_loader.py:102-155) and
simply breaks if the operational schema moves. A production CDC feed
drifts: upstream adds a column, drops one, or widens a type, and the
warehouse contract must keep loading while REPORTING what changed —
silent tolerance (what a permissive reader does) hides exactly the
events an operator needs to see.

:func:`align_to_schema` reconciles an incoming batch against the
contract schema and returns ``(aligned_df, report)``:

- **missing** contract columns → typed NULL columns (the contract
  never shrinks because a producer restarted on an older version);
- **extra** columns → dropped from the aligned output but listed in
  the report (the signal to evolve the contract deliberately);
- **widened** types (safe, lossless order: byte<short<int<long,
  float<double, decimal precision/scale growth, date→timestamp) →
  cast silently and reported;
- **narrowed** / incompatible types → :class:`SchemaDriftError` by
  default; with ``allow_narrowing=True`` they are ``try_cast`` so an
  unrepresentable value lands NULL instead of failing the job under
  ANSI, and the column is reported.

Everything is column-level metadata work — the aligned plan is a
single Project over the input, no extra pass, no Python in the row
path.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["SchemaDriftError", "align_to_schema"]


class SchemaDriftError(ValueError):
    """Incompatible drift (lossy narrowing) under the strict policy."""


_INTEGRAL_RANK = {
    T.ByteType: 0,
    T.ShortType: 1,
    T.IntegerType: 2,
    T.LongType: 3,
}


def _is_safe_widening(src: T.DataType, dst: T.DataType) -> bool:
    """Lossless implicit cast src → dst."""
    if src == dst:
        return True
    s, d = type(src), type(dst)
    if s in _INTEGRAL_RANK and d in _INTEGRAL_RANK:
        return _INTEGRAL_RANK[s] < _INTEGRAL_RANK[d]
    if s is T.FloatType and d is T.DoubleType:
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        # both integer digits and scale must not shrink
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    if s in _INTEGRAL_RANK and isinstance(dst, T.DecimalType):
        digits = {0: 3, 1: 5, 2: 10, 3: 19}[_INTEGRAL_RANK[s]]
        return dst.precision - dst.scale >= digits
    if s is T.DateType and d is T.TimestampType:
        return True
    return False


def align_to_schema(
    df: DataFrame,
    target: T.StructType,
    allow_narrowing: bool = False,
) -> tuple[DataFrame, dict]:
    """Project ``df`` onto ``target``, reconciling drift; see module
    docstring for the policy. Column matching is case-sensitive (the
    engine's schemas are DDL-first, schemas.py)."""
    src_types = {f.name: f.dataType for f in df.schema.fields}
    report: dict[str, list] = {
        "missing": [],
        "extra": sorted(set(src_types) - {f.name for f in target.fields}),
        "widened": [],
        "narrowed": [],
    }
    cols = []
    for f in target.fields:
        if f.name not in src_types:
            report["missing"].append(f.name)
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = src_types[f.name]
        if src == f.dataType:
            cols.append(F.col(f.name))
        elif _is_safe_widening(src, f.dataType):
            report["widened"].append(
                (f.name, src.simpleString(), f.dataType.simpleString())
            )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            if not allow_narrowing:
                raise SchemaDriftError(
                    f"column {f.name!r}: {src.simpleString()} -> "
                    f"{f.dataType.simpleString()} is lossy; pass "
                    "allow_narrowing=True to try_cast (unrepresentable "
                    "values become NULL) or evolve the contract schema"
                )
            report["narrowed"].append(
                (f.name, src.simpleString(), f.dataType.simpleString())
            )
            cols.append(
                F.col(f.name).try_cast(f.dataType.simpleString()).alias(f.name)
            )
    try:
        aligned = df.select(*cols)
    except AnalysisException as e:  # not castable even with try_cast
        raise SchemaDriftError(
            "incompatible drift: a column cannot be cast to its contract "
            f"type even with try_cast — evolve the contract schema ({e})"
        ) from e
    return aligned, report
