"""Schema evolution for snapshot tables: add/drop columns without rewrites.

A corpus table lives for years; its schema does not. The log gains a
``schema`` action — a full Spark StructType (as type JSON, rebuildable
without a JVM) plus per-column *initial defaults*:

- ``add_column`` appends a schema commit; NO data file is touched.
  Readers fill the new column with its default — but only for files
  written BEFORE the column existed (each live file carries the version
  that added it), so a genuine NULL written afterwards stays NULL.
- ``drop_column`` removes the column from the schema; old files still
  physically carry the bytes (immutable), readers simply never project
  them, and time travel to a pre-drop version restores the column.
- ``conform`` shapes a DataFrame to the table schema before an append:
  missing defaulted columns are filled, extra columns rejected, types
  cast — the write-side contract that keeps a thousand independent
  ingest jobs from drifting the table.

Scale: evolution is one KB-sized log commit regardless of table size;
the read-side default fill is a literal projection (whole-stage
codegen), not a join; files are grouped by "which defaulted columns
predate me", which is at most a handful of groups however many files.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .snapshots import _replay_state, commit, current_version


_ATOMIC = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def _parse_type(dtype) -> T.DataType:
    if isinstance(dtype, T.DataType):
        return dtype
    s = str(dtype).strip().lower()
    if s in _ATOMIC:
        return _ATOMIC[s]
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array<(.+)>", s)
    if m:
        return T.ArrayType(_parse_type(m.group(1)))
    raise ValueError(f"schema: cannot parse type {dtype!r}")


def table_schema(
    table_dir: str, version: int | None = None
) -> tuple[T.StructType | None, dict]:
    """The recorded schema and defaults at a version (None, {} if the
    table predates schema tracking)."""
    st = _replay_state(table_dir, version)
    if not st.schema:
        return None, {}
    struct = T.StructType.fromJson(st.schema["spark"])
    return struct, dict(st.schema.get("defaults", {}))


def _schema_action(struct: T.StructType, defaults: dict) -> dict:
    return {"action": "schema", "spark": struct.jsonValue(), "defaults": defaults}


def set_schema(table_dir: str, struct: T.StructType, message: str = "set schema") -> int:
    """Record the table's schema explicitly (starts schema tracking)."""
    base = current_version(table_dir)
    if base < 0:
        raise ValueError("schema: no table to set a schema on")
    return commit(
        table_dir,
        [_schema_action(struct, {})],
        message=message,
        expected_version=base,
    )


def _current(table_dir: str) -> tuple[T.StructType, dict, int]:
    base = current_version(table_dir)
    struct, defaults = table_schema(table_dir, base)
    if struct is None:
        # infer from the newest live file's footer — one metadata read
        import os

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        st = _replay_state(table_dir, base)
        if not st.live:
            raise ValueError("schema: table has no live files")
        newest = max(st.live.values(), key=lambda a: a.get("_v", -1))
        arrow = pq.ParquetFile(
            os.path.join(table_dir, newest["path"])
        ).schema_arrow
        struct = from_arrow_schema(arrow)
        defaults = {}
    return struct, defaults, base


def add_column(
    table_dir: str,
    name: str,
    dtype,
    default=None,
    message: str | None = None,
) -> int:
    """Add a nullable column. ``default`` (a plain JSON-able literal)
    back-fills rows written before this commit — at read time, from
    metadata alone."""
    struct, defaults, base = _current(table_dir)
    if name in struct.fieldNames():
        raise ValueError(f"schema: column {name!r} already exists")
    t = _parse_type(dtype)
    struct = T.StructType(list(struct.fields) + [T.StructField(name, t, True)])
    if default is not None:
        defaults[name] = {"value": default, "since": base + 1}
    return commit(
        table_dir,
        [_schema_action(struct, defaults)],
        message=message or f"add column {name}",
        expected_version=base,
    )


def drop_column(table_dir: str, name: str, message: str | None = None) -> int:
    """Drop a column logically — no data rewrite, time travel keeps it."""
    struct, defaults, base = _current(table_dir)
    if name not in struct.fieldNames():
        raise ValueError(f"schema: no column {name!r}")
    struct = T.StructType([f for f in struct.fields if f.name != name])
    defaults.pop(name, None)
    return commit(
        table_dir,
        [_schema_action(struct, defaults)],
        message=message or f"drop column {name}",
        expected_version=base,
    )


def default_fills(
    live_action: dict, defaults: dict
) -> frozenset:
    """Which defaulted columns predate this file (need the fill)."""
    v = live_action.get("_v", -1)
    return frozenset(
        c for c, d in defaults.items() if v < d["since"]
    )


def apply_defaults(
    df: DataFrame, struct: T.StructType, fill: frozenset, defaults: dict
) -> DataFrame:
    """Fill ``fill`` columns with their default (in place — other columns,
    including scan-metadata helpers, pass through untouched)."""
    types = {f.name: f.dataType for f in struct.fields}
    for name in sorted(fill):
        df = df.withColumn(
            name, F.lit(defaults[name]["value"]).cast(types[name])
        )
    return df


def conform(df: DataFrame, table_dir: str) -> DataFrame:
    """Shape ``df`` to the table schema for an append.

    Missing defaulted columns are filled; missing non-defaulted columns
    and extra columns are errors; every column is cast to the recorded
    type. No-op for tables without schema tracking."""
    struct, defaults = table_schema(table_dir, None)
    if struct is None:
        return df
    extra = set(df.columns) - set(struct.fieldNames())
    if extra:
        raise ValueError(f"schema: append has unknown columns {sorted(extra)}")
    cols = []
    for f in struct.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif f.name in defaults:
            cols.append(
                F.lit(defaults[f.name]["value"]).cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
