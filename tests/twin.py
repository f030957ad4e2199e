"""Local replica of the driver's oracle comparison (SURVEY.md §5.2).

The driver compares (row count, schema, order-insensitive value hash)
between the Spark result and DuckDB running ``oracle_sql()`` on the same
parquet. This module reproduces that check locally so hash-match failures
are debuggable before the driver sees them: columns sorted by name, rows
canonicalized to a multiset, floats compared bit-exactly (queries are
responsible for rounding on BOTH sides — SURVEY.md §7.4 hazard 2).
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import numpy as np
import pandas as pd


def canonical_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # Tagged: the driver's hasher distinguishes int 5 from float 5.0
        # (CORRECTNESS_r03: DuckDB HUGEINT sums fetch as float64 and
        # hash-mismatch Spark's int64 despite == equality). Keep the same
        # distinction locally so parity tests reproduce the driver.
        return ("f", f)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canonical_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canonical_value(x)) for k, x in v.items()))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return None
        return v.to_pydatetime().isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notna(df), None)
    rows = [tuple(canonical_value(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def assert_twin_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    )
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    s_rows, d_rows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    if mismatches:
        i, a, b = mismatches[0]
        raise AssertionError(
            f"{name}: {len(mismatches)}/{len(s_rows)} canonical rows differ; "
            f"first at sorted-index {i}:\n  spark : {a}\n  duckdb: {b}\n  cols: {s_cols}"
        )
