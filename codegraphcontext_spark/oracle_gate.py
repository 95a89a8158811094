"""Shared Spark-vs-DuckDB oracle comparison — the ONE implementation of the
driver's correctness gate, used by both tests/test_driver_contract.py and
scripts/check_correctness.py so the two can never disagree on what "matches"
means (table list, view setup, canonicalization, cell normalization)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_views(con, sf_dir: str) -> None:
    """Register every driver parquet table present in sf_dir as a view."""
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )


def norm_cell(v):
    """Engine-neutral cell form: floats rounded (summation-order noise),
    arrays hashable (so canon() can sort rows containing them)."""
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, (list, np.ndarray)):
        return tuple(v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, cells normalized, rows sorted — the
    order-insensitive form both engines' results are compared in."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.map(norm_cell)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a column dtype to the kind the driver's type-strict hash
    distinguishes: 'i' (integer), 'f' (float), everything else 'o'.
    An all-null column is 'o' on both engines regardless of declared type."""
    k = s.dtype.kind
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    return "o"


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    """Row-count + schema + exact value + dtype-kind comparison of two result
    frames. Returns {"rows": bool, "schema": bool, "values": bool,
    "types": bool}. "types" reproduces the driver's type-strict value hash:
    DuckDB promoting SUM(BIGINT) to HUGEINT surfaces in pandas as float64,
    which the driver hashes differently from Spark's int64 even when every
    value compares equal — an uncast oracle twin fails there first."""
    rows_ok = len(sdf) == len(odf)
    schema_ok = sorted(sdf.columns) == sorted(odf.columns)
    vals_ok = False
    types_ok = False
    if rows_ok and schema_ok:
        a, b = canon(sdf), canon(odf)
        vals_ok = all(
            a[col].tolist() == b[col].tolist() for col in a.columns
        )
        types_ok = len(sdf) == 0 or all(
            _dtype_kind(sdf[col]) == _dtype_kind(odf[col])
            for col in sdf.columns
        )
    return {
        "rows": rows_ok,
        "schema": schema_ok,
        "values": vals_ok,
        "types": types_ok,
    }
