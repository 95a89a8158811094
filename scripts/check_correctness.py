#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` twin
side-by-side at sf0.01 (DuckDB over the same parquet tables) and compares
row count, schema (column names), and values (columns sorted by name, rows
sorted, exact equality — the driver hashes, so any value drift fails there
too). Prints one status line per query and exits non-zero on any mismatch.

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df):
    import numpy as np
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # canonicalize away engine-side dtype differences the driver's hash
        # normalizes through string form (int64 vs int32, decimal vs float)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) == "object":
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    import duckdb
    import pandas as pd

    from codegraphcontext_spark.session import get_spark
    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("cgc_correct", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    ddb = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            ddb.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, osql = entry.queries(), entry.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = ddb.execute(osql[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(sdf.columns) == sorted(odf.columns)
        vals_ok = False
        if rows_ok and schema_ok:
            a, b = _canon(sdf), _canon(odf)
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False, rtol=1e-6
                )
                vals_ok = True
            except AssertionError:
                vals_ok = False
        status = "ok  " if (rows_ok and schema_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{status} {name}: rows={len(sdf)}/{len(odf)} "
            f"schema={schema_ok} values={vals_ok}"
        )
    spark.stop()
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {n_fail} mismatches")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
