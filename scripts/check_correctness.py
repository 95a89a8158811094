#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` twin
side-by-side (DuckDB over the same parquet tables) and compares row count,
schema, and values through the SHARED gate implementation
(``codegraphcontext_spark.oracle_gate`` — the same helpers
tests/test_driver_contract.py asserts with, so script and test cannot
disagree). Prints one status line per query; exits non-zero on mismatch.

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from codegraphcontext_spark.oracle_gate import compare, register_views
    from codegraphcontext_spark.session import get_spark
    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("cgc_correct", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    ddb = duckdb.connect()
    register_views(ddb, sf_dir)

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
        if "/sf0.01/" in osql[name] and os.path.basename(
            sf_dir.rstrip("/")
        ) != "sf0.01":
            # graph-layer oracles are fixed SQL strings pinned to the sf0.01
            # graph cache (the driver's gate scale); at any other sf they
            # would compare two different graphs, not the query logic
            print(f"SKIP {name}: oracle pinned to sf0.01 (rows={len(sdf)})")
            continue
        try:
            odf = ddb.execute(osql[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        r = compare(sdf, odf)
        ok = all(r.values())
        if not ok:
            n_fail += 1
        print(
            f"{'ok  ' if ok else 'FAIL'} {name}: rows={len(sdf)}/{len(odf)} "
            f"schema={r['schema']} values={r['values']} types={r['types']}"
        )
    spark.stop()
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {n_fail} mismatches")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
