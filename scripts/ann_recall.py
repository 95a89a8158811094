#!/usr/bin/env python
"""ANN quality/cost sweep: recall@k of each approximate variant against the
brute-force cosine baseline (same corpus, same query vector — vec_id 0),
plus warm per-query wall time. Written for the BASELINE.md quality table;
run: python scripts/ann_recall.py [sf_dir]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from codegraphcontext_spark.queries.driver_queries import SPARK_QUERIES
    from codegraphcontext_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        best, rows = None, None
        for _ in range(2):  # min-of-2 warm reps (host-phase noise)
            t0 = time.time()
            rows = SPARK_QUERIES[name](spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return rows, best

    truth_rows, t_brute = run("embed_topk_cosine")
    truth = [r["vec_id"] for r in truth_rows]
    print(f"{'variant':22s} {'k':>3s} {'recall@k':>9s} {'sec(warm)':>10s}")
    print(f"{'embed_topk_cosine':22s} {len(truth):3d} {'1.000':>9s} {t_brute:10.2f}")
    for name in (
        "embed_ann_lsh",
        "embed_ann_lsh_wide",
        "embed_ann_ivf",
        "embed_pq",
        "embed_pq_rerank",
        "embed_ivfpq",
        "embed_binary_hamming",
        "embed_binary_rerank",
    ):
        rows, dt = run(name)
        got = [r["vec_id"] for r in rows]
        k = min(len(got), len(truth))
        recall = len(set(got[:k]) & set(truth[:k])) / k if k else 0.0
        print(f"{name:22s} {k:3d} {recall:9.3f} {dt:10.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
