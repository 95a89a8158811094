#!/usr/bin/env python
"""Bench-regression guard: diff a fresh BENCH_detail.json against the last
committed one and fail loudly on any query that got meaningfully slower.

A regression = BOTH a ratio above 2x AND an absolute slowdown above 0.5 s —
the two-sided bound keeps sub-100 ms queries (pure jitter at this host's
memory-overcommit variance) from tripping the guard while still catching the
round-2 dedup_shingle_pairs incident class (seconds-scale recompute blowups).

Usage: python scripts/bench_diff.py [old.json] [new.json]
  default old = `git show HEAD:BENCH_detail.json`, new = ./BENCH_detail.json
Exit 0 = no regressions; 1 = regressions listed on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RATIO = 2.0
ABS_FLOOR_S = 0.5


def regressions(old: dict, new: dict) -> list[tuple[str, float, float]]:
    """(name, old_s, new_s) for every common query slower by BOTH bounds.
    Queries only in one side are ignored (added/retired, not regressed)."""
    out = []
    for name, t_new in new.items():
        t_old = old.get(name)
        if t_old is None:
            continue
        if t_new > t_old * RATIO and t_new - t_old > ABS_FLOOR_S:
            out.append((name, t_old, t_new))
    return sorted(out, key=lambda r: r[2] - r[1], reverse=True)


def _load(path_or_git: str) -> dict:
    if path_or_git.startswith("git:"):
        raw = subprocess.run(
            ["git", "show", path_or_git[4:]],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout
        return json.loads(raw)
    with open(path_or_git) as f:
        return json.load(f)


# Host-probe reading below which the measurement window is in this VM's
# documented memory-overcommit pathology (healthy phases read multi-GB/s,
# bad phases ~0.006 — BASELINE.md "host variance").
_HOST_DEGRADED_GBPS = 1.0
# Sweep-tail fraction: regressions clustered past this point of the sweep,
# in a run whose overall median also drifted, are end-of-sweep host drift
# (the r04 pattern: all 8 driver-run flags were the last-registered names).
_TAIL_FRAC = 0.8
_RUN_DRIFT_MEDIAN = 1.15


def adjudicate(name: str, qold: dict, qnew: dict, meta: dict) -> str:
    """Mechanical verdict for one regression: 'code-regression' unless the
    per-query sweep-position + host-probe record (BENCH_detail
    queries_meta, recorded AT measurement time) shows a degraded host
    window or an end-of-sweep position inside a run-wide drift."""
    m = meta.get(name)
    if not m:
        return "code-regression (no meta — adjudicate manually)"
    probe = m.get("host_gbps")
    if probe is not None and probe < _HOST_DEGRADED_GBPS:
        return f"host-drift (probe {probe} GB/s at idx {m['idx']})"
    common = [n for n in qnew if n in qold and qold[n] > 0]
    ratios = sorted(qnew[n] / qold[n] for n in common)
    med = ratios[len(ratios) // 2] if ratios else 1.0
    n_total = max((mm.get("idx", 0) for mm in meta.values()), default=0) + 1
    if med > _RUN_DRIFT_MEDIAN and m.get("idx", 0) >= _TAIL_FRAC * n_total:
        return (
            f"tail-drift (idx {m['idx']}/{n_total}, run median {med:.2f}x)"
        )
    return "code-regression"


def main() -> int:
    old_src = sys.argv[1] if len(sys.argv) > 1 else "git:HEAD:BENCH_detail.json"
    new_src = sys.argv[2] if len(sys.argv) > 2 else "BENCH_detail.json"
    old_full, new_full = _load(old_src), _load(new_src)
    old, new = old_full["queries"], new_full["queries"]
    meta = new_full.get("queries_meta", {})
    regs = regressions(old, new)
    common = len(set(old) & set(new))
    n_code = 0
    for name, t_old, t_new in regs:
        verdict = adjudicate(name, old, new, meta)
        n_code += verdict.startswith("code-regression")
        print(
            f"REGRESSION {name}: {t_old:.2f}s -> {t_new:.2f}s "
            f"({t_new / max(t_old, 1e-9):.1f}x) [{verdict}]"
        )
    print(
        f"{'FAIL' if n_code else 'PASS'}: {n_code} code regressions, "
        f"{len(regs) - n_code} host/tail-drift flags "
        f"over {common} common queries ({old_src} -> {new_src})"
    )
    return 1 if n_code else 0


if __name__ == "__main__":
    raise SystemExit(main())
