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
        return json.loads(raw)["queries"]
    with open(path_or_git) as f:
        return json.load(f)["queries"]


def main() -> int:
    old_src = sys.argv[1] if len(sys.argv) > 1 else "git:HEAD:BENCH_detail.json"
    new_src = sys.argv[2] if len(sys.argv) > 2 else "BENCH_detail.json"
    old, new = _load(old_src), _load(new_src)
    regs = regressions(old, new)
    common = len(set(old) & set(new))
    for name, t_old, t_new in regs:
        print(
            f"REGRESSION {name}: {t_old:.2f}s -> {t_new:.2f}s "
            f"({t_new / max(t_old, 1e-9):.1f}x)"
        )
    print(
        f"{'FAIL' if regs else 'PASS'}: {len(regs)} regressions "
        f"over {common} common queries ({old_src} -> {new_src})"
    )
    return 1 if regs else 0


if __name__ == "__main__":
    raise SystemExit(main())
