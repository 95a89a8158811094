"""events_heavy_hitters: the Misra-Gries candidate pass must never lose a
phi-heavy item, even when the distinct-key count far exceeds the sketch
capacity and the heavy item's occurrences are spread thin between bursts of
distractors (the adversarial interleaving that maximizes MG decrements)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.queries.driver_queries import (
    _HH_K,
    _mg_candidates,
    events_heavy_hitters,
)


def _write_events(tmp_path, user_ids):
    n = len(user_ids)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                           pa.timestamp("us")),
            "user_id": pa.array(user_ids, pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def test_heavy_item_survives_adversarial_interleaving(spark, tmp_path):
    # 400 distinct distractors (>> _HH_K=125 counters), 20 occurrences each,
    # heavy user 7 with 70 occurrences dealt one-per-burst so every MG
    # pruning round decrements it.
    assert 400 > _HH_K
    rows = []
    for burst in range(20):
        for d in range(400):
            rows.append(10_000 + d)
        if burst < 14:
            rows.extend([7] * 5)
    total = len(rows)  # 8070
    assert 70 * 1000 > 8 * total  # user 7 is phi-heavy
    assert 20 * 1000 < 8 * total  # distractors are not
    _write_events(tmp_path, rows)
    got = events_heavy_hitters(spark, str(tmp_path)).collect()
    assert [(r.user_id, r.n_events) for r in got] == [(7, 70)]


def test_null_user_ids_do_not_crash_or_count(spark, tmp_path):
    # poison: nulls interleaved (int64 column WITH nulls, the parquet shape
    # a real stream delivers) — must be dropped by the fold AND the gate
    rows = []
    for i in range(50):
        rows.append(None if i % 7 == 0 else 1)
    rows += [2] * 3
    _write_events(tmp_path, rows)
    non_null = sum(1 for r in rows if r is not None)
    counts = pd.Series([r for r in rows if r is not None]).value_counts()
    want = sorted(
        ((int(u), int(c)) for u, c in counts.items() if c * 1000 > 8 * non_null),
        key=lambda x: (-x[1], x[0]),
    )
    got = events_heavy_hitters(spark, str(tmp_path)).collect()
    assert [(r.user_id, r.n_events) for r in got] == want
    assert want  # the test is vacuous if nothing clears the threshold


def test_mg_fold_bound_holds_per_batch_stream():
    # the fold sees many small Arrow batches, not one big one: capacity
    # pruning happens mid-stream, candidates still include the heavy key
    batches = []
    for burst in range(30):
        ids = list(range(10_000 + burst * 200, 10_000 + burst * 200 + 200))
        ids += [7] * 3
        batches.append(pd.DataFrame({"user_id": pd.Series(ids, dtype="int64")}))
    out = list(_mg_candidates(iter(batches)))
    assert len(out) == 1
    cands = set(out[0]["user_id"].tolist())
    assert len(cands) <= _HH_K + 1
    assert 7 in cands  # 90 occurrences of a 6090-row partition: > n/(k+1)
