"""Stateful streaming SCD2 maintenance (applyInPandasWithState): per-user
open-interval state survives micro-batches AND query restarts; a closed
validity interval is emitted exactly once, when the state-changing event
arrives — and the stream converges to the batch twin's closed rows."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.streaming.scd2 import (
    scd2_batch_twin,
    scd2_stream,
)

_TS0 = dt.datetime(2025, 1, 1)
_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_table(rows):
    """rows: list of (event_id, user_id, ts_offset_s, event_type)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_TS0 + dt.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _run_once(spark, watch, out, ckpt):
    q = scd2_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)


def _us(offset_s: int) -> int:
    return int((_TS0 + dt.timedelta(seconds=offset_s)).timestamp() * 1e6)


def test_intervals_close_on_change_and_survive_restart(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # Batch 1: user 1 runs view,view -> click (closes the view interval);
    # user 2 opens a view interval that stays open.
    pq.write_table(
        _events_table(
            [
                (0, 1, 0, "view"),
                (1, 1, 60, "view"),
                (2, 1, 120, "click"),
                (3, 2, 0, "view"),
            ]
        ),
        os.path.join(watch, "f1.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    got1 = spark.read.parquet(out).collect()
    assert len(got1) == 1
    r = got1[0]
    assert (r.user_id, r.version, r.state, r.n_events) == (1, 1, "view", 2)
    assert r.valid_from_us == _us(0)
    assert r.valid_to_us == _us(120)

    # Batch 2 (NEW query run, same checkpoint): user 2's open interval must
    # still be in state — a same-state event extends it (no emit), then a
    # change closes it with BOTH events counted across runs; user 1's open
    # click interval closes too, with version continuing from state.
    pq.write_table(
        _events_table(
            [
                (4, 2, 600, "view"),
                (5, 2, 700, "purchase"),
                (6, 1, 300, "error"),
            ]
        ),
        os.path.join(watch, "f2.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    rows = {
        (r.user_id, r.version, r.state, r.valid_from_us, r.valid_to_us,
         r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {
        (1, 1, "view", _us(0), _us(120), 2),
        (1, 2, "click", _us(120), _us(300), 1),
        (2, 1, "view", _us(0), _us(700), 2),
    }

    # Stream output == batch twin over all input (open tails excluded).
    twin = {
        (r.user_id, r.version, r.state, r.valid_from_us, r.valid_to_us,
         r.n_events)
        for r in scd2_batch_twin(
            spark.read.schema(_SCHEMA).parquet(watch)
        ).collect()
    }
    assert rows == twin


def test_batch_twin_include_open(spark):
    df = spark.createDataFrame(
        [
            (0, _TS0, 1, "view", 1.0, "{}"),
            (1, _TS0 + dt.timedelta(seconds=5), 1, "click", 1.0, "{}"),
        ],
        _SCHEMA,
    )
    closed_only = scd2_batch_twin(df).collect()
    with_open = scd2_batch_twin(df, include_open=True).collect()
    assert len(closed_only) == 1 and len(with_open) == 2
    assert {r.valid_to_us for r in with_open} - {
        r.valid_to_us for r in closed_only
    } == {-1}


def test_null_key_ts_or_state_does_not_crash_stream(spark, tmp_path):
    """Null user_id, ts, or event_type rows must not kill the streaming
    query (NaT -> int64 astype in the state fold raises and the checkpoint
    replays the crash forever). The guard drops them before BOTH the
    stream and the batch twin, so they still agree."""
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [_TS0, None, _TS0 + dt.timedelta(seconds=5),
                 _TS0 + dt.timedelta(seconds=9),
                 _TS0 + dt.timedelta(seconds=10)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, None, 1, 1], pa.int64()),
            "event_type": pa.array(
                ["view", "view", "view", None, "click"], pa.string()
            ),
            "value": pa.array([1.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(watch, "f1.parquet"))
    _run_once(spark, watch, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.user_id, r.state, r.n_events) == (1, "view", 1)
    twin = scd2_batch_twin(
        spark.read.schema(_SCHEMA).parquet(watch)
    ).collect()
    assert len(twin) == 1 and twin[0].n_events == 1
