"""Stateful streaming sessionization (applyInPandasWithState): per-user
open-session state survives micro-batches AND query restarts; a session row
is emitted exactly once, when a later event closes it by exceeding the gap."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.streaming.sessionize import (
    SESSION_GAP_S,
    sessionize_batch_twin,
    sessionize_stream,
)

_TS0 = dt.datetime(2025, 1, 1)
_GAP = SESSION_GAP_S


def _events_table(rows):
    """rows: list of (event_id, user_id, ts_offset_s, value)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_TS0 + dt.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _run_once(spark, watch, out, ckpt):
    q = sessionize_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)


def test_sessions_close_on_gap_and_survive_restart(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # Batch 1: user 1 has a 3-event burst, then a gap-exceeding event that
    # closes it (and opens session 2); user 2 has one open session only.
    pq.write_table(
        _events_table(
            [
                (0, 1, 0, 1.0),
                (1, 1, 60, 2.0),
                (2, 1, 120, 3.0),
                (3, 1, 120 + _GAP + 1, 10.0),
                (4, 2, 0, 5.0),
            ]
        ),
        os.path.join(watch, "f1.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    got1 = spark.read.parquet(out).collect()
    assert len(got1) == 1  # only user 1's closed burst
    s = got1[0]
    assert (s.user_id, s.n_events, s.sum_value) == (1, 3, 6.0)
    assert s.session_start == _TS0
    assert s.session_end == _TS0 + dt.timedelta(seconds=120)

    # Batch 2 (NEW query run, same checkpoint): user 2's open session must
    # still be in state — an in-gap event extends it (no emit), then a
    # gap-exceeding one closes it with BOTH events counted across runs.
    pq.write_table(
        _events_table(
            [
                (5, 2, 600, 7.0),
                (6, 2, 600 + _GAP + 1, 1.0),
            ]
        ),
        os.path.join(watch, "f2.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    rows = {
        (r.user_id, r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {(1, 3, 6.0), (2, 2, 12.0)}

    # Stream output == batch twin over all input (open tails excluded).
    twin = {
        (r.user_id, r.n_events, r.sum_value)
        for r in sessionize_batch_twin(
            spark.read.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ).parquet(watch)
        ).collect()
    }
    assert rows == twin


def test_batch_twin_include_open(spark):
    df = spark.createDataFrame(
        [
            (0, _TS0, 1, "click", 1.0, "{}"),
            (1, _TS0 + dt.timedelta(seconds=_GAP + 5), 1, "click", 2.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    closed_only = sessionize_batch_twin(df).collect()
    with_open = sessionize_batch_twin(df, include_open=True).collect()
    assert len(closed_only) == 1 and len(with_open) == 2


def test_null_user_or_ts_does_not_crash_stream(spark, tmp_path):
    """A null user_id or ts row must not kill the streaming query (NaT ->
    int64 astype in the state fold raised, and the checkpoint replayed the
    crash on every restart). The guard drops unsessionizable rows before
    BOTH the stream and the batch twin, so they still agree."""
    import pandas as pd
    from pyspark.sql import functions as F

    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    tbl = _events_table(
        [
            (0, 1, 0, 1.0),
            (1, 1, 60, 2.0),
            (2, 1, 60 + _GAP + 1, 3.0),  # closes user 1's first session
            (3, 2, 0, 4.0),
        ]
    )
    # poison: null user_id on one row, null ts on another
    uid = tbl.column("user_id").to_pylist()
    uid[3] = None
    ts = tbl.column("ts").to_pylist()
    tbl = tbl.set_column(
        tbl.schema.get_field_index("user_id"), "user_id",
        pa.array(uid, pa.int64()),
    )
    ts2 = ts[:2] + [None] + ts[3:]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"), "ts",
        pa.array(ts2, pa.timestamp("us")),
    )
    pq.write_table(tbl, os.path.join(watch, "a.parquet"))

    _run_once(spark, watch, out, ckpt)  # must not raise
    got = spark.read.parquet(out)
    twin = sessionize_batch_twin(spark.read.parquet(watch))
    assert sorted(
        (r.user_id, r.n_events) for r in got.collect()
    ) == sorted((r.user_id, r.n_events) for r in twin.collect())
    # user 1 still closed one session (events 0 and 2 survive; event 1's
    # null ts is dropped), and no null-user session row exists
    assert got.where(F.col("user_id").isNull()).count() == 0
