"""Streaming event-type transitions (applyInPandasWithState): per-user
last-event state bridges micro-batches AND query restarts; aggregated
emitted pairs equal the batch twin; null keys/timestamps never poison the
fold."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codegraphcontext_spark.streaming.transitions import (
    trans_batch_twin,
    trans_stream,
)

_TS0 = dt.datetime(2025, 1, 1)


def _events_table(rows, null_user_at=(), null_ts_at=()):
    """rows: list of (event_id, user_id, ts_offset_s, event_type)."""
    uid = [
        None if r[0] in null_user_at else r[1] for r in rows
    ]
    ts = [
        None if r[0] in null_ts_at else _TS0 + dt.timedelta(seconds=r[2])
        for r in rows
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _run_once(spark, watch, out, ckpt):
    q = trans_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)


def _agg(df):
    return {
        (r.user_id, r.from_type, r.to_type): r.n
        for r in df.groupBy("user_id", "from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_pairs_match_twin_across_restart_and_ignore_null_poison(
    spark, tmp_path
):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # Batch 1: user 1 = view -> click -> buy (intra-batch ordering must
    # come from (ts, event_id), so write rows out of order); user 2 = one
    # event (no pair yet). A null-user and a null-ts row ride along and
    # must be ignored, not crash the fold + checkpoint.
    rows1 = [
        (2, 1, 120, "buy"),
        (0, 1, 0, "view"),
        (1, 1, 60, "click"),
        (3, 2, 0, "view"),
        (4, 9, 0, "poison"),   # null user
        (5, 2, 50, "poison"),  # null ts
    ]
    pq.write_table(
        _events_table(rows1, null_user_at={4}, null_ts_at={5}),
        os.path.join(watch, "f1.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    got1 = _agg(spark.read.parquet(out))
    assert got1 == {
        (1, "view", "click"): 1,
        (1, "click", "buy"): 1,
    }

    # Batch 2 (NEW query run, same checkpoint): the remembered last events
    # bridge the gap — user 1's buy -> view and user 2's view -> click are
    # CROSS-RUN pairs only state can produce.
    rows2 = [(6, 1, 200, "view"), (7, 2, 100, "click")]
    pq.write_table(
        _events_table(rows2), os.path.join(watch, "f2.parquet")
    )
    _run_once(spark, watch, out, ckpt)
    got = _agg(spark.read.parquet(out))

    all_rows = rows1 + rows2
    batch = spark.createDataFrame(
        [
            (
                r[0],
                None if r[0] == 5 else _TS0 + dt.timedelta(seconds=r[2]),
                None if r[0] == 4 else r[1],
                r[3],
            )
            for r in all_rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    want = _agg(trans_batch_twin(batch))
    assert got == want
    assert (1, "buy", "view") in got and (2, "view", "click") in got
