"""Streaming last-touch attribution (applyInPandasWithState): per-user
last-channel state bridges micro-batches AND query restarts; aggregated
credit rows equal the batch twin; null keys/timestamps never poison the
fold; purchases with no prior touch earn no credit."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codegraphcontext_spark.streaming.attribution import (
    attr_batch_twin,
    attr_stream,
)

_TS0 = dt.datetime(2025, 1, 1)


def _events_table(rows, null_user_at=(), null_ts_at=()):
    """rows: list of (event_id, user_id, ts_offset_s, event_type)."""
    uid = [None if r[0] in null_user_at else r[1] for r in rows]
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
    q = attr_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)


def _agg(df):
    return {
        (r.user_id, r.channel): r.n
        for r in df.groupBy("user_id", "channel")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_credits_match_twin_across_restart_and_ignore_null_poison(
    spark, tmp_path
):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # Batch 1, written out of (ts, event_id) order on purpose:
    #   user 1: purchase@0 (NO prior touch -> no credit),
    #           view@60, purchase@120 (credit view)
    #   user 2: click@0 (touch only, no purchase yet)
    # plus a null-user and a null-ts row that must be ignored.
    rows1 = [
        (2, 1, 120, "purchase"),
        (0, 1, 0, "purchase"),
        (1, 1, 60, "view"),
        (3, 2, 0, "click"),
        (4, 9, 0, "poison"),   # null user
        (5, 2, 50, "poison"),  # null ts
    ]
    pq.write_table(
        _events_table(rows1, null_user_at={4}, null_ts_at={5}),
        os.path.join(watch, "f1.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    got1 = _agg(spark.read.parquet(out))
    assert got1 == {(1, "view"): 1}

    # Batch 2 (NEW query run, same checkpoint): both purchases are
    # CROSS-RUN credits only the remembered channel can produce — user 1's
    # last touch is still view@60, user 2's is click@0.
    rows2 = [(6, 1, 200, "purchase"), (7, 2, 100, "purchase")]
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
    want = _agg(attr_batch_twin(batch))
    assert got == want
    assert got == {(1, "view"): 2, (2, "click"): 1}
