"""Streaming CUSUM monitor (applyInPandasWithState): per-type day-grain
state bridges micro-batches AND restarts; only COMPLETE days commit (the
newest day buffers until a later day arrives); committed emissions equal
the batch twin cut at the same horizon; nulls never poison the fold."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.streaming.cusum import (
    CUSUM_MU,
    cusum_batch_twin,
    cusum_stream,
)

_TS0 = dt.datetime(2025, 1, 1)
_DAY0 = int(_TS0.timestamp() * 1_000_000) // 86_400_000_000


def _events_table(rows, null_user_at=(), null_ts_at=()):
    """rows: (event_id, user_id, day_offset, sec_in_day, event_type)."""
    uid = [None if r[0] in null_user_at else r[1] for r in rows]
    ts = [
        None
        if r[0] in null_ts_at
        else _TS0 + dt.timedelta(days=r[2], seconds=r[3])
        for r in rows
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array([r[4] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _run_once(spark, watch, out, ckpt):
    q = cusum_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)


def _emitted(spark, out):
    return {
        (r.event_type, r.day_n): (r.c, r.s, r.alarm)
        for r in spark.read.parquet(out).collect()
    }


def test_stream_commits_complete_days_and_matches_twin(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # Batch 1: day 0 has 25 'click' events (15 over mu=10), day 1 has 3
    # so far -> only day 0 commits. Null-user/ts rows ride along.
    rows1 = (
        [(i, 1 + i % 5, 0, i, "click") for i in range(25)]
        + [(100 + i, 1, 1, i, "click") for i in range(3)]
        + [(900, 9, 0, 0, "click"), (901, 2, 0, 50, "click")]
    )
    pq.write_table(
        _events_table(rows1, null_user_at={900}, null_ts_at={901}),
        os.path.join(watch, "f1.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    got1 = _emitted(spark, out)
    assert got1 == {("click", _DAY0): (25, 15, 0)}

    # Batch 2 (NEW run, same checkpoint): day 1 grows to 23 total and day
    # 2 opens -> day 1 commits with the CROSS-RUN buffered 3 + new 20;
    # S = 15 + (23-10) = 28 -> alarm at h = 3*mu = 30? no: 28 < 30.
    rows2 = [(200 + i, 1 + i % 3, 1, 100 + i, "click") for i in range(20)]
    rows2 += [(300, 4, 2, 5, "click")]
    pq.write_table(
        _events_table(rows2), os.path.join(watch, "f2.parquet")
    )
    _run_once(spark, watch, out, ckpt)
    got = _emitted(spark, out)
    assert got[("click", _DAY0 + 1)] == (23, 28, 0)

    # Twin over the same horizon (days <= day 1) must agree exactly.
    all_rows = rows1 + rows2
    batch = spark.createDataFrame(
        [
            (
                r[0],
                None
                if r[0] == 901
                else _TS0 + dt.timedelta(days=r[2], seconds=r[3]),
                None if r[0] == 900 else r[1],
                r[4],
                1.0,
                "{}",
            )
            for r in all_rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    twin = {
        (r.event_type, r.day_n): (r.c, r.s, r.alarm)
        for r in cusum_batch_twin(batch, through_day=_DAY0 + 1).collect()
    }
    assert twin == got


def test_alarm_fires_at_threshold(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    # two committed days at mu+16 each: S = 16 then 32 >= 3*mu=30 -> alarm
    rows = (
        [(i, 1, 0, i, "err") for i in range(CUSUM_MU + 16)]
        + [(100 + i, 1, 1, i, "err") for i in range(CUSUM_MU + 16)]
        + [(999, 1, 2, 0, "err")]
    )
    pq.write_table(_events_table(rows), os.path.join(watch, "f1.parquet"))
    _run_once(spark, watch, out, ckpt)
    got = _emitted(spark, out)
    assert got[("err", _DAY0)] == (26, 16, 0)
    assert got[("err", _DAY0 + 1)] == (26, 32, 1)
