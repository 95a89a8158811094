"""Watermark + windowed aggregation: finalized windows are appended exactly
once; events later than the watermark bound are dropped — enforced across
query restarts via the checkpointed watermark."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.streaming.windowed import events_windowed_stream

_D = dt.timezone.utc


def _events_table(rows):
    """rows: list of (event_id, ts, event_type, value)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _run_once(spark, watch, out, ckpt):
    q = events_windowed_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)


def test_watermark_drops_late_and_finalizes_windows(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    day = lambda d, h: dt.datetime(2025, 3, d, h, tzinfo=_D)  # noqa: E731

    # Run 1: two day-1 'click' events + a day-2 event that pushes the
    # watermark (max_ts - 1h) past the end of day 1.
    pq.write_table(
        _events_table(
            [
                (1, day(1, 10), "click", 1.0),
                (2, day(1, 11), "click", 2.0),
                (3, day(2, 2), "view", 5.0),
            ]
        ),
        os.path.join(watch, "f1.parquet"),
    )
    _run_once(spark, watch, out, ckpt)

    # Run 2 (restart, same checkpoint): a day-1 straggler BELOW the
    # checkpointed watermark (must be dropped), one more day-2 event, and a
    # day-3 event advancing the watermark past the end of day 2.
    pq.write_table(
        _events_table(
            [
                (4, day(1, 12), "click", 100.0),  # late: watermark is day2 01:00
                (5, day(2, 3), "view", 7.0),
                (6, day(3, 5), "buy", 1.0),
            ]
        ),
        os.path.join(watch, "f2.parquet"),
    )
    _run_once(spark, watch, out, ckpt)

    # Run 3 (restart again): a same-day-3 event. Its data batch runs with the
    # checkpointed watermark (day-3 04:00, past day 2's end), which finalizes
    # the day-2 window deterministically in a DATA batch — no reliance on
    # trailing no-data micro-batch behavior. The new watermark tops out at
    # day-3 22:00, below day 3's window end, so day 3 can never finalize.
    pq.write_table(
        _events_table([(7, day(3, 23), "buy", 2.0)]),
        os.path.join(watch, "f3.parquet"),
    )
    _run_once(spark, watch, out, ckpt)

    got = {
        (r.win_start.day, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # Day-1 window finalized WITHOUT the late straggler (event 4 dropped).
    assert got[(1, "click")] == (2, 3.0)
    # Day-2 window finalized with both views once the watermark passed day 2.
    assert got[(2, "view")] == (2, 12.0)
    # Day-3 window cannot have finalized (watermark ends below its end).
    assert (3, "buy") not in got
    assert len(got) == 2


def test_hopping_windows_emit_each_event_twice(spark, tmp_path):
    """slide=30min under window=1h: every finalized event is counted in
    exactly TWO overlapping windows (the hopping geometry the batch
    oracle twin events_hopping_counts pins at corpus scale), windows are
    1h long on a 30-min start grid, and late finalization still follows
    the watermark."""
    watch = str(tmp_path / "incoming_hop")
    out = str(tmp_path / "out_hop")
    ckpt = str(tmp_path / "ckpt_hop")
    os.makedirs(watch)
    t = lambda h, m: dt.datetime(2025, 3, 1, h, m, tzinfo=_D)  # noqa: E731

    pq.write_table(
        _events_table(
            [
                (1, t(10, 5), "click", 1.0),
                (2, t(10, 20), "click", 2.0),
                (3, t(10, 40), "view", 3.0),
                (4, t(11, 50), "click", 4.0),
                # watermark pusher: 13:00 - 10min watermark = 12:50, past
                # the 12:30 end of event 4's latest window
                (9, t(13, 0), "buy", 0.0),
            ]
        ),
        os.path.join(watch, "f1.parquet"),
    )
    q = events_windowed_stream(
        spark, watch, out, ckpt,
        watermark="10 minutes", window="1 hour", slide="30 minutes",
        once=True,
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(out).collect()
    assert rows, "finalized hopping windows expected"
    half_us = 1_800_000_000
    total = 0
    for r in rows:
        start, end = r["win_start"], r["win_end"]
        assert (end - start) == dt.timedelta(hours=1)
        assert (
            int(start.replace(tzinfo=_D).timestamp() * 1_000_000) % half_us
            == 0
        )
        assert r["event_type"] != "buy"  # pusher's windows not finalized
        total += r["n_events"]
    # 4 finalized events x 2 windows each
    assert total == 8
