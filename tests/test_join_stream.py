"""Native stream-stream interval join: matches are found within a
micro-batch, ACROSS micro-batch (and query-restart) boundaries while the
error is still inside the watermark window, never outside the 5-minute
bound — and the stream's total output equals the batch twin over the union
of all streamed files."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.streaming.join import (
    W_US,
    range_join_batch_twin,
    range_join_stream,
)

_TS = 1_700_000_000_000_000  # epoch micros


def _events_table(rows):
    """rows: list of (event_id, dt_us, user_id, event_type)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_TS + r[1] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # batch 0: user 1 error + in-window click (in-batch match);
    #          user 2 error with no click yet;
    #          user 1 click exactly AT the window end (must NOT match: the
    #          bound is half-open [err_ts, err_ts + W))
    b0 = [
        (1, 100, 1, "error"),
        (2, 200, 1, "click"),
        (3, 300, 2, "error"),
        (4, 100 + W_US, 1, "click"),
        (5, 400, 1, "view"),  # non-participating type
    ]
    # batch 1, separate restarted run: user 2's click arrives -> must match
    # error 3 held in join STATE from the previous run; user 3's click has
    # no error -> nothing
    b1 = [(6, 900, 2, "click"), (7, 950, 3, "click")]

    pq.write_table(_events_table(b0), os.path.join(watch, "b0.parquet"))
    q = range_join_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)
    pq.write_table(_events_table(b1), os.path.join(watch, "b1.parquet"))
    q = range_join_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)

    got = sorted(
        (r.error_id, r.click_id, r.user_id, r.gap_us)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, 2, 1, 100),  # in-batch match; click 4 at +W excluded (half-open)
        (3, 6, 2, 600),  # matched across the restart boundary via join state
    ]

    # batch twin over the union of all streamed files: identical pair set
    union = str(tmp_path / "union.parquet")
    pq.write_table(_events_table(b0 + b1), union)
    twin = sorted(
        tuple(r) for r in range_join_batch_twin(spark, union).collect()
    )
    assert twin == got
