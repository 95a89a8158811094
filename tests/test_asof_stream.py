"""Streaming as-of: keyed state carries the last click ACROSS micro-batch
boundaries (a click in batch 0 matches an error arriving in batch 1), and
the stream's total output equals the batch query over the union of all
files — the batch/stream duality the engine maintains for every stateless
and stateful operator."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.queries.driver_queries import SPARK_QUERIES
from codegraphcontext_spark.streaming.asof import asof_stream

_TS = 1_700_000_000_000_000  # epoch micros


def _events_table(rows):
    """rows: list of (event_id, dt_us, user_id, event_type)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([_TS + r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def test_asof_stream_state_spans_batches_and_matches_batch_query(
    spark, tmp_path
):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # batch 0: user 1 clicks, user 2 errors with NO prior click
    b0 = [(1, 100, 1, "click"), (2, 200, 2, "error"), (3, 300, 1, "view")]
    # batch 1 (later event times): user 1 errors -> must match click id 1
    # from the PREVIOUS batch; user 2 clicks then errors within the batch
    b1 = [
        (4, 1_000, 1, "error"),
        (5, 1_100, 2, "click"),
        (6, 1_500, 2, "error"),
    ]
    pq.write_table(_events_table(b0), os.path.join(watch, "b0.parquet"))
    q = asof_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)
    pq.write_table(_events_table(b1), os.path.join(watch, "b1.parquet"))
    q = asof_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(300)

    got = sorted(
        (r.event_id, r.user_id, r.prior_click_id, r.gap_us)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (2, 2, -1, -1),      # no prior click yet
        (4, 1, 1, 900),      # matched across the batch boundary
        (6, 2, 5, 400),      # matched within batch 1
    ]

    # batch twin over the union of all streamed files: identical rows
    sf_dir = tmp_path / "sf_twin"
    sf_dir.mkdir()
    pq.write_table(
        _events_table(b0 + b1), str(sf_dir / "events.parquet")
    )
    twin = sorted(
        tuple(r)
        for r in SPARK_QUERIES["events_asof_join"](spark, str(sf_dir)).collect()
    )
    assert twin == got
