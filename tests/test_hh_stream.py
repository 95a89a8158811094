"""Streaming bucketed Misra-Gries heavy hitters: exact below per-bucket
capacity (stream == batch twin), candidate-complete with bounded undercount
above it, state bounded at k per bucket, and checkpoint-restart safe."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codegraphcontext_spark.streaming.heavy_hitters import (
    HH_N_BUCKETS,
    HH_STREAM_K,
    hh_batch_twin,
    hh_stream,
)

_TS = 1_700_000_000_000_000


def _events_table(rows, user_override=None):
    """rows: list of (event_id, user_id)."""
    uid = user_override if user_override is not None else [r[1] for r in rows]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_TS + r[0] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _final_summary(spark, out_dir):
    """{(bucket, user): cnt_lo} at each bucket's max n_seen, plus the
    per-bucket n_seen map."""
    got = spark.read.parquet(out_dir)
    latest = got.groupBy("bucket").agg(F.max("n_seen").alias("n_seen"))
    rows = got.join(latest, ["bucket", "n_seen"]).collect()
    summary = {(r["bucket"], r["user_id"]): r["cnt_lo"] for r in rows}
    n_seen = {r["bucket"]: r["n_seen"] for r in rows}
    return summary, n_seen


def test_stream_equals_batch_when_buckets_fit(spark, tmp_path):
    # 96 distinct users -> 6 per bucket, far below k=64: no prune ever
    # fires, so the stream's final summary IS the exact count table.
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    for part in range(3):
        rows = [(part * 1000 + i, (i + part) % 96) for i in range(400)]
        pq.write_table(
            _events_table(rows), os.path.join(watch, f"p{part}.parquet")
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = hh_stream(spark, watch, out, ckpt, once=True, max_files_per_trigger=1)
    q.awaitTermination(180)

    exact = {
        (r["bucket"], r["user_id"]): r["cnt"]
        for r in hh_batch_twin(spark.read.parquet(watch)).collect()
    }
    summary, _ = _final_summary(spark, out)
    assert summary == exact


def test_candidate_completeness_above_capacity(spark, tmp_path):
    # one bucket overloaded: 400 distinct users all in bucket 0 (ids are
    # multiples of HH_N_BUCKETS), each seen 3x, plus one heavy user seen
    # 90x. MG must keep the heavy user with cnt_lo >= 90 - n_bucket/(k+1).
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    heavy = 7 * HH_N_BUCKETS  # bucket 0
    rows, eid = [], 0
    for burst in range(3):
        for d in range(400):
            rows.append((eid, (1000 + d) * HH_N_BUCKETS)); eid += 1
        for _ in range(30):
            rows.append((eid, heavy)); eid += 1
    pq.write_table(_events_table(rows), os.path.join(watch, "a.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = hh_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    summary, n_seen = _final_summary(spark, out)
    n_bucket = n_seen[0]
    assert n_bucket == len(rows)  # everything landed in bucket 0
    # state bounded at k
    assert sum(1 for (b, _u) in summary if b == 0) <= HH_STREAM_K
    # completeness + undercount bound for the heavy user
    lo = summary[(0, heavy)]
    assert 90 - n_bucket // (HH_STREAM_K + 1) <= lo <= 90


def test_null_user_id_does_not_crash_stream(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    rows = [(i, i % 10) for i in range(60)]
    uid = [None if i % 6 == 0 else rows[i][1] for i in range(len(rows))]
    pq.write_table(
        _events_table(rows, user_override=uid),
        os.path.join(watch, "a.parquet"),
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = hh_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    exact = {
        (r["bucket"], r["user_id"]): r["cnt"]
        for r in hh_batch_twin(spark.read.parquet(watch)).collect()
    }
    summary, _ = _final_summary(spark, out)
    assert summary == exact
    assert exact  # nulls dropped, real users still counted


def test_state_survives_restart(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    rows1 = [(i, i % 32) for i in range(320)]
    pq.write_table(_events_table(rows1), os.path.join(watch, "a.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = hh_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    rows2 = [(1000 + i, i % 32) for i in range(320)]
    pq.write_table(_events_table(rows2), os.path.join(watch, "b.parquet"))
    q = hh_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    exact = {
        (r["bucket"], r["user_id"]): r["cnt"]
        for r in hh_batch_twin(spark.read.parquet(watch)).collect()
    }
    summary, n_seen = _final_summary(spark, out)
    # 32 users -> 2 per bucket, exact regime: counts must include BOTH runs
    assert summary == exact
    assert all(v == 20 for v in summary.values())
    # a from-scratch second run over only file b could never see 40/bucket
    assert all(v == 40 for v in n_seen.values())
