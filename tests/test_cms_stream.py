"""Streaming CMS: the stream's final grids must equal the batch grid over
the same data (counter addition is associative across micro-batches), state
must survive a restart, the per-row state must stay bounded at W counters,
and estimates from the streamed grid must dominate true counts."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codegraphcontext_spark.streaming.sketch import (
    CMS_D,
    CMS_W,
    cms_batch_twin,
    cms_estimate,
    cms_stream,
)

_TS = 1_700_000_000_000_000


def _events_table(rows):
    """rows: list of (event_id, user_id)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_TS + r[0] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _final_grids(spark, out_dir):
    got = spark.read.parquet(out_dir)
    latest = got.groupBy("d").agg(F.max("n_seen").alias("n_seen"))
    return {
        r["d"]: list(r["cells"])
        for r in got.join(latest, ["d", "n_seen"]).collect()
    }


def _batch_grids(spark, watch):
    return {
        r["d"]: list(r["cells"])
        for r in cms_batch_twin(spark.read.parquet(watch)).collect()
    }


def test_stream_equals_batch_grid_across_batches(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    # 3 files -> 3 micro-batches; skewed keys so buckets collide for real
    for part in range(3):
        rows = [
            (part * 1000 + i, (i * i) % (40 + 10 * part)) for i in range(250)
        ]
        pq.write_table(
            _events_table(rows), os.path.join(watch, f"p{part}.parquet")
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = cms_stream(spark, watch, out, ckpt, once=True, max_files_per_trigger=1)
    q.awaitTermination(180)

    streamed = _final_grids(spark, out)
    batch = _batch_grids(spark, watch)
    assert set(streamed) == set(range(CMS_D))
    assert streamed == batch
    # each grid row holds exactly W counters summing to the event count
    for d in range(CMS_D):
        assert len(streamed[d]) == CMS_W
        assert sum(streamed[d]) == 750


def test_restart_resumes_grid_from_checkpoint(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    pq.write_table(
        _events_table([(i, i % 30) for i in range(300)]),
        os.path.join(watch, "p0.parquet"),
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    cms_stream(spark, watch, out, ckpt, once=True).awaitTermination(180)
    # new file lands, SAME checkpoint: fold continues, never recounts p0
    pq.write_table(
        _events_table([(1000 + i, i % 7) for i in range(100)]),
        os.path.join(watch, "p1.parquet"),
    )
    cms_stream(spark, watch, out, ckpt, once=True).awaitTermination(180)

    streamed = _final_grids(spark, out)
    assert streamed == _batch_grids(spark, watch)
    assert sum(streamed[0]) == 400  # counted once, not replayed


def test_null_user_id_does_not_crash_stream(spark, tmp_path):
    """Null ids must be dropped in cms_keyed, before the state fold (the
    checkpoint-replay poison class) — and the batch twin drops the same
    rows so the grids still agree."""
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([_TS, _TS + 1, _TS + 2], pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([7, None, 9], pa.int64()),
            "event_type": pa.array(["click"] * 3, pa.string()),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(watch, "p0.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = cms_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    streamed = _final_grids(spark, out)
    assert streamed == _batch_grids(spark, watch)
    assert all(sum(cells) == 2 for cells in streamed.values())


def test_estimate_from_streamed_grid_dominates_exact(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    rows = [(i, i % 11) for i in range(220)] + [(500 + i, 3) for i in range(80)]
    pq.write_table(_events_table(rows), os.path.join(watch, "p0.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    cms_stream(spark, watch, out, ckpt, once=True).awaitTermination(180)

    grids = _final_grids(spark, out)
    exact = {u: 0 for u in range(11)}
    for _, u in rows:
        exact[u] += 1
    for u, n in exact.items():
        assert cms_estimate(grids, u) >= n
    # the planted heavy key's estimate is at least its true 100 hits
    assert cms_estimate(grids, 3) >= 100
