"""Streaming KMV sketch: the stream's final estimate must equal the batch
sketch over the same data (the merge-losslessness property, now across
micro-batches), state must survive a restart, and the per-key state must
stay bounded at K."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codegraphcontext_spark.streaming.sketch import (
    KMV_K,
    kmv_batch_twin,
    kmv_stream,
)

_TS = 1_700_000_000_000_000


def _events_table(rows):
    """rows: list of (event_id, user_id, event_type)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_TS + r[0] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _final_rows(spark, out_dir):
    got = spark.read.parquet(out_dir)
    latest = got.groupBy("event_type").agg(F.max("n_seen").alias("n_seen"))
    return {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in got.join(latest, ["event_type", "n_seen"]).collect()
    }


def test_stream_equals_batch_sketch_across_batches(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    # 3 files -> 3 micro-batches (maxFilesPerTrigger=1); 'click' has 300
    # distinct users (> K, estimation regime), 'error' has 5 (< K, exact)
    for part in range(3):
        rows = [
            (part * 1000 + i, 100 * part + i % 100, "click") for i in range(200)
        ] + [(part * 1000 + 500 + i, i % 5, "error") for i in range(20)]
        pq.write_table(
            _events_table(rows), os.path.join(watch, f"p{part}.parquet")
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = kmv_stream(spark, watch, out, ckpt, once=True, max_files_per_trigger=1)
    q.awaitTermination(180)

    batch = {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_batch_twin(spark.read.parquet(watch)).collect()
    }
    assert _final_rows(spark, out) == batch
    # below-K key is exact; above-K key holds exactly K hashes
    assert batch["error"] == (5, 5)
    assert batch["click"][0] == KMV_K


def test_null_user_id_does_not_crash_stream(spark, tmp_path):
    """A null user_id hashes to NULL; before the kmv_keyed filter this
    crashed _kmv_fn (NaN -> int64 ValueError) and, because the checkpoint
    replays the same file, every restart died too. Now null rows are
    dropped before BOTH the stream fold and the batch twin, so the two
    still agree and the estimate counts only real ids."""
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    rows = [(i, i % 40, "click") for i in range(80)]
    tbl = _events_table(rows)
    # overwrite user_id with a version containing nulls at every 10th row
    uid = [None if i % 10 == 0 else rows[i][1] for i in range(len(rows))]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("user_id"),
        "user_id",
        pa.array(uid, pa.int64()),
    )
    pq.write_table(tbl, os.path.join(watch, "a.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = kmv_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    batch = {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_batch_twin(spark.read.parquet(watch)).collect()
    }
    assert _final_rows(spark, out) == batch
    # users 0/10/20/30 appear ONLY at nulled positions -> 36 distinct real
    # users remain; below K -> exact, nulls not counted
    assert batch["click"] == (36, 36)


def test_state_survives_restart(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    rows1 = [(i, i % 150, "click") for i in range(300)]
    pq.write_table(_events_table(rows1), os.path.join(watch, "a.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = kmv_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    # second run, same checkpoint: new users must merge into the OLD state
    rows2 = [(1000 + i, 1000 + i % 150, "click") for i in range(300)]
    pq.write_table(_events_table(rows2), os.path.join(watch, "b.parquet"))
    q = kmv_stream(spark, watch, out, ckpt, once=True)
    q.awaitTermination(180)

    batch = {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_batch_twin(spark.read.parquet(watch)).collect()
    }
    final = _final_rows(spark, out)
    assert final == batch
    # 300 distinct users total; a from-scratch second run over only file b
    # could never report n_seen=600
    got = spark.read.parquet(out)
    assert got.agg(F.max("n_seen")).collect()[0][0] == 600
