"""Stateful streaming dedup (applyInPandasWithState): per-key state outlives
micro-batches AND query restarts — each distinct html content is emitted
exactly once, first arrival wins, duplicates arriving in later batches or
later query runs are suppressed by the state store."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from codegraphcontext_spark.streaming.stateful import (
    dedup_batch_twin,
    dedup_stream,
)

_TS0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _pages_table(rows):
    """rows: list of (url, ts_offset_s, html_bytes)."""
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [_TS0 + dt.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "text": pa.array([r[2].decode() for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


def _run_once(spark, watch_dir, out_dir, ckpt):
    q = dedup_stream(spark, watch_dir, out_dir, ckpt, once=True)
    q.awaitTermination(300)


def test_first_seen_dedup_across_batches_and_restarts(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # Batch 1: A, B distinct; B' duplicates B's content in the SAME file
    # (later ts — in-batch dedup must keep the min-(ts, url) row).
    pq.write_table(
        _pages_table(
            [
                ("https://a.example/x", 0, b"<html>alpha</html>"),
                ("https://b.example/y", 10, b"<html>beta</html>"),
                ("https://b2.example/y", 20, b"<html>beta</html>"),
            ]
        ),
        os.path.join(watch, "f1.parquet"),
    )
    _run_once(spark, watch, out, ckpt)
    got1 = {
        (r.url, r.dedup_key)
        for r in spark.read.parquet(out).collect()
    }
    assert {u for u, _ in got1} == {
        "https://a.example/x",
        "https://b.example/y",
    }

    # Batch 2 (NEW query run, same checkpoint): a duplicate of A from a
    # different url, plus a genuinely new doc C. State must remember A.
    pq.write_table(
        _pages_table(
            [
                ("https://mirror.example/x", 100, b"<html>alpha</html>"),
                ("https://c.example/z", 110, b"<html>gamma</html>"),
            ]
        ),
        os.path.join(watch, "f2.parquet"),
    )
    _run_once(spark, watch, out, ckpt)

    final = spark.read.parquet(out)
    got = {(r.url, r.dedup_key) for r in final.collect()}
    assert {u for u, _ in got} == {
        "https://a.example/x",
        "https://b.example/y",
        "https://c.example/z",
    }
    # one row per distinct content, keys distinct
    assert len(got) == 3
    assert len({k for _, k in got}) == 3

    # Final stream output == batch twin over the union of all input files
    # (arrival order here is ts-monotone per key, the twin's precondition).
    twin = {
        (r.url, r.dedup_key)
        for r in dedup_batch_twin(spark.read.parquet(watch)).collect()
    }
    assert got == twin


def _run_once_wm(spark, watch_dir, out_dir, ckpt, delay="10 minutes"):
    from codegraphcontext_spark.streaming.stateful import dedup_stream_wm

    q = dedup_stream_wm(spark, watch_dir, out_dir, ckpt, delay=delay, once=True)
    q.awaitTermination(300)


def test_watermark_dedup_within_horizon_and_restart(spark, tmp_path):
    """Native dropDuplicatesWithinWatermark variant: in-horizon duplicates
    are suppressed, including across a query restart (state rides the
    checkpoint); each distinct key appears exactly once in the sink."""
    watch = str(tmp_path / "watch")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # batch 1: two distinct keys + an in-batch duplicate of A
    pq.write_table(
        _pages_table(
            [
                ("u1", 0, b"A"),
                ("u2", 5, b"A"),
                ("u3", 10, b"B"),
            ]
        ),
        os.path.join(watch, "b1.parquet"),
    )
    _run_once_wm(spark, watch, out, ckpt)

    # batch 2 (restarted query): late duplicate of A within the horizon
    # + a new key C
    pq.write_table(
        _pages_table(
            [
                ("u4", 60, b"A"),
                ("u5", 65, b"C"),
            ]
        ),
        os.path.join(watch, "b2.parquet"),
    )
    _run_once_wm(spark, watch, out, ckpt)

    got = spark.read.parquet(out).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["dedup_key"], []).append(r["url"])
    # exactly one sink row per distinct content
    assert sorted(len(v) for v in by_key.values()) == [1, 1, 1]
    urls = {u for v in by_key.values() for u in v}
    # the duplicates (u2 in-batch, u4 cross-restart) never reached the sink
    assert "u2" not in urls and "u4" not in urls
    assert {"u1", "u3", "u5"} == urls
