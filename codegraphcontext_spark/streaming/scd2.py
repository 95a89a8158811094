"""Custom stateful streaming operator: SCD type-2 dimension maintenance via
``applyInPandasWithState`` — the streaming twin of the ``events_scd2`` batch
query.

The warehouse use case: a dimension table must carry versioned validity
intervals ([valid_from, valid_to) per state run), and the events that change
state arrive continuously. Batch rebuilds recompute the whole history; this
operator CLOSES an interval the moment a state-changing event arrives and
emits exactly that closed row — sink volume ∝ state changes, not events.

State design for 100 TB: one open-interval row per user (a string + three
longs), hash-partitioned by ``user_id`` across executors like any shuffle —
adding executors splits the keyspace; no broadcast, no driver state. The
still-open interval stays in state (``NoTimeout``; production would add an
event-time timeout to flush terminated users — same dataflow, one more
GroupStateTimeout argument).

Ordering contract (same as ``sessionize._session_fn``): events are processed
sorted by (ts, event_id) within each micro-batch; stream == batch twin when
arrival is ts-monotone per user across batches (true of a log feed, and of
the test corpus).

Reference analog: none (the reference's watcher emits whole-file CDC deltas,
``core/watcher.py:84-119``; this is the keyed state-history variant a
warehouse sink needs).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_OUT_SCHEMA = (
    "user_id long, version long, state string, valid_from_us long, "
    "valid_to_us long, n_events long"
)
# epoch-nanosecond longs, not timestamps: keeps the state row free of any
# timezone/unit coercion between the JVM state store and pandas
_STATE_SCHEMA = "state string, from_ns long, n_events long, version long"


def _scd2_fn(
    key: Tuple[int], pdf_iter: Iterable[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    cur = list(state.get) if state.exists else None
    frames = [p for p in pdf_iter if len(p)]
    if not frames:
        return
    batch = pd.concat(frames, ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"])
    closed = []  # (version, state, from_ns, to_ns, n_events)
    for ts, et in zip(batch["ts"].astype("int64"), batch["event_type"]):
        if cur is None:
            cur = [et, ts, 1, 1]
        elif et != cur[0]:
            closed.append((cur[3], cur[0], cur[1], ts, cur[2]))
            cur = [et, ts, 1, cur[3] + 1]
        else:
            cur[2] += 1
    state.update(tuple(cur))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(closed), dtype="int64"),
                "version": pd.Series([c[0] for c in closed], dtype="int64"),
                "state": pd.Series([c[1] for c in closed], dtype="object"),
                "valid_from_us": pd.Series(
                    [c[2] // 1000 for c in closed], dtype="int64"
                ),
                "valid_to_us": pd.Series(
                    [c[3] // 1000 for c in closed], dtype="int64"
                ),
                "n_events": pd.Series([c[4] for c in closed], dtype="int64"),
            }
        )


def _scd2able(events: DataFrame) -> DataFrame:
    """Drop rows the state fold cannot place — null user_id (no dimension
    key), null ts (no position in time), or null event_type (no state).
    Applied identically to the stream and the batch twin; without the ts
    guard a single NaT crashes the int64 fold and the checkpoint replays
    it forever (the KMV-sketch null-crash class)."""
    return events.where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )


def scd2_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
) -> Any:
    """Start the SCD2 maintenance query over an events parquet directory.

    Emits one row per CLOSED validity interval (a state-changing event
    arrived); the open interval per user lives in the streaming state
    store under ``checkpoint_dir``, so a restarted query resumes
    mid-interval. Returns the StreamingQuery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = _scd2able(
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(watch_dir)
    )
    intervals = stream.groupBy("user_id").applyInPandasWithState(
        _scd2_fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        intervals.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def scd2_batch_twin(
    events: DataFrame, include_open: bool = False
) -> DataFrame:
    """Batch semantics the stream converges to: the same gaps-and-islands
    build as the ``events_scd2`` query (exact integer microseconds; no
    user slice). The stream never emits each user's final (still-open)
    interval, so the twin drops valid_to_us = -1 rows unless
    ``include_open``."""
    from pyspark.sql import Window

    ev = _scd2able(events).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("event_type").over(w)
    isl = ev.withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    ).withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = isl.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    out = iv.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "state",
        F.col("valid_from_us").cast("bigint").alias("valid_from_us"),
        F.coalesce(F.lead("valid_from_us").over(w2), F.lit(-1))
        .cast("bigint")
        .alias("valid_to_us"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )
    if not include_open:
        out = out.where(F.col("valid_to_us") != -1)
    return out
