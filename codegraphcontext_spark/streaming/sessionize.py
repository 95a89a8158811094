"""Custom stateful streaming operator #2: gap-based sessionization via
``applyInPandasWithState``.

The training-data use case: clickstream/crawl events arrive continuously;
downstream wants one row per *session* (a burst of per-user activity with no
gap longer than SESSION_GAP_S). Fixed windows can't express "a session ends
when the user goes quiet"; this is the canonical keyed-state shape the
reference's job tracker approximates with debounce timers
(``core/watcher.py:70-82``: a per-path timer that re-arms on every event and
fires after quiet time — exactly a session gap).

State design for 100 TB: one open-session row per active user (4 longs + a
double), hash-partitioned by ``user_id`` across executors like any shuffle —
adding executors splits the keyspace; no broadcast, no driver state. A
session row is emitted ONLY when a later event closes it, so sink volume ∝
sessions, not events. The still-open tail session per user stays in state
(``NoTimeout``; a production deployment would add an event-time timeout to
flush idle users — same dataflow, one more GroupStateTimeout argument).

Ordering contract (same as ``stateful.dedup_batch_twin``): events are
processed sorted by (ts, event_id) within each micro-batch; stream == batch
twin when arrival is ts-monotone per user across batches (true of a log
feed, and of the test corpus).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_GAP_S = 1800  # 30 min of quiet closes a session

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# epoch-nanosecond longs, not timestamps: keeps the state row free of any
# timezone/unit coercion between the JVM state store and pandas
_STATE_SCHEMA = "start_ns long, last_ns long, n_events long, sum_value double"


def _session_fn(
    key: Tuple[int], pdf_iter: Iterable[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    gap_ns = SESSION_GAP_S * 1_000_000_000
    open_s = list(state.get) if state.exists else None
    closed = []
    frames = [p for p in pdf_iter if len(p)]
    if not frames:
        return
    batch = pd.concat(frames, ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"])
    for ts, value in zip(
        batch["ts"].astype("int64"), batch["value"].fillna(0.0)
    ):
        if open_s is None:
            open_s = [ts, ts, 1, float(value)]
        elif ts - open_s[1] > gap_ns:
            closed.append(open_s)
            open_s = [ts, ts, 1, float(value)]
        else:
            open_s[1] = ts
            open_s[2] += 1
            open_s[3] += float(value)
    if open_s is not None:
        state.update(tuple(open_s))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(closed), dtype="int64"),
                "session_start": pd.to_datetime(
                    [c[0] for c in closed], unit="ns"
                ),
                "session_end": pd.to_datetime(
                    [c[1] for c in closed], unit="ns"
                ),
                "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
                "sum_value": pd.Series(
                    [round(c[3], 6) for c in closed], dtype="float64"
                ),
            }
        )


def _sessionizable(events: DataFrame) -> DataFrame:
    """Drop rows that cannot be sessionized — null user_id (no session
    owner) or null ts (no position in time). Applied identically to the
    stream and the batch twin. Without the guard a single null ts CRASHES
    the state fold (NaT -> int64 astype raises) and, because the
    checkpoint replays the same file, every restart dies too — the same
    failure class the KMV sketch had on null user_ids."""
    return events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )


def sessionize_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
) -> Any:
    """Start the sessionization query over an events parquet directory.

    Emits one row per CLOSED session (a later event arrived after the gap);
    per-user open-session state lives in the streaming state store under
    ``checkpoint_dir``, so a restarted query resumes mid-session. Returns
    the StreamingQuery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = _sessionizable(
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(watch_dir)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def sessionize_batch_twin(
    events: DataFrame, include_open: bool = False
) -> DataFrame:
    """Batch semantics the stream converges to: gap-sessionize with a lag
    window (new session where ts - lag(ts) > gap), aggregate per session.
    The stream never emits each user's final (still-open) session, so the
    twin drops it unless ``include_open``."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds (not a double epoch cast): the streaming
    # operator compares exact integer nanoseconds, and double rounding near
    # the gap boundary could flip the comparison for sub-second timestamps.
    # ts reads as TIMESTAMP_NTZ; the session timezone is pinned to UTC so
    # the NTZ->LTZ interpretation is deterministic (and the gap DIFFERENCE
    # is tz-invariant anyway).
    gap_us = F.lit(SESSION_GAP_S * 1_000_000)
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    events = _sessionizable(events)
    flagged = events.withColumn(
        "_new",
        (epoch_us - F.lag(epoch_us).over(w) > gap_us).cast("int"),
    ).withColumn(
        "_sess",
        F.sum(F.coalesce(F.col("_new"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sessions = flagged.groupBy("user_id", "_sess").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 6).alias("sum_value"),
    )
    if not include_open:
        last = sessions.groupBy("user_id").agg(F.max("_sess").alias("_last"))
        sessions = sessions.join(last, on="user_id").where(
            F.col("_sess") != F.col("_last")
        )
    return sessions.select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )
