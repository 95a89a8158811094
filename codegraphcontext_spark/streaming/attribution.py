"""Streaming last-touch attribution: per-user last-channel keyed state.

The batch side (``queries/driver_queries.py`` ``events_attribution``,
last-touch leg) defines the contract: each purchase is credited to the
user's immediately-preceding non-purchase event in (ts, event_id) order.
The streaming leg keeps exactly ONE row of state per user — the last
non-purchase event seen (its channel, plus the (ns, event_id) order key) —
and on each micro-batch sorts the batch's rows into the shared total
order, walks them with the remembered channel as the running prefix, emits
one credit row per purchase, and remembers the new last channel.
Aggregating the emitted credits (groupBy channel + count) therefore
reproduces the batch twin's per-channel last-touch counts EXACTLY as long
as micro-batches arrive per-user time-ordered (the file-stream contract
the sessionizer and transitions modules document; a late row would need a
watermark + re-sort buffer, the standard trade).

State is one (ns, event_id, channel) triple per user forever — bounded
regardless of stream length. Null user_ids and null timestamps are dropped
in ``attr_keyed`` before BOTH the state fold and the batch twin (the
applyInPandasWithState null-poison class: a NaN key or NaT ts crashes the
fold and the checkpoint replays the poison file forever).

Reference analog: none (CodeGraphContext has no event streams); task
addendum's streaming family, conversion-analytics leg.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import EVENTS_SCHEMA

__all__ = ["attr_keyed", "attr_stream", "attr_batch_twin"]

_CONV = "purchase"
_OUT_SCHEMA = "user_id long, channel string"
_STATE_SCHEMA = "last_ns long, last_eid long, last_ch string"


def attr_keyed(events: DataFrame) -> DataFrame:
    """Shared guard: drop null keys/timestamps so stream and twin agree."""
    return events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )


def _attr_fn(
    key: Tuple[int], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Sort this batch into the (ts, event_id) total order, walk it with
    the remembered last channel, credit each purchase, remember the new
    last channel."""
    rows = [pdf for pdf in pdf_iter if len(pdf)]
    if not rows:
        yield pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "channel": pd.Series(dtype="object")}
        )
        return
    batch = pd.concat(rows, ignore_index=True)
    batch["_ns"] = batch["ts"].astype("int64")
    batch = batch.sort_values(["_ns", "event_id"], kind="mergesort")
    if state.exists:
        last_ns, last_eid, last_ch = state.get
    else:
        last_ns, last_eid, last_ch = -1, -1, None
    credits = []
    for _, r in batch.iterrows():
        et = r["event_type"]
        if et == _CONV:
            if last_ch is not None:
                credits.append(last_ch)
        else:
            last_ns = int(r["_ns"])
            last_eid = int(r["event_id"])
            last_ch = str(et)
    if last_ch is not None:
        state.update((last_ns, last_eid, last_ch))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([key[0]] * len(credits), dtype="int64"),
            "channel": pd.Series(credits, dtype="object"),
        }
    )


def attr_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
    max_files_per_trigger: int | None = None,
) -> Any:
    """Per-purchase last-touch credit rows over a streaming events
    directory. Returns the StreamingQuery; emitted credits aggregate to
    the batch twin's per-channel counts."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(watch_dir)
    credits = (
        attr_keyed(stream)
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _attr_fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        credits.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def attr_batch_twin(events: DataFrame) -> DataFrame:
    """Exact last-touch credit rows over ALL input in one batch — what the
    stream's emitted credits must aggregate to."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nonp = F.when(F.col("event_type") != _CONV, F.col("event_type"))
    return (
        attr_keyed(events)
        .select(
            "user_id",
            "event_type",
            F.last(nonp, ignorenulls=True).over(w).alias("channel"),
        )
        .where(
            (F.col("event_type") == _CONV) & F.col("channel").isNotNull()
        )
        .select("user_id", "channel")
    )
