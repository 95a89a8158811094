"""Streaming event-type transitions: per-user last-event keyed state.

The batch side (``queries/driver_queries.py`` ``events_markov_transitions``)
defines the contract: consecutive (from_type -> to_type) pairs per user in
(ts, event_id) order. The streaming leg keeps exactly ONE row of state per
user — the last event seen — and on each micro-batch sorts the batch's rows
into the shared total order, prepends the remembered last event, and emits
every consecutive pair. Aggregating the emitted pairs (groupBy + count)
therefore reproduces the batch twin's pair frame EXACTLY as long as
micro-batches arrive per-user time-ordered (the file-stream contract the
sessionizer also documents; a late row would need a watermark + re-sort
buffer, the standard trade).

State is one (ts, event_id, event_type) triple per user forever — bounded
regardless of stream length. Null user_ids and null timestamps are dropped
in ``trans_keyed`` before BOTH the state fold and the batch twin (the
applyInPandasWithState null-poison class: a NaN key or NaT ts crashes the
fold and the checkpoint replays the poison file forever).

Reference analog: none (CodeGraphContext has no event streams); task
addendum's streaming family, behavioral-model leg.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import EVENTS_SCHEMA

__all__ = ["trans_keyed", "trans_stream", "trans_batch_twin"]

_OUT_SCHEMA = "user_id long, from_type string, to_type string"
_STATE_SCHEMA = "last_ns long, last_eid long, last_type string"


def trans_keyed(events: DataFrame) -> DataFrame:
    """Shared guard: drop null keys/timestamps so stream and twin agree."""
    return events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )


def _trans_fn(
    key: Tuple[int], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Sort this batch into the (ts, event_id) total order, prepend the
    remembered last event, emit consecutive type pairs, remember the new
    last event."""
    rows = [pdf for pdf in pdf_iter if len(pdf)]
    if not rows:
        # iterator contract: still must yield the (empty) frame shape
        yield pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "from_type": pd.Series(dtype="object"),
             "to_type": pd.Series(dtype="object")}
        )
        return
    batch = pd.concat(rows, ignore_index=True)
    batch["_ns"] = batch["ts"].astype("int64")
    batch = batch.sort_values(["_ns", "event_id"], kind="mergesort")
    types = batch["event_type"].tolist()
    if state.exists:
        _, _, last_type = state.get
        froms = [last_type] + types[:-1]
        tos = types
    else:
        froms = types[:-1]
        tos = types[1:]
    last = batch.iloc[-1]
    state.update((int(last["_ns"]), int(last["event_id"]),
                  str(last["event_type"])))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([key[0]] * len(tos), dtype="int64"),
            "from_type": pd.Series(froms, dtype="object"),
            "to_type": pd.Series(tos, dtype="object"),
        }
    )


def trans_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
    max_files_per_trigger: int | None = None,
) -> Any:
    """Per-user transition pairs over a streaming events directory.
    Returns the StreamingQuery; emitted pairs aggregate to the batch
    twin's transition matrix."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(watch_dir)
    pairs = (
        trans_keyed(stream)
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _trans_fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def trans_batch_twin(events: DataFrame) -> DataFrame:
    """Exact consecutive pairs over ALL input in one batch — what the
    stream's emitted pairs must aggregate to."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        trans_keyed(events)
        .select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
