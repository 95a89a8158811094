"""Streaming as-of join via ``applyInPandasWithState``: each error event is
matched on arrival to the SAME user's most recent prior click — the
streaming twin of the batch ``events_asof_join`` query (union + running
`last(ignorenulls)` window). Keyed state carries exactly one (last_click_id,
last_click_us) pair per user, so a click in one micro-batch matches errors
that arrive hours of batches later — a window join cannot express that
"forever" lookback.

State design for 100 TB: one fixed-width state row per ACTIVE user,
hash-partitioned by the state store like a shuffle on user_id; adding
executors splits the keyspace. Sink volume ∝ error events.

Ordering contract: event time is assumed non-decreasing across micro-batches
per user (true for log-shipped event files; an out-of-order stream needs a
watermark-buffered reorder stage in front, which is a different operator).
Within a batch, rows are explicitly time-sorted before the state walk.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import EVENTS_SCHEMA

ASOF_OUT_SCHEMA = "event_id long, user_id long, prior_click_id long, gap_us long"
_STATE_SCHEMA = "last_click_id long, last_click_us long"


def _asof_fn(
    key: Tuple[int], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_id, last_us = state.get if state.exists else (-1, -1)
    out: list[tuple[int, int, int, int]] = []
    user = key[0]
    batch = pd.concat(list(pdf_iter), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"])
    for r in batch.itertuples():
        us = r.ts.value // 1_000  # pandas ns -> integer micros, exact
        if r.event_type == "click":
            last_id, last_us = int(r.event_id), int(us)
        elif r.event_type == "error":
            gap = us - last_us if last_id >= 0 else -1
            out.append((int(r.event_id), user, last_id, int(gap)))
    state.update((last_id, last_us))
    if out:
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "prior_click_id", "gap_us"]
        )


def asof_enrich(events: DataFrame) -> DataFrame:
    """The stateful mapping shared by stream and (single-batch) batch use."""
    return (
        events.where(events.event_type.isin("error", "click"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _asof_fn,
            outputStructType=ASOF_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def asof_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
) -> Any:
    """Stream event files through the stateful as-of match into parquet."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(watch_dir)
    )
    writer = (
        asof_enrich(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
