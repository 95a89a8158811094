"""Watermarked windowed aggregation over a stream of events.

The late-data story the task needs at 100 TB: event files land continuously;
daily (or hourly) rollups must be emitted exactly once per window, tolerate
stragglers up to a bounded lateness, and DROP anything later than that bound
instead of holding window state forever. ``withWatermark`` + ``window()`` +
append mode is the canonical Spark shape: state per open window only, evicted
(and emitted) when the watermark passes the window end, so state size is
O(windows in flight), independent of stream length.

Scale notes: the aggregation is keyed on (window, event_type) — a plain
shuffle key, partial-aggregated map-side like any batch groupBy; the
watermark is tracked per-partition and combined on the driver (a scalar, not
data). Nothing here is per-key-unbounded; contrast with
``stateful.dedup_stream`` where unbounded per-key memory is the point.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts(
    events: DataFrame,
    watermark: str,
    window: str,
    slide: str | None = None,
) -> DataFrame:
    """The aggregation shared by the stream and its batch twin: per
    (time-window, event_type) counts and value sums. With ``slide`` the
    windows HOP (each event lands in window/slide overlapping windows —
    the burst-across-a-boundary view; the batch oracle twin is
    ``events_hopping_counts``); without, they tumble. Watermark eviction
    is identical either way: state per OPEN window, emitted when the
    watermark passes its end — a hop ratio of k holds k windows open per
    key instead of 1, still O(windows in flight)."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_windowed_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    window: str = "1 day",
    slide: str | None = None,
    once: bool = True,
    processing_time: str = "2 seconds",
) -> Any:
    """Stream event files into finalized per-window rollups.

    Append mode: a (window, event_type) row reaches the sink exactly once,
    after the watermark passes the window end; events arriving more than
    ``watermark`` late are dropped. The watermark survives query restarts
    via the checkpoint, so lateness is enforced across runs, not just
    within one.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(watch_dir)
    )
    agg = windowed_counts(stream, watermark, window, slide)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
