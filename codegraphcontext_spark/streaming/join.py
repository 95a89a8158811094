"""Stream-stream interval join — Spark's NATIVE watermarked join, the one
stateful streaming shape the engine didn't yet exercise (dedup/sessionize/
as-of use ``applyInPandasWithState``; enrich is stream-static). Two live
streams — errors and clicks — join on user with a 5-minute event-time
interval: every (error, click-by-same-user-within-5-min-after) pair is
emitted as soon as both sides have arrived, across micro-batch boundaries.

Scale shape: no Python in the path at all — the join runs in the JVM's
symmetric-hash-join state store, hash-partitioned on user_id, and the time
bounds are expressed DIRECTLY on the two event-time columns
(``clk_ts >= err_ts AND clk_ts < err_ts + interval``) so Spark derives the
state-eviction condition from the watermarks: an error row leaves state
once the click watermark passes err_ts + 5 min, a click row once the error
watermark passes clk_ts — state is bounded by in-flight window volume, not
stream history. Wrapping the bound in arithmetic (unix_micros etc.) would
defeat that inference and grow state forever; that trap is why the bound
below is written on the raw timestamp columns.

Batch/stream duality: ``range_join_batch_twin`` runs the IDENTICAL
transformation (same function, watermarks skipped) over the union of all
streamed files; tests pin row-set equality. The pair-level output is the
row-expansion of the batch ``events_range_join`` count query
(driver_queries.py) — grouping these pairs by error reproduces its
n_clicks_5min for every error with at least one match.

Reference analog: none (single-process watcher, reference server.py watches
files serially); SURVEY §2.6 W1-W5 streaming family extension.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from .windowed import EVENTS_SCHEMA

W_US = 300_000_000  # 5-minute match window, microseconds (= events_range_join)
_WATERMARK = "10 minutes"  # late-data allowance on BOTH streams


def clicks_after_errors(
    err_events: DataFrame, clk_events: DataFrame, streaming: bool
) -> DataFrame:
    """(error, click) pairs where the same user's click lands in the
    5 minutes at-or-after the error. One code path for stream and batch:
    only the watermark declarations differ."""
    err = err_events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    clk = clk_events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("clk_user"),
        F.col("ts").alias("clk_ts"),
    )
    if streaming:
        err = err.withWatermark("err_ts", _WATERMARK)
        clk = clk.withWatermark("clk_ts", _WATERMARK)
    # time bound on the RAW event-time columns — see module docstring
    cond = F.expr(
        "err_user = clk_user AND clk_ts >= err_ts "
        f"AND clk_ts < err_ts + interval {W_US // 60_000_000} minutes"
    )
    return err.join(clk, cond, "inner").select(
        "error_id",
        "click_id",
        F.col("err_user").alias("user_id"),
        (F.unix_micros("clk_ts") - F.unix_micros("err_ts")).alias("gap_us"),
    )


def range_join_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
) -> Any:
    """Join the error and click streams over watch_dir into parquet pairs.

    Two independent readStream instances over the same directory (each
    tracks its own file offsets in the checkpoint) — the standard shape for
    a self-join of one physical stream."""
    err_src = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(watch_dir)
    )
    clk_src = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(watch_dir)
    )
    writer = (
        clicks_after_errors(err_src, clk_src, streaming=True)
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


def range_join_batch_twin(spark: SparkSession, events_path: str) -> DataFrame:
    """The same pair join over the union of all streamed files, batch-mode."""
    ev = spark.read.parquet(events_path)
    return clicks_after_errors(ev, ev, streaming=False)
