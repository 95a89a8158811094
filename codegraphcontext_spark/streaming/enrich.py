"""Stream-static enrichment join: a micro-batch event stream joined against
a slowly-changing dimension table (user profiles, domain reputation, model
routing tables — the lookup every production event pipeline does on the way
in).

The canonical Spark shape: the STATIC side is a plain DataFrame; Spark
re-plans the join for every micro-batch, so the dimension is re-read each
batch (picking up slow changes without restarts) and — the scale property —
the planner broadcasts it when small, which keeps the stream side entirely
shuffle-free: enrichment adds ZERO exchanges to the streaming stage. At
100 TB of daily events and a million-row dimension this is the difference
between a narrow map and re-shuffling the firehose every batch.

Left join keeps events whose key is missing from the dimension (late
profile creation) flowing, flagged rather than dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .windowed import EVENTS_SCHEMA

__all__ = ["EVENTS_SCHEMA", "enrich_events"]


def enrich_events(
    events: DataFrame,
    dims: DataFrame,
    n_salts: int | None = None,
) -> DataFrame:
    """Join a (possibly streaming) events frame against the static user
    dimension ``(user_id, segment, weight)``; unmatched users are kept with
    segment 'unknown' and weight 0 so downstream aggregates stay total.

    Default: broadcast the dimension — the right call while it fits in
    executor memory, and the only way to keep the streaming stage
    exchange-free. When the dimension outgrows broadcast (a web-scale user
    table) the join must shuffle, and a whale user then funnels every
    micro-batch through one partition with no AQE to split it (AQE never
    re-plans streaming stages): pass ``n_salts`` to switch to the
    deterministic salted shuffle join (``functions/skew.py``), which is
    row-identical and spreads each hot key over ``n_salts`` partitions."""
    d = dims.select("user_id", "segment", "weight")
    if n_salts:
        from ..functions.skew import salted_join

        joined = salted_join(
            events, d, "user_id", spread_cols=["event_id"],
            n_salts=n_salts, how="left",
        )
    else:
        joined = events.join(F.broadcast(d), on="user_id", how="left")
    out = (
        joined
        .withColumn("segment", F.coalesce("segment", F.lit("unknown")))
        .withColumn("weight", F.coalesce("weight", F.lit(0)))
        .withColumn(
            "weighted_value", F.round(F.col("value") * F.col("weight"), 6)
        )
    )
    # The salted path's USING-style join hoists user_id to column 0 while the
    # broadcast path preserves the events layout; pin ONE column order so
    # positional consumers and fixed-schema parquet sinks see the same layout
    # regardless of n_salts.
    cols = [c for c in events.columns if c != "user_id"]
    return out.select(
        "user_id", *cols, "segment", "weight", "weighted_value"
    )


def events_enriched_stream(
    spark,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    dims: DataFrame,
    once: bool = True,
    processing_time: str = "2 seconds",
):
    """Stream event files through the dimension join into enriched parquet.

    Append mode, no aggregation: each event lands exactly once (file-source
    progress is checkpointed), already carrying its segment and weighted
    value. The static side is re-planned per micro-batch, so replacing the
    dimension parquet between batches is picked up without a restart."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(watch_dir)
    )
    enriched = enrich_events(stream, dims)
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
