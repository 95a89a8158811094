"""Streaming heavy hitters: bucketed Misra-Gries frequency state.

The batch side (``queries/driver_queries.py`` ``events_heavy_hitters``)
establishes the sketch contract: a Misra-Gries summary with k counters
undercounts any item by at most n/(k+1), so every item with true count
> n/(k+1) keeps a positive residual — the candidate-completeness bound the
exact verify pass relies on. The streaming leg keeps one MG summary per
user-id BUCKET (``pmod(user_id, N)``) as keyed streaming state: each
micro-batch's per-bucket value counts merge into the state by counter
addition, then the summary is pruned back to k counters by subtracting the
(k+1)-th largest count (the mergeable-summaries reduce, Agarwal et al.
2012). Because every occurrence of a user lands in exactly ONE bucket, the
bound tightens to n_bucket/(k+1) per user — bucketing both shards the state
across executors AND sharpens the guarantee.

State per bucket is <= k (user, count) pairs forever, regardless of stream
length or cardinality. Each batch emits the bucket's current summary rows
stamped with the cumulative bucket row count ``n_seen``; the latest rows
per bucket (max n_seen) are the current candidate set, whose residual
counts lower-bound true counts by the MG bound. When a bucket has seen at
most k distinct users the summary is exact (no prune ever fires), which is
the regime the stream==batch equality test pins; above k, the completeness
and residual bounds are pinned instead.

Reference analog: none (CodeGraphContext counts exactly); task addendum's
sketch family, frequency leg. Null user_ids are dropped in ``hh_keyed`` —
before BOTH the state fold and the batch twin — the applyInPandasWithState
null-poison class (a NaN key crashes the fold and the checkpoint replays
the poison file forever).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import EVENTS_SCHEMA

__all__ = [
    "HH_STREAM_K",
    "HH_N_BUCKETS",
    "hh_keyed",
    "hh_stream",
    "hh_batch_twin",
]

HH_STREAM_K = 64  # MG counters per bucket
HH_N_BUCKETS = 16

_OUT_SCHEMA = "bucket int, user_id long, cnt_lo long, n_seen long"
_STATE_SCHEMA = "users array<long>, cnts array<long>, n_seen long"


def hh_keyed(events: DataFrame) -> DataFrame:
    """Attach the bucket key (shared by stream and batch twin); drop null
    user_ids here so both consumers see identical rows."""
    return (
        events.where(F.col("user_id").isNotNull())
        .withColumn("bucket", F.pmod("user_id", F.lit(HH_N_BUCKETS)).cast("int"))
    )


def _mg_merge(summary: pd.Series, vc: pd.Series) -> pd.Series:
    """Mergeable-summaries reduce: counter addition, then prune to
    HH_STREAM_K by subtracting the (k+1)-th largest count."""
    summary = summary.add(vc, fill_value=0)
    if len(summary) > HH_STREAM_K:
        cut = summary.nlargest(HH_STREAM_K + 1).iloc[-1]
        summary = summary - cut
        summary = summary[summary > 0]
    return summary


def _hh_fn(
    key: Tuple[int], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's per-user counts into the bucket's MG state and emit
    the updated summary. The state after any prefix of batches equals the
    direct MG sketch of that prefix, so the per-bucket undercount bound
    n_seen/(k+1) holds across micro-batches and restarts."""
    if state.exists:
        users, cnts, n_seen = state.get
        summary = pd.Series(cnts, index=users, dtype="int64")
    else:
        summary, n_seen = pd.Series(dtype="int64"), 0
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        n_seen += len(pdf)
        summary = _mg_merge(summary, pdf["user_id"].value_counts())
    summary = summary.astype("int64")
    state.update((summary.index.astype("int64").tolist(),
                  summary.tolist(), n_seen))
    yield pd.DataFrame(
        {
            "bucket": key[0],
            "user_id": summary.index.astype("int64"),
            "cnt_lo": summary.to_numpy(dtype="int64"),
            "n_seen": n_seen,
        }
    )


def hh_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
    max_files_per_trigger: int | None = None,
) -> Any:
    """Bucketed MG heavy-hitter sketch over a streaming events directory.
    Emits the current per-bucket summary each batch; the rows at each
    bucket's max ``n_seen`` are the live candidate set (counts are lower
    bounds, exact while a bucket's distinct users <= k). Returns the
    StreamingQuery."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(watch_dir)
    sketched = (
        hh_keyed(stream)
        .select("bucket", "user_id")
        .groupBy("bucket")
        .applyInPandasWithState(
            _hh_fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        sketched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def hh_batch_twin(events: DataFrame) -> DataFrame:
    """Exact per-bucket user counts over ALL input — what the stream's
    final summary must equal whenever a bucket's distinct users <= k, and
    the ground truth its residuals must lower-bound (within
    n_bucket/(k+1)) otherwise."""
    return (
        hh_keyed(events)
        .groupBy("bucket", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
