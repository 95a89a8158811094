"""Custom stateful streaming operator: exact-dedup-on-arrival via
``applyInPandasWithState``.

The training-data use case: pages stream in from a crawl; downstream stages
must see each distinct document ONCE, first-arrival-wins, even when the
duplicate lands many micro-batches (hours) later. A windowed
``dropDuplicates`` + watermark can't express "forever" dedup; this is the
canonical arbitrary-stateful-processing shape — per-key state that outlives
any window (reference analog: the watcher's re-parse debounce in
``core/watcher.py:70-119`` never re-emits an unchanged file; here the "seen"
memory is explicit keyed state).

State design for 100 TB: one state row per distinct key (a 16-byte hash +
one long), hash-partitioned by the state store exactly like a shuffle on
``dedup_key`` — adding executors splits the keyspace; no broadcast, no
driver state. The first-seen row is emitted in append mode; later
occurrences update the count and emit nothing, so sink volume ∝ distinct
docs, not crawl volume.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .watch import PAGES_SCHEMA

_OUT_SCHEMA = "dedup_key string, url string, warc_ts timestamp"
_STATE_SCHEMA = "n_seen long"


def _first_seen_fn(
    key: Tuple[str], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the key's first-ever row (deterministic: min (warc_ts, url)
    within the batch); afterwards only bump the occurrence count in state."""
    seen = state.get[0] if state.exists else 0
    first = None
    n = 0
    for pdf in pdf_iter:
        n += len(pdf)
        if seen == 0 and len(pdf):
            cand = pdf.sort_values(["warc_ts", "url"]).iloc[[0]]
            if first is None or (
                (cand.iloc[0]["warc_ts"], cand.iloc[0]["url"])
                < (first.iloc[0]["warc_ts"], first.iloc[0]["url"])
            ):
                first = cand
    state.update((seen + n,))
    if seen == 0 and first is not None:
        yield pd.DataFrame(
            {
                "dedup_key": [key[0]],
                "url": [first.iloc[0]["url"]],
                "warc_ts": [first.iloc[0]["warc_ts"]],
            }
        )


def dedup_keyed(pages: DataFrame) -> DataFrame:
    """Attach the dedup key (content hash over the raw html bytes) — shared
    by the streaming operator and its batch twin."""
    return pages.withColumn("dedup_key", F.md5(F.col("html")))


def dedup_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
) -> Any:
    """First-seen-wins streaming dedup over a pages directory.

    Emits one parquet row per distinct html content, no matter how many
    micro-batches (or files) its duplicates arrive in; per-key state lives
    in the streaming state store under ``checkpoint_dir`` so a restarted
    query keeps its memory. Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(watch_dir)
    )
    deduped = (
        dedup_keyed(stream)
        .groupBy("dedup_key")
        .applyInPandasWithState(
            _first_seen_fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def dedup_batch_twin(pages: DataFrame) -> DataFrame:
    """Batch semantics the stream must converge to: for every distinct
    content hash, the min-(warc_ts, url) row over ALL input — used by tests
    to pin the streaming operator's final output. Equivalence holds when
    arrival order is warc_ts-monotone per key (true of a crawl feed, and of
    the test corpus); under out-of-order arrival the stream keeps its
    FIRST-arrival winner by design (state is never rewritten)."""
    from pyspark.sql import Window

    w = Window.partitionBy("dedup_key").orderBy("warc_ts", "url")
    return (
        dedup_keyed(pages)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("dedup_key", "url", "warc_ts")
    )


def dedup_stream_wm(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "10 minutes",
    once: bool = True,
    processing_time: str = "2 seconds",
) -> Any:
    """Watermark-BOUNDED streaming dedup via the native
    ``dropDuplicatesWithinWatermark`` — the bounded-state complement of
    ``dedup_stream``'s forever-state custom operator.

    Use when duplicates only arrive within a bounded lateness horizon (a
    crawl frontier's re-fetch window): per-key state is EVICTED once the
    watermark passes the key's event time plus ``delay``, so state size is
    proportional to keys-per-window, not total-distinct-keys-ever — the
    difference between a state store that grows forever and one that
    plateaus on an unbounded 100 TB crawl. Entirely JVM-native (no Python
    in the streaming path); exactly-once via the same checkpoint contract
    as the custom operator. First arrival within the horizon wins; a
    duplicate arriving AFTER eviction re-emits — that is the documented
    trade for bounded state (dedup_stream keeps forever-memory when that
    matters more than the bound)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(watch_dir)
    )
    deduped = (
        dedup_keyed(stream)
        .withWatermark("warc_ts", delay)
        .dropDuplicatesWithinWatermark(["dedup_key"])
        .select("dedup_key", "url", "warc_ts")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
