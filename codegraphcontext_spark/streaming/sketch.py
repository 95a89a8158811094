"""Streaming KMV distinct-count: the mergeable cardinality sketch as keyed
streaming state.

The batch side (``queries/driver_queries.py`` ``events_distinct_kmv`` /
``events_kmv_daily``) establishes the sketch contract: per key, keep the K
smallest distinct 48-bit md5-prefix hashes; estimate |distinct| as
(K-1)·2^48 // h_K, exact below K. Its merge rule — K-minima of a union equal
K-minima of the union of per-part K-minima — is exactly what an unbounded
stream needs: each micro-batch folds its hashes into the per-key state and
the state NEVER grows past K longs, no matter how many billions of events
stream through. That bounded-state property is the whole point: an exact
streaming distinct-count needs state ∝ distinct users (the stateful-dedup
operator's cost, right for dedup, wrong for a dashboard metric); the sketch
answers the same question in K·8 bytes per key with a ~1/sqrt(K) error.

State lives in the streaming state store hash-partitioned by key (scales
with executors, survives restarts via the checkpoint); each batch emits the
key's CURRENT estimate in append mode, stamped with the cumulative row count
``n_seen`` so the latest row per key (max n_seen) is the final answer.

Reference analog: none (CodeGraphContext counts exactly); task addendum's
sketch family, streaming leg. Hash rule and constants are imported from the
batch queries so stream and batch can never drift.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.driver_queries import _KMV_K as KMV_K
from ..queries.driver_queries import _KMV_SPACE as KMV_SPACE
from .windowed import EVENTS_SCHEMA

__all__ = [
    "KMV_K",
    "KMV_SPACE",
    "kmv_keyed",
    "kmv_stream",
    "kmv_estimate",
    "CMS_D",
    "CMS_W",
    "cms_keyed",
    "cms_stream",
    "cms_batch_twin",
    "cms_estimate",
]

_OUT_SCHEMA = "event_type string, n_seen long, n_kept long, est_distinct long"
_STATE_SCHEMA = "hs array<long>, n_seen long"

# the ONE hash rule, shared verbatim with events_distinct_kmv's Spark and
# DuckDB sides: 48-bit prefix of md5 of the decimal user id
_HASH_EXPR = (
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
)


def kmv_keyed(events: DataFrame) -> DataFrame:
    """Attach the sketch hash column (shared by stream and batch twin).

    Null user_ids hash to NULL; they are dropped HERE — before either
    consumer — so the streaming state fold (which would crash converting
    NaN to int64 in ``_kmv_fn`` and then re-crash on every checkpoint
    replay of the same file) and the batch twin see identical rows. A null
    id carries no distinct-count information either way."""
    return (
        events.withColumn("h", F.expr(_HASH_EXPR))
        .where(F.col("h").isNotNull())
    )


def kmv_estimate(n_kept: int, h_k: int) -> int:
    """The estimate rule, identical to the batch queries: exact below K
    (the kept set IS the distinct set), else (K-1)·2^48 // h_K."""
    if n_kept < KMV_K:
        return n_kept
    return (KMV_K - 1) * KMV_SPACE // h_k


def _kmv_fn(
    key: Tuple[str], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's hashes into the K-minima state and emit the key's
    updated estimate. Union + re-take-K is the sketch's merge operation, so
    the state after any prefix of batches equals the direct sketch of that
    prefix — stream == batch by construction."""
    if state.exists:
        hs, n_seen = state.get
        hs = np.asarray(hs, dtype=np.int64)
    else:
        hs, n_seen = np.empty(0, dtype=np.int64), 0
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        n_seen += len(pdf)
        merged = np.union1d(hs, pdf["h"].to_numpy(dtype=np.int64))
        hs = merged[:KMV_K]  # union1d returns sorted distinct values
    state.update((hs.tolist(), n_seen))
    n_kept = len(hs)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n_seen],
            "n_kept": [n_kept],
            "est_distinct": [kmv_estimate(n_kept, int(hs[-1]) if n_kept else 0)],
        }
    )


def kmv_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
    max_files_per_trigger: int | None = None,
) -> Any:
    """Per-event-type distinct-user KMV sketch over a streaming events
    directory. Emits one row per (key, batch) with the cumulative estimate;
    the latest row per key (max ``n_seen``) is the current answer. State is
    ≤ K longs per key forever. Returns the StreamingQuery."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(watch_dir)
    sketched = (
        kmv_keyed(stream)
        .groupBy("event_type")
        .applyInPandasWithState(
            _kmv_fn,
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


def kmv_batch_twin(events: DataFrame) -> DataFrame:
    """The batch sketch the stream's final rows must equal: per key, the K
    smallest distinct hashes over ALL input, same estimate rule."""
    from pyspark.sql.window import Window

    hh = kmv_keyed(events).select("event_type", "h").distinct()
    r = hh.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.asc("h"))
        ),
    ).withColumn(
        "nd", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    agg = r.groupBy("event_type").agg(
        F.max("nd").alias("nd"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("hk"),
    )
    est = F.when(F.col("nd") < KMV_K, F.col("nd")).otherwise(
        F.expr(f"({KMV_K - 1} * CAST({KMV_SPACE} AS BIGINT)) DIV hk")
    )
    return agg.select(
        "event_type",
        F.least(F.col("nd"), F.lit(KMV_K)).cast("long").alias("n_kept"),
        est.cast("long").alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Streaming Count-Min Sketch (the frequency leg; batch contract in
# queries/driver_queries.py events_cms_topk)
# ---------------------------------------------------------------------------

from ..queries.driver_queries import _CMS_D as CMS_D      # noqa: E402
from ..queries.driver_queries import _CMS_W as CMS_W      # noqa: E402
from ..queries.driver_queries import _cms_cell_expr       # noqa: E402

_CMS_OUT_SCHEMA = "d long, n_seen long, cells array<long>"
_CMS_STATE_SCHEMA = "cells array<long>, n_seen long"


def cms_keyed(events: DataFrame) -> DataFrame:
    """One row per (event, hash-row d) carrying the bucket index — the
    shared pre-grouping transform for the stream fold and the batch twin.
    Null user_ids are dropped HERE, before either consumer (the
    applyInPandasWithState null-poison class: a NaN bucket would crash the
    state fold and the checkpoint would replay the poison file forever)."""
    cell_structs = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                F.expr(_cms_cell_expr(d, "user_id")).alias("cell"),
            )
            for d in range(CMS_D)
        ]
    )
    return (
        events.where(F.col("user_id").isNotNull())
        .select(F.explode(cell_structs).alias("x"))
        .select(F.col("x.d").alias("d"), F.col("x.cell").alias("cell"))
    )


def _cms_fn(
    key: Tuple[int], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's bucket hits into the hash-row's W-counter state.
    Counter addition is associative and commutative, so the state after
    any prefix of micro-batches equals the direct grid of that prefix —
    stream == batch by construction, and the state is W longs FOREVER
    (the whole point of a CMS over an exact per-key count)."""
    if state.exists:
        cells_list, n_seen = state.get
        cells = np.asarray(cells_list, dtype=np.int64)
    else:
        cells, n_seen = np.zeros(CMS_W, dtype=np.int64), 0
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        n_seen += len(pdf)
        cells += np.bincount(
            pdf["cell"].to_numpy(dtype=np.int64), minlength=CMS_W
        )
    state.update((cells.tolist(), n_seen))
    yield pd.DataFrame(
        {"d": [key[0]], "n_seen": [n_seen], "cells": [cells.tolist()]}
    )


def cms_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
    max_files_per_trigger: int | None = None,
) -> Any:
    """Streaming CMS over an events directory: CMS_D keyed state rows (one
    per hash row), each exactly CMS_W longs, updated per micro-batch and
    emitted append-mode with a cumulative ``n_seen`` stamp — the latest
    row per d (max n_seen) is the current grid. At cluster scale the D
    state rows hash-partition across executors and each micro-batch's
    map-side explode is the only per-row work. Returns the
    StreamingQuery."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(watch_dir)
    sketched = cms_keyed(stream).groupBy("d").applyInPandasWithState(
        _cms_fn,
        _CMS_OUT_SCHEMA,
        _CMS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
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


def cms_batch_twin(events: DataFrame) -> DataFrame:
    """The batch grid the stream's final rows must equal: (d, cells) with
    cells[j] = number of (event, d) pairs hashing to bucket j — assembled
    from the same map-side-combinable (d, cell) count the batch query
    events_cms_topk builds."""
    counts = cms_keyed(events).groupBy("d", "cell").agg(
        F.count(F.lit(1)).alias("n")
    )
    dense = counts.groupBy("d").agg(
        F.map_from_arrays(
            F.collect_list("cell"), F.collect_list("n")
        ).alias("m")
    )
    idx = F.array(*[F.lit(j).cast("long") for j in range(CMS_W)])
    return dense.select(
        "d",
        F.transform(
            idx,
            lambda j: F.coalesce(
                F.element_at(F.col("m"), j), F.lit(0).cast("long")
            ),
        ).alias("cells"),
    )


def cms_estimate(grids: dict, user_id: int) -> int:
    """Point-frequency estimate from {d: cells} grids: min over hash rows
    of the key's bucket counter — the same rule as events_cms_topk."""
    import hashlib

    est = None
    for d in range(CMS_D):
        h = int(
            hashlib.md5(f"{d}:{user_id}".encode()).hexdigest()[:12], 16
        ) % CMS_W
        v = grids[d][h]
        est = v if est is None else min(est, v)
    return int(est)
