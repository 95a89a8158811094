"""Streaming CUSUM level-shift monitor: per-type keyed daily state.

The batch side (``queries/driver_queries.py`` ``events_cusum``) defines the
target statistic: S_k = sum over observed days <= k of (c_i*D - T), with D
the number of observed days and T the total count — both GLOBAL properties
of the history, which a true streaming fold cannot know in advance. The
standard streaming CUSUM therefore tracks the ONLINE form against a FIXED
reference rate mu (events/day, chosen from history or SLO):

    S_k = max(0, S_{k-1} + (c_k - mu))        (one-sided, upward shifts)
    alarm when S_k >= h

State per event type is three numbers (last complete day, its running S,
the alarm flag) — bounded forever. Each micro-batch folds its COMPLETE
days into the state in day order; the current (possibly still-open) day is
buffered as a count only, so a day is only committed once a later day
arrives (the same close-on-advance discipline as the sessionizer's gap
rule). Emitted rows are one per committed day per type: (event_type, day,
c, s, alarm). Aggregating emissions over any prefix of days equals the
batch twin ``cusum_batch_twin`` run over the same prefix — stream == batch
by construction, as long as files arrive day-ordered (the file-stream
contract the other stateful modules document).

Null user_ids/timestamps are dropped in ``cusum_keyed`` before BOTH the
fold and the twin (the applyInPandasWithState null-poison class).

Reference analog: none (CodeGraphContext has no event streams); task
addendum's streaming family, monitoring leg (pairs with the batch
events_cusum / events_anomaly).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import EVENTS_SCHEMA

__all__ = ["cusum_keyed", "cusum_stream", "cusum_batch_twin", "CUSUM_MU"]

CUSUM_MU = 10  # reference rate (events/day) the drift accumulates against

_OUT_SCHEMA = "event_type string, day_n long, c long, s long, alarm int"
_STATE_SCHEMA = "open_day long, open_c long, s long"
_DAY_US = 86_400_000_000


def cusum_keyed(events: DataFrame) -> DataFrame:
    """Shared guard: drop null keys/timestamps so stream and twin agree."""
    return events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )


def _cusum_fn(
    key: Tuple[str], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's per-day counts into the keyed CUSUM state.

    The newest day stays OPEN (buffered count, nothing emitted); every
    older day commits in order: S += (c - mu) clamped at 0, one output
    row per committed day."""
    rows = [pdf for pdf in pdf_iter if len(pdf)]
    if not rows:
        yield pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "day_n": pd.Series(dtype="int64"),
                "c": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
                "alarm": pd.Series(dtype="int32"),
            }
        )
        return
    batch = pd.concat(rows, ignore_index=True)
    batch["day_n"] = batch["ts"].astype("int64") // (_DAY_US * 1000)
    counts = batch.groupby("day_n").size().sort_index()
    if state.exists:
        open_day, open_c, s = state.get
    else:
        open_day, open_c, s = -1, 0, 0
    # merge the buffered open day with this batch's counts
    day_counts = dict(counts)
    if open_day >= 0:
        day_counts[open_day] = day_counts.get(open_day, 0) + open_c
    days = sorted(day_counts)
    out_day, out_c, out_s, out_alarm = [], [], [], []
    # commit every day except the newest (it may still grow)
    for d in days[:-1]:
        c = int(day_counts[d])
        s = max(0, s + (c - CUSUM_MU))
        out_day.append(d)
        out_c.append(c)
        out_s.append(s)
        out_alarm.append(1 if s >= 3 * CUSUM_MU else 0)
    newest = days[-1]
    state.update((int(newest), int(day_counts[newest]), int(s)))
    yield pd.DataFrame(
        {
            "event_type": pd.Series([key[0]] * len(out_day), dtype="object"),
            "day_n": pd.Series(out_day, dtype="int64"),
            "c": pd.Series(out_c, dtype="int64"),
            "s": pd.Series(out_s, dtype="int64"),
            "alarm": pd.Series(out_alarm, dtype="int32"),
        }
    )


def cusum_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    processing_time: str = "2 seconds",
    max_files_per_trigger: int | None = None,
) -> Any:
    """Per-type committed-day CUSUM rows over a streaming events
    directory. Returns the StreamingQuery; emissions over any day prefix
    equal ``cusum_batch_twin`` on the same prefix."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(watch_dir)
    out = (
        cusum_keyed(stream)
        .select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _cusum_fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def cusum_batch_twin(events: DataFrame, through_day: int) -> DataFrame:
    """The exact committed-day CUSUM over ALL input in one batch, for days
    <= ``through_day`` (the stream never commits its newest day, so the
    twin must be cut at the same horizon)."""
    from pyspark.sql.window import Window

    d = (
        cusum_keyed(events)
        .select(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
            ).alias("day_n"),
        )
        .where(F.col("day_n") <= through_day)
        .groupBy("event_type", "day_n")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # the clamped recursion is order-sequential: fold per type via an
    # array aggregate (types are few; each day list is small) — the twin
    # is a TEST oracle, not a production path
    w = Window.partitionBy("event_type").orderBy("day_n")
    rows = d.withColumn("rn", F.row_number().over(w))
    agg = rows.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct("day_n", "c"))
        ).alias("days")
    )
    folded = agg.select(
        "event_type",
        F.explode(
            F.expr(
                f"""
                aggregate(
                  days,
                  struct(CAST(0 AS BIGINT) AS s,
                         CAST(array() AS array<struct<day_n: bigint,
                              c: bigint, s: bigint, alarm: int>>) AS acc),
                  (st, x) -> struct(
                    greatest(CAST(0 AS BIGINT),
                             st.s + x.c - {CUSUM_MU}) AS s,
                    array_append(st.acc, named_struct(
                      'day_n', CAST(x.day_n AS BIGINT),
                      'c', CAST(x.c AS BIGINT),
                      's', greatest(CAST(0 AS BIGINT),
                                    st.s + x.c - {CUSUM_MU}),
                      'alarm', CAST(CASE WHEN greatest(CAST(0 AS BIGINT),
                                    st.s + x.c - {CUSUM_MU})
                                    >= {3 * CUSUM_MU} THEN 1 ELSE 0 END
                               AS INT))) AS acc),
                  st -> st.acc)
                """
            )
        ).alias("r"),
    )
    return folded.select(
        "event_type",
        F.col("r.day_n").alias("day_n"),
        F.col("r.c").alias("c"),
        F.col("r.s").alias("s"),
        F.col("r.alarm").alias("alarm"),
    )
