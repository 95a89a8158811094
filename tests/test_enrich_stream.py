"""Stream-static enrichment: every event lands exactly once with its
dimension attributes; unmatched users flow through flagged, not dropped;
and the batch twin of the same join gives identical rows (stream == batch
for a stateless transform)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from codegraphcontext_spark.streaming.enrich import (
    enrich_events,
    events_enriched_stream,
)

_TS = 1_700_000_000_000_000  # fixed epoch micros


def _events_table(rows):
    """rows: list of (event_id, user_id, value)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_TS + r[0] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _dims(spark):
    return spark.createDataFrame(
        [(1, "pro", 2.0), (2, "free", 1.0)], "user_id long, segment string, weight double"
    )


def test_stream_enrichment_matches_batch(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    rows = [(1, 1, 10.0), (2, 2, 4.0), (3, 99, 7.0)]  # user 99: no dim row
    pq.write_table(_events_table(rows), os.path.join(watch, "b0.parquet"))

    q = events_enriched_stream(spark, watch, out, ckpt, _dims(spark), once=True)
    q.awaitTermination(300)

    got = sorted(
        (r.event_id, r.segment, r.weight, r.weighted_value)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "pro", 2.0, 20.0),
        (2, "free", 1.0, 4.0),
        (3, "unknown", 0.0, 0.0),  # kept + flagged, not dropped
    ]

    # batch twin over the same files: identical rows (stateless transform)
    batch = sorted(
        (r.event_id, r.segment, r.weight, r.weighted_value)
        for r in enrich_events(spark.read.parquet(watch), _dims(spark)).collect()
    )
    assert batch == got

    # second batch of files: exactly-once resume, no reprocessing of b0
    pq.write_table(_events_table([(4, 1, 1.0)]), os.path.join(watch, "b1.parquet"))
    q2 = events_enriched_stream(spark, watch, out, ckpt, _dims(spark), once=True)
    q2.awaitTermination(300)
    ids = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 2, 3, 4]


def test_enrichment_plan_is_broadcast(spark):
    ev = spark.createDataFrame(
        [(1, 1, 5.0)], "event_id long, user_id long, value double"
    )
    plan = enrich_events(ev, _dims(spark))._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()


def test_enrichment_salted_variant_identical(spark, tmp_path):
    # the big-dimension path: salted shuffle join must give row-identical
    # output to the broadcast default (only physical distribution differs)
    watch = str(tmp_path / "salted_in")
    os.makedirs(watch)
    rows = [(i, 7 if i < 40 else i % 5, float(i)) for i in range(60)]
    pq.write_table(_events_table(rows), os.path.join(watch, "b.parquet"))
    ev = spark.read.parquet(watch)
    base = enrich_events(ev, _dims(spark))
    salted = enrich_events(ev, _dims(spark), n_salts=4)
    key = sorted(base.columns)
    assert sorted(map(tuple, salted.select(*key).collect())) == sorted(
        map(tuple, base.select(*key).collect())
    )
    # and the salted plan really shuffles instead of broadcasting the dim
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
