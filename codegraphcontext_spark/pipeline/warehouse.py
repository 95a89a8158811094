"""Bucketed warehouse layout: the co-located-join storage path for the
materialized graph at cluster scale.

The plain parquet layout (``runner.py``) is the portable default; this module
writes the SAME nodes/edges data as Spark bucketed tables so that every join
keyed on the bucket column — edge⨝edge traversals on ``subj_id``, edge⨝node
resolution on ``node_id`` — reads pre-shuffled buckets and the planner drops
the Exchange entirely. At 100 TB the graph's edge table is the fact table of
every query; hash-bucketing it once at write time converts the per-query
shuffle (O(|E|) network, every single query) into a one-time layout cost,
exactly like the reference's persistent Neo4j indexes amortize per-query
scans (``graph_builder.py:81-96`` creates them once at startup).

Bucket counts must match across tables that join (Spark only elides the
shuffle for equal bucket counts on the join key), so one module-level
constant governs both.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

# One setting for every graph table: equal counts are what lets the planner
# elide the exchange on bucket-key joins. 16 is sized for the test corpus;
# a 100 TB deployment raises it to O(cluster cores) at the same call site.
N_BUCKETS = 16


def write_bucketed_graph(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    db: str = "graph",
    n_buckets: int = N_BUCKETS,
    location: str | None = None,
) -> None:
    """Write nodes/edges as bucketed+sorted managed tables ``<db>.nodes`` /
    ``<db>.edges`` (overwriting any previous layout). ``location`` defaults
    to a /tmp warehouse dir so local runs never pollute the working tree;
    a cluster deployment passes its real warehouse path (or relies on an
    already-configured metastore default)."""
    loc = location or f"/tmp/cgc_spark_warehouse/{db}.db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    # CREATE ... IF NOT EXISTS silently keeps a pre-existing database's OLD
    # location — resolve the ACTUAL location from the catalog so the
    # stale-directory cleanup runs where the tables really live, and a
    # caller reusing a db name with a different location gets a loud error
    # instead of a cleanup of the wrong directory.
    actual = (
        spark.sql(f"DESCRIBE DATABASE {db}")
        .where("info_name = 'Location'")
        .collect()[0]["info_value"]
    )
    actual_path = actual.removeprefix("file:")
    if location is not None and os.path.abspath(
        actual_path
    ) != os.path.abspath(loc):
        raise ValueError(
            f"database {db!r} already exists at {actual_path!r}; "
            f"refusing to write its tables under the requested {loc!r} — "
            f"drop the database or pass its existing location"
        )
    for name in ("nodes", "edges"):
        spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
        # DROP only clears paths THIS catalog registered; a prior session's
        # leftover directory at the same location would otherwise fail the
        # write with LOCATION_ALREADY_EXISTS (local paths only — a real
        # metastore deployment keeps the catalog across sessions)
        stale = os.path.join(actual_path, name)
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    (
        nodes.write.bucketBy(n_buckets, "node_id")
        .sortBy("node_id")
        .format("parquet")
        .saveAsTable(f"{db}.nodes")
    )
    # edges bucket on subj_id: traversals expand FROM a node, so subj_id is
    # the probe side of every hop; sortBy gives row-group pruning within a
    # bucket (same poor-man's Z-order as runner._LAYOUT_SORT)
    (
        edges.write.bucketBy(n_buckets, "subj_id")
        .sortBy("subj_id", "pred", "obj_id")
        .format("parquet")
        .saveAsTable(f"{db}.edges")
    )


def read_bucketed_graph(
    spark: SparkSession, db: str = "graph"
) -> tuple[DataFrame, DataFrame]:
    return spark.table(f"{db}.nodes"), spark.table(f"{db}.edges")
