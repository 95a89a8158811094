"""Bucketed layout: bucket-key joins over the warehouse tables must run with
ZERO Exchange operators — the written proof that the graph's traversal joins
are co-located at any scale (the shuffle happened once, at write time)."""

import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.pipeline.warehouse import (
    read_bucketed_graph,
    write_bucketed_graph,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def warehouse(spark, pipeline_out):
    write_bucketed_graph(
        spark, pipeline_out["nodes"], pipeline_out["edges"], db="g_test"
    )
    return read_bucketed_graph(spark, db="g_test")


def test_location_conflict_is_loud(spark, pipeline_out, warehouse, tmp_path):
    """Reusing an existing database name with a DIFFERENT location must
    error, not silently clean/write a directory the catalog doesn't use
    (CREATE DATABASE IF NOT EXISTS keeps the old location)."""
    with pytest.raises(ValueError, match="already exists at"):
        write_bucketed_graph(
            spark,
            pipeline_out["nodes"],
            pipeline_out["edges"],
            db="g_test",
            location=str(tmp_path / "elsewhere.db"),
        )


def test_rewrite_same_db_cleans_actual_location(spark, pipeline_out):
    """A second write to the same db must succeed (stale dirs cleaned at the
    catalog-resolved location) and keep row counts."""
    for _ in range(2):
        write_bucketed_graph(
            spark, pipeline_out["nodes"], pipeline_out["edges"], db="g_rw"
        )
    nodes, _ = read_bucketed_graph(spark, db="g_rw")
    assert nodes.count() == pipeline_out["nodes"].count()


def test_rows_survive_bucketing(spark, pipeline_out, warehouse):
    nodes, edges = warehouse
    assert nodes.count() == pipeline_out["nodes"].count()
    assert edges.count() == pipeline_out["edges"].count()


def test_edge_self_join_has_no_exchange(spark, warehouse):
    _, edges = warehouse
    a = edges.select(F.col("subj_id"), F.col("obj_id").alias("mid"))
    b = edges.select(F.col("subj_id"), "pred")
    # disable broadcast: at test scale the planner would broadcast (which
    # also skips the shuffle); the 100 TB shape is the shuffle-FREE
    # sort-merge join over aligned buckets, so that's the plan we pin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "subj_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_two_hop_traversal_bounded_exchanges(spark, warehouse):
    # hop 1 re-keys the probe side on obj_id (one genuine shuffle); the
    # build side arrives bucket-partitioned on subj_id == the join key, so
    # at most the re-keyed sides shuffle — never a third exchange
    _, edges = warehouse
    hop1 = edges.select(F.col("subj_id"), F.col("obj_id").alias("mid"))
    hop2 = edges.select(F.col("subj_id").alias("mid"), F.col("obj_id").alias("dst"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        two_hop = hop1.join(hop2, "mid")
        plan = _plan(two_hop)
        assert plan.count("Exchange") <= 2, plan
        assert two_hop.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_baseline_does_exchange(spark, pipeline_out):
    # the counterfactual: the same self-join over the plain parquet layout
    # shuffles (or broadcasts at test scale) — bucketing is what removed it
    edges = pipeline_out["edges"]
    a = edges.select(F.col("subj_id"), F.col("obj_id").alias("mid"))
    b = edges.select(F.col("subj_id"), "pred")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(a.join(b, "subj_id"))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" in plan
