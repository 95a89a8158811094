"""Incremental mode (W3 analog): folding a delta snapshot into a committed
workdir must produce the same graph as a full run over base+delta, with
delta-only recompute of the narrow stages and idempotent re-ingestion.

The reference's watcher re-parses the whole repo on any change (reference
``core/watcher.py:84-119``); this pins the upgraded O(delta) contract."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.pipeline.runner import PipelineRunner


@pytest.fixture(scope="module")
def split_corpus(corpus_dir, tmp_path_factory):
    """Split the smoke pages deterministically by url into base / delta,
    keeping all snapshots of one url on the same side (the dup-url edge case
    must not straddle the split)."""
    d = tmp_path_factory.mktemp("incr")
    t = pq.read_table(os.path.join(corpus_dir, "pages.parquet"))
    urls = sorted(set(t.column("url").to_pylist()))
    base_urls = set(urls[: int(len(urls) * 0.6)])
    mask = [u in base_urls for u in t.column("url").to_pylist()]
    base = t.filter(mask)
    delta = t.filter([not m for m in mask])
    base_p = str(d / "base.parquet")
    delta_p = str(d / "delta.parquet")
    pq.write_table(base, base_p)
    pq.write_table(delta, delta_p)
    return base_p, delta_p


def _edge_set(edges):
    return {
        (r.subj_id, r.pred, r.obj_id, r.n_occurrences)
        for r in edges.select("subj_id", "pred", "obj_id", "n_occurrences").collect()
    }


def _node_set(nodes):
    return {
        (r.node_id, r.node_type, r.name)
        for r in nodes.select("node_id", "node_type", "name").collect()
    }


def test_incremental_equals_full(spark, corpus_dir, split_corpus, tmp_path_factory):
    base_p, delta_p = split_corpus
    wd_full = str(tmp_path_factory.mktemp("wd_full"))
    wd_incr = str(tmp_path_factory.mktemp("wd_incr"))

    full = PipelineRunner(
        spark, os.path.join(corpus_dir, "pages.parquet"), wd_full
    ).run()

    incr_runner = PipelineRunner(spark, base_p, wd_incr)
    incr_runner.run()
    incr = incr_runner.run_incremental(delta_p)

    assert _edge_set(incr["edges"]) == _edge_set(full["edges"])
    assert _node_set(incr["nodes"]) == _node_set(full["nodes"])


def test_incremental_idempotent(spark, split_corpus, tmp_path_factory):
    base_p, delta_p = split_corpus
    wd = str(tmp_path_factory.mktemp("wd_idem"))
    runner = PipelineRunner(spark, base_p, wd)
    runner.run()
    first = runner.run_incremental(delta_p)
    edges1 = _edge_set(first["edges"])

    again = PipelineRunner(spark, base_p, wd)
    second = again.run_incremental(delta_p)  # same delta -> resume, no rebuild
    assert _edge_set(second["edges"]) == edges1
    assert all(m.get("resumed") for m in again.metrics.values())


def test_incremental_requires_base(spark, split_corpus, tmp_path_factory):
    base_p, delta_p = split_corpus
    wd = str(tmp_path_factory.mktemp("wd_nobase"))
    with pytest.raises(RuntimeError, match="base build"):
        PipelineRunner(spark, base_p, wd).run_incremental(delta_p)


def test_incremental_newer_snapshot_wins(spark, corpus_dir, tmp_path_factory):
    """A delta carrying a NEWER snapshot of an existing url replaces its doc."""
    import pyarrow as pa
    from datetime import datetime

    d = tmp_path_factory.mktemp("snap")
    wd = str(tmp_path_factory.mktemp("wd_snap"))
    runner = PipelineRunner(spark, os.path.join(corpus_dir, "pages.parquet"), wd)
    out = runner.run()
    victim = out["docs"].orderBy("url").select("url").first().url

    new_html = (
        "<html><body><p>Updated Page Corp is a company. "
        "Updated Page Corp acquired Acme Corp.</p></body></html>"
    ).encode()
    delta = pa.table({
        "url": pa.array([victim], pa.string()),
        "warc_ts": pa.array([datetime(2030, 1, 1)], pa.timestamp("us")),
        "html": pa.array([new_html], pa.binary()),
        "text": pa.array([""], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    })
    delta_p = str(d / "delta.parquet")
    pq.write_table(delta, delta_p)

    res = runner.run_incremental(delta_p)
    txt = res["docs"].where(F.col("url") == victim).first().text_extracted
    assert "Updated Page Corp" in txt
    assert res["docs"].where(F.col("url") == victim).count() == 1
