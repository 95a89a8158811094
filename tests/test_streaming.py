"""Streaming watcher (W1-W5 analog): new page files landing in a watched dir
are folded into the committed graph exactly once, matching a batch rebuild."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from codegraphcontext_spark.pipeline.runner import PipelineRunner
from codegraphcontext_spark.streaming import watch_pages


def _edge_set(edges):
    return {
        (r.subj_id, r.pred, r.obj_id, r.n_occurrences)
        for r in edges.select("subj_id", "pred", "obj_id", "n_occurrences").collect()
    }


def test_stream_fold_matches_batch(spark, corpus_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    t = pq.read_table(os.path.join(corpus_dir, "pages.parquet"))
    urls = sorted(set(t.column("url").to_pylist()))
    base_urls = set(urls[: int(len(urls) * 0.7)])
    mask = [u in base_urls for u in t.column("url").to_pylist()]
    base_p = str(d / "base.parquet")
    pq.write_table(t.filter(mask), base_p)

    watch_dir = str(d / "incoming")
    os.makedirs(watch_dir)
    pq.write_table(t.filter([not m for m in mask]), os.path.join(watch_dir, "delta0.parquet"))

    wd = str(d / "wd")
    PipelineRunner(spark, base_p, wd).run()

    q = watch_pages(spark, watch_dir, base_p, wd, once=True)
    q.awaitTermination(300)

    streamed = PipelineRunner(spark, base_p, wd).run()  # all-resumed read
    wd_full = str(d / "wd_full")
    full = PipelineRunner(spark, os.path.join(corpus_dir, "pages.parquet"), wd_full).run()
    assert _edge_set(streamed["edges"]) == _edge_set(full["edges"])
