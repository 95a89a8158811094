"""Checkpoint/resume idempotency (north rule J2/J6; FIXTURES.md §5):
kill between stages, rerun, same result — committed stages are not recomputed."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.pipeline.runner import PipelineRunner


@pytest.fixture(scope="module")
def pages_path(corpus_dir):
    return os.path.join(corpus_dir, "pages.parquet")


def test_full_rerun_resumes_every_stage(spark, pages_path, tmp_path):
    wd = str(tmp_path / "wd")
    r1 = PipelineRunner(spark, pages_path, wd)
    out1 = r1.run()
    e1 = out1["edges"].count()
    assert not any(m.get("resumed") for m in r1.metrics.values())

    r2 = PipelineRunner(spark, pages_path, wd)
    out2 = r2.run()
    assert all(m.get("resumed") for m in r2.metrics.values()), r2.metrics
    assert out2["edges"].count() == e1


def test_partial_resume_recomputes_only_missing(spark, pages_path, tmp_path):
    wd = str(tmp_path / "wd")
    r1 = PipelineRunner(spark, pages_path, wd)
    ref = {
        (row.subj_id, row.pred, row.obj_id)
        for row in r1.run()["edges"].select("subj_id", "pred", "obj_id").collect()
    }
    # simulate a crash after 'canon': wipe everything downstream
    for stage in ("linked", "nodes", "edges"):
        shutil.rmtree(os.path.join(wd, stage), ignore_errors=True)

    r2 = PipelineRunner(spark, pages_path, wd)
    out2 = r2.run()
    assert r2.metrics["docs"].get("resumed")
    assert r2.metrics["canon"].get("resumed")
    assert not r2.metrics["linked"].get("resumed")
    got = {
        (row.subj_id, row.pred, row.obj_id)
        for row in out2["edges"].select("subj_id", "pred", "obj_id").collect()
    }
    assert got == ref


def test_input_change_invalidates_checkpoints(spark, pages_path, tmp_path):
    wd = str(tmp_path / "wd")
    PipelineRunner(spark, pages_path, wd).run()
    # copy input -> new fingerprint (mtime/size change simulated via touch)
    os.utime(pages_path)
    r2 = PipelineRunner(spark, pages_path, wd)
    r2.run()
    assert not r2.metrics["docs"].get("resumed")


def test_layout_version_invalidates_stale_workdir(
    spark, pages_path, tmp_path, monkeypatch
):
    """A workdir committed under an older persisted-stage layout (schema or
    winner-semantics change, e.g. the round-2 snap_md5 addition) must
    REBUILD, not resume — otherwise run() serves rows chosen by the old
    rule and run_incremental() crashes selecting a missing column."""
    from codegraphcontext_spark.pipeline import runner as runner_mod

    wd = str(tmp_path / "wd")
    PipelineRunner(spark, pages_path, wd).run()
    monkeypatch.setattr(
        runner_mod,
        "PIPELINE_LAYOUT_VERSION",
        runner_mod.PIPELINE_LAYOUT_VERSION + 1,
    )
    r2 = PipelineRunner(spark, pages_path, wd)
    r2.run()
    assert not any(m.get("resumed") for m in r2.metrics.values()), r2.metrics


def test_lineage_rows_written(spark, pages_path, tmp_path):
    wd = str(tmp_path / "wd")
    r = PipelineRunner(spark, pages_path, wd)
    out = r.run()
    lineage = spark.read.parquet(os.path.join(wd, "docs", "lineage"))
    assert lineage.columns == ["partition_id", "n_rows"]
    assert lineage.agg(F.sum("n_rows")).collect()[0][0] == out["docs"].count()
