"""Crash-window safety of the mutation machinery: the atomic stage swap
(`_swap_write` + `_heal_swaps`), atomic JSON record writes, and the accurate
cross-mutation pending error. Analog of the reference's job-recovery
expectations (``graph_builder.py`` resume semantics), pinned here because a
100 TB mutation that crashes mid-swap must never silently lose rows."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from codegraphcontext_spark.pipeline.runner import PipelineRunner

PREFIX = "https://site1"


@pytest.fixture(scope="module")
def base_build(spark, corpus_dir, tmp_path_factory):
    """One committed base build, copied per-test so each test mutates its
    own workdir without a rebuild."""
    wd = str(tmp_path_factory.mktemp("crash_base"))
    pages = os.path.join(corpus_dir, "pages.parquet")
    PipelineRunner(spark, pages, wd).run()
    return pages, wd


def _clone(base_build, tmp_path_factory, name):
    pages, wd = base_build
    dst = str(tmp_path_factory.mktemp(name) / "wd")
    shutil.copytree(wd, dst)
    return pages, dst


def test_heal_restores_backup_when_data_missing(
    spark, base_build, tmp_path_factory
):
    """Crash between _swap_write's two renames (old moved aside, new not yet
    in place): constructing a runner must restore the backup so the retry
    recomputes from intact data instead of failing on a missing stage."""
    pages, wd = _clone(base_build, tmp_path_factory, "heal_restore")
    docs_data = os.path.join(wd, "docs", "data")
    os.rename(docs_data, docs_data + "_old")  # simulated crash point

    runner = PipelineRunner(spark, pages, wd)
    assert os.path.isdir(docs_data)
    assert not os.path.isdir(docs_data + "_old")
    runner.run()
    assert all(m.get("resumed") for m in runner.metrics.values())


def test_heal_drops_backup_when_swap_completed(
    spark, base_build, tmp_path_factory
):
    """Crash after the new data was renamed in but before the backup was
    deleted: the backup (stale rows) must be dropped, not restored."""
    pages, wd = _clone(base_build, tmp_path_factory, "heal_drop")
    docs_data = os.path.join(wd, "docs", "data")
    bak = docs_data + "_old"
    shutil.copytree(docs_data, bak)
    marker = os.path.join(bak, "stale_marker")
    open(marker, "w").close()

    PipelineRunner(spark, pages, wd)
    assert os.path.isdir(docs_data)
    assert not os.path.isdir(bak)


def test_cross_mutation_error_is_accurate(
    spark, base_build, tmp_path_factory
):
    """A DIFFERENT mutation attempted while one is pending must get the
    pending-mutation error (with the retry remedy), not the misleading
    'needs a base build' diagnosis mixed manifests would otherwise trip."""
    pages, wd = _clone(base_build, tmp_path_factory, "crossmut")
    crashing = PipelineRunner(spark, pages, wd)
    crashing._recompute_globals = lambda: (_ for _ in ()).throw(
        RuntimeError("injected crash")
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        crashing.run_delete(PREFIX)
    assert os.path.exists(os.path.join(wd, "_pending.json"))

    tbl = pq.read_table(pages)
    delta_dir = tmp_path_factory.mktemp("crossmut_delta")
    delta_p = str(delta_dir / "delta.parquet")
    pq.write_table(tbl.slice(0, 5), delta_p)

    with pytest.raises(RuntimeError, match="interrupted delete mutation"):
        PipelineRunner(spark, pages, wd).run_incremental(delta_p)
    with pytest.raises(RuntimeError, match="interrupted delete mutation"):
        PipelineRunner(spark, pages, wd).run_delete("https://site2")

    # retrying the interrupted delete itself still completes
    out = PipelineRunner(spark, pages, wd).run_delete(PREFIX)
    assert not os.path.exists(os.path.join(wd, "_pending.json"))
    assert out["docs"].where(out["docs"].url.startswith(PREFIX)).count() == 0


def test_write_json_atomic(tmp_path):
    """Record files are written tmp-then-rename: the final path only ever
    holds complete JSON and no .tmp residue survives."""
    p = str(tmp_path / "rec.json")
    PipelineRunner._write_json_atomic(p, {"sig": "abc", "n": 1})
    with open(p) as f:
        assert json.load(f) == {"sig": "abc", "n": 1}
    assert not os.path.exists(p + ".tmp")
    # overwrite goes through the same path
    PipelineRunner._write_json_atomic(p, [1, 2, 3])
    with open(p) as f:
        assert json.load(f) == [1, 2, 3]
    assert not os.path.exists(p + ".tmp")
