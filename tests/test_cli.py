"""CLI surface (the spark-submit entry): build -> resume -> query."""

from __future__ import annotations

import json
import os

import pytest

from codegraphcontext_spark import cli


@pytest.fixture(scope="module")
def built_wd(spark, corpus_dir, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("cli_wd"))
    rc = cli.main([
        "build", "--pages", os.path.join(corpus_dir, "pages.parquet"),
        "--workdir", wd,
    ])
    assert rc == 0
    return wd


def test_build_and_resume(spark, corpus_dir, built_wd, capsys):
    # second run resumes every stage
    rc = cli.main([
        "build", "--pages", os.path.join(corpus_dir, "pages.parquet"),
        "--workdir", built_wd,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"
    assert out["n_edges"] > 0
    assert all(s.get("resumed") for s in out["stages"].values())


def test_query_who_references(spark, built_wd, capsys):
    rc = cli.main([
        "query", "--workdir", built_wd, "who_references", "Acme Corp",
    ])
    assert rc == 0
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) > 0
    assert all("subj_id" in r and r["n_occurrences"] >= 1 for r in lines)


def test_query_top_entities(spark, built_wd, capsys):
    rc = cli.main(["query", "--workdir", built_wd, "top_entities", "--limit", "5"])
    assert rc == 0
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(lines) <= 5
    # Zipfian corpus: the hub entity dominates
    assert lines[0]["n_refs"] >= lines[-1]["n_refs"]


def test_query_unknown(spark, built_wd):
    with pytest.raises(SystemExit):
        cli.main(["query", "--workdir", built_wd, "nonsense"])
