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


def test_query_unknown_lists_supported_types(spark, built_wd, capsys):
    """Reference error contract (code_finder.py:713-723): unknown query type
    returns an error naming the supported types."""
    rc = cli.main(["query", "--workdir", built_wd, "nonsense"])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip())
    assert "supported_types" in err
    assert "who_references" in err["supported_types"]


def test_query_class_hierarchy(spark, built_wd, capsys):
    rc = cli.main(["query", "--workdir", built_wd, "class_hierarchy", "Acme Corp"])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) > 0
    assert {r["direction"] for r in rows} <= {"in", "out"}
    assert all(r["pred"] not in ("MENTIONS", "LINKS_TO") for r in rows)


def test_query_dead_entities(spark, built_wd, capsys):
    rc = cli.main(["query", "--workdir", built_wd, "dead_entities"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    rows = [json.loads(line) for line in out.splitlines()] if out else []
    # sorted by name, entity rows only
    names = [r["name"] for r in rows]
    assert names == sorted(names)


def test_query_cooccurrence(spark, built_wd, capsys):
    rc = cli.main(["query", "--workdir", built_wd, "cooccurrence", "Acme Corp"])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) > 0
    assert all(r["name"] != "acme corp" and r["n_pages"] >= 1 for r in rows)


def test_who_references_fallback_relaxation(spark, built_wd, capsys):
    """Strict (lang-filtered) query is empty -> the CLI retries without the
    filter and still returns rows (reference code_finder.py:192-212)."""
    rc = cli.main([
        "query", "--workdir", built_wd, "who_references", "Acme Corp",
        "--lang", "zz",
    ])
    assert rc == 0
    cap = capsys.readouterr()
    rows = [json.loads(line) for line in cap.out.strip().splitlines()]
    assert len(rows) > 0
    assert "retried without the filter" in cap.err


def test_status(spark, built_wd, capsys):
    rc = cli.main(["status", "--workdir", built_wd])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    stages = {m["stage"] for m in out["stages"]}
    assert {"docs", "nodes", "edges"} <= stages
    assert all(m["n_rows"] > 0 for m in out["stages"])
    assert all(m["n_partitions"] >= 1 for m in out["stages"])


def test_sql_select_allowed(spark, built_wd, capsys):
    rc = cli.main([
        "sql", "--workdir", built_wd,
        "SELECT pred, COUNT(*) AS n FROM edges GROUP BY pred ORDER BY pred",
    ])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert {"MENTIONS", "LINKS_TO"} <= {r["pred"] for r in rows}


@pytest.mark.parametrize("bad", [
    "INSERT INTO edges VALUES ('a','b','c')",
    "DROP TABLE nodes",
    "WITH x AS (SELECT 1) DELETE FROM edges",
])
def test_sql_writes_rejected(spark, built_wd, capsys, bad):
    rc = cli.main(["sql", "--workdir", built_wd, bad])
    assert rc == 2
    assert "error" in json.loads(capsys.readouterr().err.strip())


def test_sql_literal_containing_keyword_is_fine(spark, built_wd, capsys):
    rc = cli.main([
        "sql", "--workdir", built_wd,
        "SELECT COUNT(*) AS n FROM nodes WHERE name = 'drop delete insert'",
    ])
    assert rc == 0


def test_dot_export(spark, built_wd, capsys):
    rc = cli.main([
        "dot", "--workdir", built_wd, "acme", "--hops", "2", "--limit", "2000",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("digraph G {") and out.rstrip().endswith("}")
    assert '[label="acme corp" shape=ellipse]' in out
    assert "->" in out and "MENTIONS" in out
