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
    # n_partitions = lineage ROW count (actual partitions), not file count:
    # url-partitioned stages commit n_partitions shards (> 1)
    by_stage = {m["stage"]: m for m in out["stages"]}
    assert by_stage["docs"]["n_partitions"] > 1


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


def _rows(capsys):
    out = capsys.readouterr().out.strip()
    return [json.loads(line) for line in out.splitlines()] if out else []


def test_query_doc_references(spark, built_wd, capsys):
    """Q9 find_callees analog: entities a given page mentions."""
    cli.main(["query", "--workdir", built_wd, "who_references", "Acme Corp"])
    page = _rows(capsys)[0]["subj_id"]
    rc = cli.main(["query", "--workdir", built_wd, "doc_references", page])
    assert rc == 0
    rows = _rows(capsys)
    assert len(rows) > 0
    assert "acme corp" in {r["entity"] for r in rows}
    assert all(r["n_occurrences"] >= 1 for r in rows)


def test_query_importers(spark, built_wd, capsys):
    """Q10 find_importers analog: pages linking to a domain."""
    cli.main([
        "sql", "--workdir", built_wd,
        "SELECT obj_id FROM edges WHERE pred='LINKS_TO' LIMIT 1",
    ])
    domain = _rows(capsys)[0]["obj_id"]
    rc = cli.main(["query", "--workdir", built_wd, "importers", domain])
    assert rc == 0
    rows = _rows(capsys)
    assert len(rows) > 0
    assert all(r["n_occurrences"] >= 1 for r in rows)


def test_query_entities_by_type(spark, built_wd, capsys):
    """Q6/Q7 by-argument analog over HAS_TYPE edges."""
    rc = cli.main(["query", "--workdir", built_wd, "entities_by_type", "org"])
    assert rc == 0
    rows = _rows(capsys)
    assert len(rows) > 0
    assert "acme corp" in {r["entity"] for r in rows}


def test_query_usage_scope(spark, built_wd, capsys):
    """Q11/Q19 analog: scope classification of edges touching the entity."""
    rc = cli.main(["query", "--workdir", built_wd, "usage_scope", "Acme Corp"])
    assert rc == 0
    rows = _rows(capsys)
    scopes = {r["scope"] for r in rows}
    assert "page_mention" in scopes and "typed" in scopes
    assert all(r["n_occ"] >= 1 for r in rows)


def test_query_overrides(spark, built_wd, capsys):
    """Q13 analog: every canonical entity sharing the surface name."""
    rc = cli.main(["query", "--workdir", built_wd, "overrides", "Acme Corp"])
    assert rc == 0
    rows = _rows(capsys)
    assert len(rows) > 0
    assert all("node_id" in r and r["n_refs"] >= 0 for r in rows)


def test_query_complexity(spark, built_wd, capsys):
    """Q21/Q22 find_complexity analog: most extraction-rich pages, desc."""
    rc = cli.main(["query", "--workdir", built_wd, "complexity", "--limit", "5"])
    assert rc == 0
    rows = _rows(capsys)
    assert 0 < len(rows) <= 5
    facts = [r["n_facts"] for r in rows]
    assert facts == sorted(facts, reverse=True)


def test_query_closure_directions(spark, built_wd, capsys):
    """Q15/Q16 analog: bounded transitive closure both directions."""
    rc = cli.main([
        "query", "--workdir", built_wd, "all_referenced", "Acme Corp",
        "--depth", "2",
    ])
    assert rc == 0
    fwd = _rows(capsys)
    rc = cli.main([
        "query", "--workdir", built_wd, "all_referencers", "Acme Corp",
        "--depth", "2",
    ])
    assert rc == 0
    rev = _rows(capsys)
    assert len(fwd) + len(rev) > 0
    for r in fwd + rev:
        assert 1 <= r["depth"] <= 2


def test_query_call_chain(spark, built_wd, capsys):
    """Q17 analog: '->' target parse + shortest-first chains."""
    # find a directly-connected pair via an open-pred edge
    cli.main([
        "sql", "--workdir", built_wd,
        "SELECT n1.name AS a, n2.name AS b FROM edges e "
        "JOIN nodes n1 ON n1.node_id = e.subj_id "
        "JOIN nodes n2 ON n2.node_id = e.obj_id "
        "WHERE e.pred NOT IN ('MENTIONS','LINKS_TO','HAS_TYPE') "
        "AND e.subj_id <> e.obj_id LIMIT 1",
    ])
    pair = _rows(capsys)[0]
    rc = cli.main([
        "query", "--workdir", built_wd, "call_chain",
        f"{pair['a']}->{pair['b']}", "--depth", "3",
    ])
    assert rc == 0
    rows = _rows(capsys)
    assert len(rows) > 0
    assert rows[0]["length"] == 1  # shortest first: the direct edge
    assert rows[0]["chain"] == f"{pair['a']} -> {pair['b']}"
    # every chain renders exactly length+1 node names (parallel edges and
    # duplicate hit paths must not multiply the rendering)
    for r in rows:
        assert len(r["chain"].split(" -> ")) == r["length"] + 1
    lengths = [r["length"] for r in rows]
    assert lengths == sorted(lengths)


def test_query_call_chain_bad_format(spark, built_wd, capsys):
    """The reference's '->' error contract (code_finder.py:686-691)."""
    rc = cli.main(["query", "--workdir", built_wd, "call_chain", "no arrow"])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip())
    assert "error" in err and "example" in err


def test_visualize_html(spark, built_wd, tmp_path, capsys):
    """Q24 analog: self-contained offline HTML subgraph artifact."""
    out = str(tmp_path / "viz.html")
    rc = cli.main([
        "visualize", "--workdir", built_wd, "acme", "--out", out,
        "--hops", "2", "--limit", "500",
    ])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_nodes"] > 0 and meta["n_edges"] > 0
    with open(out) as f:
        html = f.read()
    assert html.startswith("<!DOCTYPE html>")
    assert "acme corp" in html          # seed entity present in the data
    assert "http" not in html.split("</title>")[1].split("const DATA")[0]
    # embedded JSON is parseable and consistent with the reported counts
    data = json.loads(html.split("const DATA = ", 1)[1].split(";\n", 1)[0])
    assert len(data["nodes"]) == meta["n_nodes"]
    assert len(data["edges"]) == meta["n_edges"]


def test_warehouse_subcommand(spark, built_wd, capsys):
    rc = cli.main([
        "warehouse", "--workdir", built_wd, "--db", "g_cli",
        "--location", "/tmp/cgc_spark_warehouse/g_cli.db",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["nodes"] > 0 and out["edges"] > 0
    assert spark.table("g_cli.edges").count() == out["edges"]


def test_export_subcommand_roundtrip(spark, built_wd, tmp_path, capsys):
    out = str(tmp_path / "exported")
    rc = cli.main(["export", "--workdir", built_wd, "--out", out, "--format", "jsonl"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # read the export back: counts must survive the format round trip
    back_nodes = spark.read.json(os.path.join(out, "nodes")).count()
    back_edges = spark.read.json(os.path.join(out, "edges")).count()
    assert (back_nodes, back_edges) == (rep["nodes"], rep["edges"])
    assert rep["edges"] > 0


def test_query_edge_sentences(spark, built_wd, capsys):
    """Per-site provenance lookup: every (page, sentence) asserting an open
    relation between a directly-connected pair, consistent with the edge
    table's n_occurrences rollup."""
    cli.main([
        "sql", "--workdir", built_wd,
        "SELECT n1.name AS a, n2.name AS b, e.n_occurrences AS n FROM edges e "
        "JOIN nodes n1 ON n1.node_id = e.subj_id "
        "JOIN nodes n2 ON n2.node_id = e.obj_id "
        "WHERE e.pred NOT IN ('MENTIONS','LINKS_TO','HAS_TYPE') "
        "ORDER BY e.n_occurrences DESC LIMIT 1",
    ])
    pair = _rows(capsys)[0]
    rc = cli.main([
        "query", "--workdir", built_wd, "edge_sentences",
        f"{pair['a']}->{pair['b']}", "--limit", "500",
    ])
    assert rc == 0
    rows = _rows(capsys)
    assert rows, "expected at least one occurrence site"
    assert {"pred", "url", "sent_id"} <= set(rows[0])
    # the sites for this pair across ALL its open preds include at least
    # the top edge's n_occurrences rows
    assert len(rows) >= pair["n"]
    # malformed arg -> error contract
    rc = cli.main([
        "query", "--workdir", built_wd, "edge_sentences", "no-arrow",
    ])
    assert rc == 2


def test_query_fuzzy_typo_finds_entity(spark, built_wd, capsys):
    """The Lucene-`name~` analog: a misspelled entity name must surface the
    real entity as the best match, ranked by padded-trigram Jaccard."""
    rc = cli.main(["query", "--workdir", built_wd, "fuzzy", "acme crop"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and rows[0]["name"] == "acme corp"
    scores = [r["jaccard_x1e6"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 200_000 for s in scores)


def test_query_fuzzy_no_match(spark, built_wd, capsys):
    rc = cli.main(["query", "--workdir", built_wd, "fuzzy", "qqqqqq"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == ""


def test_query_related_ppr(spark, built_wd, capsys):
    """Personalized-PageRank relatedness: seed excluded, ranks positive and
    non-increasing, and a direct neighbor of the seed must appear."""
    rc = cli.main(["query", "--workdir", built_wd, "related", "Acme Corp"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows
    assert all(r["name"] != "acme corp" for r in rows)
    ranks = [r["ppr_rank"] for r in rows]
    assert all(x > 0 for x in ranks)
    assert ranks == sorted(ranks, reverse=True)


def test_query_related_unknown_entity(spark, built_wd, capsys):
    rc = cli.main(["query", "--workdir", built_wd, "related", "no such thing"])
    assert rc == 2
    assert "no entity named" in capsys.readouterr().err


def test_query_suggest_link_prediction(spark, built_wd, capsys):
    """Link prediction: suggestions exclude the seed AND its existing
    open-relation neighbors, scores positive and non-increasing. Seed = the
    LOWEST-degree entity (a high-degree seed in the dense smoke graph is
    already connected to everyone -> correctly zero suggestions)."""
    from pyspark.sql import functions as F

    nodes = spark.read.parquet(f"{built_wd}/nodes/data")
    edges = spark.read.parquet(f"{built_wd}/edges/data")
    open_e = edges.where(
        ~F.col("pred").isin("MENTIONS", "LINKS_TO", "HAS_TYPE")
    ).where(F.col("subj_id") != F.col("obj_id"))
    und = open_e.select(
        F.col("subj_id").alias("s"), F.col("obj_id").alias("d")
    ).union(
        open_e.select(F.col("obj_id").alias("s"), F.col("subj_id").alias("d"))
    ).distinct()
    seed_row = (
        und.groupBy("s").agg(F.count("*").alias("dz"))
        .join(nodes.where("node_type='Entity'")
                   .select(F.col("node_id").alias("s"), "name"), "s")
        .orderBy(F.asc("dz"), F.asc("name")).head()
    )
    rc = cli.main(["query", "--workdir", built_wd, "suggest", seed_row.name])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows  # a min-degree node has 2-hop non-neighbors in this graph
    assert all(r["name"] != seed_row.name for r in rows)
    scores = [r["aa_score_x1e6"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # no suggestion may already be an open-relation neighbor of the seed
    nb_ids = {r.d for r in und.where(F.col("s") == seed_row.s).collect()}
    nb_names = {
        r.name
        for r in nodes.where(F.col("node_id").isin(list(nb_ids))).collect()
    }
    assert not (nb_names & {r["name"] for r in rows})


def test_query_suggest_unknown_entity(spark, built_wd, capsys):
    rc = cli.main(["query", "--workdir", built_wd, "suggest", "no such thing"])
    assert rc == 2
    assert "no entity named" in capsys.readouterr().err


def test_layout_subcommand(spark, tmp_path, capsys):
    out = str(tmp_path / "zordered")
    rc = cli.main([
        "layout", "--input", "/root/testdata/sf0.001/events.parquet",
        "--out", out, "--cols", "user_id,ts", "--rows-per-file", "100",
    ])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["n_files"] > 1
    # both layout columns carry a measured pruning probe < 1.0
    assert set(line["overlap_probe"]) == {"user_id", "ts"}
    assert all(v < 1.0 for v in line["overlap_probe"].values())
    # rewrite preserves every row
    orig = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert spark.read.parquet(out).count() == orig.count()


def test_layout_subcommand_rejects_unknown_column(capsys):
    rc = cli.main([
        "layout", "--input", "/root/testdata/sf0.001/events.parquet",
        "--out", "/tmp/never_written_zorder", "--cols", "nope",
    ])
    assert rc == 2
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "unknown columns" in line["error"]


def test_query_summary_entity_card(spark, built_wd, capsys):
    """summary: the entity's facts ranked by inverse (pred, obj) frequency
    — scores descend, every row is a real fact of the entity."""
    rc = cli.main(["query", "--workdir", built_wd, "summary", "acme corp"])
    assert rc == 0
    rows = _rows(capsys)
    assert rows, "hub entity must have facts"
    assert {"pred", "obj", "ifreq_x1e6"} <= set(rows[0])
    scores = [r["ifreq_x1e6"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 1_000_000 for s in scores)  # N*1e6/cnt >= 1e6


def test_query_sources_citations(spark, built_wd, capsys):
    """sources: per-pred citation list for a fact picked from the graph
    itself; URL list sorted, capped at 5, counts consistent."""
    rc = cli.main([
        "sql", "--workdir", built_wd,
        "SELECT sn.name AS a, onn.name AS b FROM edges e "
        "JOIN nodes sn ON sn.node_id = e.subj_id "
        "JOIN nodes onn ON onn.node_id = e.obj_id "
        "WHERE e.pred NOT IN ('MENTIONS','LINKS_TO','HAS_TYPE') "
        "ORDER BY e.n_occurrences DESC LIMIT 1",
    ])
    assert rc == 0
    pair = _rows(capsys)[0]
    rc = cli.main([
        "query", "--workdir", built_wd, "sources",
        f"{pair['a']}->{pair['b']}",
    ])
    assert rc == 0
    rows = _rows(capsys)
    assert rows
    for r in rows:
        urls = r["sources"].split(", ")
        assert len(urls) == min(r["n_urls"], 5)
        assert urls == sorted(urls)
        assert 1 <= r["n_urls"] <= r["n_sites"]
    # malformed arg -> error contract
    rc = cli.main(["query", "--workdir", built_wd, "sources", "no-arrow"])
    assert rc == 2


def test_query_subgraph_evidence_cut(spark, built_wd, capsys):
    """subgraph: induced 2-hop edge set includes the seed's own facts and
    only name-resolved open relations."""
    rc = cli.main([
        "query", "--workdir", built_wd, "subgraph", "acme corp",
        "--limit", "10000",
    ])
    assert rc == 0
    rows = _rows(capsys)
    assert rows
    assert {"subj", "pred", "obj"} <= set(rows[0])
    assert any(
        r["subj"] == "acme corp" or r["obj"] == "acme corp" for r in rows
    )
    assert not {r["pred"] for r in rows} & {
        "MENTIONS", "LINKS_TO", "HAS_TYPE"
    }


def test_query_rules_over_workdir(spark, built_wd, capsys):
    """rules: predicate implication rules mined from the committed graph —
    confidence-sorted, bounded by --limit, integer-exact columns."""
    rc = cli.main(
        ["query", "--workdir", built_wd, "--limit", "5", "rules"]
    )
    assert rc == 0
    rows = _rows(capsys)
    assert rows and len(rows) <= 5
    assert {
        "direction", "body_pred", "head_pred",
        "n_body", "n_support", "conf_x1000",
    } <= set(rows[0])
    confs = [r["conf_x1000"] for r in rows]
    assert confs == sorted(confs, reverse=True)
    assert all(0 <= c <= 1000 for c in confs)
    assert all(r["n_support"] >= 2 for r in rows)
