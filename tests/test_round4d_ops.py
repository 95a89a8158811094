"""Semantic pins for the round-4d operator wave: predicate functionality
profile, entity fact summarization, N-Triples export, SHACL-lite shape
validation, and type-constrained KGE negative sampling. The oracle gate
pins exact values at sf0.01; these tests pin the INVARIANTS a refactor
must preserve (ratio bounds, top-k size, serialization grammar, shape
thresholds, filtered-setting guarantees) on the sf0.001 graph."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _queries():
    import __spark_entry__ as e

    return e.queries()


def test_pred_functionality_bounds(spark):
    rows = _queries()["kg_pred_functionality"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # a predicate's distinct subjects/objects never exceed its triples
        assert 1 <= r["n_subj"] <= r["n_triples"]
        assert 1 <= r["n_obj"] <= r["n_triples"]
        assert 0 < r["fun_x1e6"] <= 1_000_000
        assert 0 < r["inv_fun_x1e6"] <= 1_000_000
        # exact integer rational, no float drift
        assert r["fun_x1e6"] == r["n_subj"] * 1_000_000 // r["n_triples"]
    preds = {r["pred"] for r in rows}
    assert not preds & {"MENTIONS", "LINKS_TO", "HAS_TYPE"}


def test_entity_summary_topk_and_rank_order(spark):
    rows = _queries()["kg_entity_summary"](spark, SF_DIR).collect()
    assert len(rows) > 0
    by_subj: dict = {}
    for r in rows:
        by_subj.setdefault(r["subj"], []).append(r)
    for subj, facts in by_subj.items():
        ranks = sorted(f["rk"] for f in facts)
        assert ranks == list(range(1, len(facts) + 1)), subj
        assert len(facts) <= 3
        ordered = sorted(facts, key=lambda f: f["rk"])
        scores = [f["ifreq_x1e6"] for f in ordered]
        assert scores == sorted(scores, reverse=True), subj
    # some entity must have >= 2 facts or the ranking is vacuous
    assert any(len(f) > 1 for f in by_subj.values())


_NT = re.compile(
    r"^<http://kg\.example/e/[a-z0-9.%-]+> "
    r"<(http://kg\.example/p/[a-z_]+"
    r"|http://www\.w3\.org/1999/02/22-rdf-syntax-ns#type)> "
    r"<http://kg\.example/[et]/[a-z0-9.%-]+> \.$"
)


def test_rdf_ntriples_grammar_and_type_lines(spark):
    rows = _queries()["kg_rdf_ntriples"](spark, SF_DIR).collect()
    assert len(rows) > 0
    n_type = 0
    for r in rows:
        line = r["ntriple"]
        assert _NT.match(line), line
        assert " " not in line.split("> <")[0].removeprefix("<"), line
        if r["pred"] == "HAS_TYPE":
            n_type += 1
            assert "rdf-syntax-ns#type" in line
            assert "/t/" in line
    # the export must carry the type assertions, not just open relations
    assert n_type > 0
    assert n_type < len(rows)


def test_shacl_lite_thresholds_and_counts(spark):
    rows = _queries()["kg_shacl_lite"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # induced shapes respect the >=50% and >=2 support gates
        assert r["n_with"] * 2 >= r["n_typed"]
        assert r["n_with"] >= 2
        assert r["n_missing"] == r["n_typed"] - r["n_with"]
        if r["n_missing"] == 0:
            assert r["first_missing"] == ""
        else:
            assert r["first_missing"] != ""
    # validation must find at least one real violation on this corpus,
    # else the audit is vacuous
    assert any(r["n_missing"] > 0 for r in rows)


def test_kge_hard_negatives_filtered_and_typed(spark):
    import __spark_entry__ as e

    qs = e.queries()
    from codegraphcontext_spark.queries.graph_queries import ensure_graph
    from pyspark.sql import functions as F

    nodes, edges = ensure_graph(spark, SF_DIR)
    names = {
        r["node_id"]: r["name"]
        for r in nodes.select("node_id", "name").collect()
    }
    etype = {
        names[r["subj_id"]]: r["etype"]
        for r in edges.where(F.col("pred") == "HAS_TYPE")
        .groupBy("subj_id")
        .agg(F.min("obj_id").alias("etype"))
        .collect()
    }
    true_triples = {
        (names[r["subj_id"]], r["pred"], names[r["obj_id"]])
        for r in edges.where(
            ~F.col("pred").isin("MENTIONS", "LINKS_TO", "HAS_TYPE")
        )
        .select("subj_id", "pred", "obj_id")
        .distinct()
        .collect()
    }
    rows = qs["kg_kge_hard_negatives"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # the positive is real, the negative is NOT (filtered setting)
        assert (r["subj"], r["pred"], r["pos_obj"]) in true_triples
        assert (r["subj"], r["pred"], r["neg_obj"]) not in true_triples
        assert r["neg_obj"] != r["pos_obj"]
        # type constraint: replacement has the true object's type
        assert etype[r["neg_obj"]] == etype[r["pos_obj"]]
