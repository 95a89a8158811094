"""Golden-triple assertions (analog of reference EXPECTED_CALLS/EXPECTED_IMPORTS,
tests/test_graph_indexing.py:112-218): the mention-level extraction output must
equal the generator's golden triples exactly — url, sentence id, surfaces and
predicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import golden

COLS = ["url", "sent_id", "subj_surface", "pred", "obj_surface"]


def test_triples_exact_set(spark, corpus_dir, pipeline_out):
    got = pipeline_out["triples"].select(*COLS)
    exp = golden(spark, corpus_dir, "triples").select(*COLS)
    assert exp.exceptAll(got).count() == 0, "golden triples missing from extraction"
    assert got.exceptAll(exp).count() == 0, "spurious extracted triples"


def test_selfref_triple(spark, pipeline_out):
    """Self-referential fact (analog of reference's recursive factorial call,
    tests/test_graph_connections.py:22-26)."""
    rows = (
        pipeline_out["triples"]
        .where(F.col("url") == "https://edge.example/selfref")
        .collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r.subj_surface, r.pred, r.obj_surface) == ("Acme Corp", "ACQUIRED", "Acme Corp")


def test_no_triples_from_fillers_or_edge_pages(spark, pipeline_out):
    bad = (
        pipeline_out["triples"]
        .where(
            F.col("url").isin(
                "https://edge.example/empty",
                "https://edge.example/boilerplate",
                "https://edge.example/malformed",
                "https://edge.example/nonutf8",
                "https://edge.example/dup",
            )
        )
        .count()
    )
    assert bad == 0


def test_defs_cover_all_entities(spark, corpus_dir, pipeline_out):
    """Every canonical variant receives a definitional sentence (the
    dictionary pre-scan must see every entity — E11 analog)."""
    ents = golden(spark, corpus_dir, "entities")
    n_variants = ents.select(F.explode("variants")).distinct().count()
    got = (
        pipeline_out["defs"]
        .select(F.lower(F.col("surface")).alias("s"))
        .distinct()
        .count()
    )
    assert got == n_variants


def test_links_exact_set(spark, corpus_dir, pipeline_out):
    got = pipeline_out["links"].select("url", "domain")
    exp = golden(spark, corpus_dir, "links").distinct()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
