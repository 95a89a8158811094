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


def test_language_pack_dispatch(spark):
    """A sentence pairs only with ITS language's pattern pack: the German
    phrase extracts on a de-tagged row, the same English sentence on a
    de-tagged row extracts nothing (the reference parses a .js file with the
    JS parser only, graph_builder.py:58-61), and an unknown/empty lang tag
    falls back to the en pack."""
    from codegraphcontext_spark.pipeline.triples import patterns_df, triples_stage

    rows = [
        ("u1", 0, "Acme Corp übernahm Globex Industries.", "de"),
        ("u2", 0, "Acme Corp acquired Globex Industries.", "de"),  # en on de page
        ("u3", 0, "Ada Lovelace a fondé Acme Corp.", "fr"),
        ("u4", 0, "Acme Corp acquired Globex Industries.", ""),  # fallback -> en
        ("u5", 0, "Acme Corp übernahm Globex Industries.", "en"),  # de on en page
    ]
    sents = spark.createDataFrame(
        rows, "url string, sent_id int, sentence string, lang string"
    )
    got = {
        (r.url, r.pred, r.subj_surface, r.obj_surface)
        for r in triples_stage(sents, patterns_df(spark)).collect()
    }
    assert got == {
        ("u1", "ACQUIRED", "Acme Corp", "Globex Industries"),
        ("u3", "FOUNDED", "Ada Lovelace", "Acme Corp"),
        ("u4", "ACQUIRED", "Acme Corp", "Globex Industries"),
    }


def test_defs_language_packs(spark):
    """Definitional sentences parse per language pack, mapping translated
    nouns to the same entity types; cross-language copulas never parse."""
    from codegraphcontext_spark.pipeline.triples import defs_stage

    rows = [
        ("u1", 0, "Acme Corp ist eine Firma.", "de"),
        ("u2", 0, "Acme Corp is a company.", "de"),  # en def on de page: no
        ("u3", 0, "Zurich est un lieu.", "fr"),
        ("u4", 0, "Grace Hopper is a person.", ""),  # fallback -> en
    ]
    sents = spark.createDataFrame(
        rows, "url string, sent_id int, sentence string, lang string"
    )
    got = {(r.url, r.surface, r.etype) for r in defs_stage(sents).collect()}
    assert got == {
        ("u1", "Acme Corp", "org"),
        ("u3", "Zurich", "place"),
        ("u4", "Grace Hopper", "person"),
    }


def test_non_english_pages_materialize_edges(spark, pipeline_out):
    """The corpus's de/fr pages (datagen/pages.py lang rotation) yield real
    open-predicate graph edges — the multi-language seam is exercised end to
    end, not just present."""
    docs = pipeline_out["docs"].select("url", "lang")
    occ = pipeline_out["edge_occurrences"].where(
        ~F.col("pred").isin("MENTIONS", "LINKS_TO", "HAS_TYPE")
    )
    by_lang = {r.lang: r.n for r in occ.join(docs, "url")
               .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang.get("de", 0) > 0
    assert by_lang.get("fr", 0) > 0
