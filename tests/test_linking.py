"""Entity-linking cascade tests — one per priority tier (SURVEY.md §7.2.4),
mirroring the reference's resolution semantics (graph_builder.py:262-300),
plus full-corpus agreement with the golden mention table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.datagen.vocab import resolve_mention

from .conftest import golden


# ---- pure-python cascade semantics (shared reference implementation) --------
A = ("aaaa", "org")
B = ("bbbb", "org")
C = ("cccc", "place")


def test_tier_unique():
    assert resolve_mention([A], ("org",), set()) == ("aaaa", "unique")


def test_tier_type():
    assert resolve_mention([A, C], ("place",), set()) == ("cccc", "type")


def test_tier_context():
    assert resolve_mention([A, B], ("org",), {"bbbb"}) == ("bbbb", "context")


def test_tier_fallback_min_id():
    assert resolve_mention([B, A], ("org",), set()) == ("aaaa", "fallback")


def test_unlinked():
    assert resolve_mention([], ("org",), set()) == (None, "unlinked")


def test_type_filter_narrows_before_context():
    # typed subset ambiguous -> context applies within the typed subset
    assert resolve_mention([A, B, C], ("org",), {"cccc", "bbbb"}) == ("bbbb", "context")


# ---- DataFrame cascade agrees with golden over the whole corpus -------------
def test_linked_mentions_match_golden(spark, corpus_dir, pipeline_out):
    cols = ["url", "sent_id", "surface", "entity_id", "tier"]
    got = pipeline_out["linked"].select(*cols).distinct()
    exp = golden(spark, corpus_dir, "mentions").select(*cols).distinct()
    missing = exp.exceptAll(got).count()
    extra = got.exceptAll(exp).count()
    assert missing == 0 and extra == 0, f"missing={missing} extra={extra}"


def test_all_tiers_exercised(spark, pipeline_out):
    tiers = {
        r.tier
        for r in pipeline_out["linked"].select("tier").distinct().collect()
    }
    assert {"unique", "type", "context"} <= tiers, tiers
