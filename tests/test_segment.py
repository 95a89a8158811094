"""Sentence segmentation contract (stage 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.pipeline.segment import segment_stage


def _seg(spark, text: str) -> list[tuple[int, str]]:
    df = spark.createDataFrame([("u", text)], "url string, text_extracted string")
    return [(r.sent_id, r.sentence) for r in segment_stage(df).orderBy("sent_id").collect()]


def test_basic_split(spark):
    assert _seg(spark, "One sentence here. Another one there.") == [
        (0, "One sentence here."),
        (1, "Another one there."),
    ]


def test_initials_do_not_split(spark):
    got = _seg(spark, "A. Lovelace works at Acme Corp. Grace Hopper moved to Oslo.")
    assert got == [
        (0, "A. Lovelace works at Acme Corp."),
        (1, "Grace Hopper moved to Oslo."),
    ]


def test_anchor_tail_dropped_from_numbering(spark):
    got = _seg(spark, "First fact here. see ref3.example.org\nSecond fact here.")
    assert got == [(0, "First fact here."), (1, "Second fact here.")]


def test_empty_and_no_period(spark):
    assert _seg(spark, "") == []
    assert _seg(spark, "no trailing period") == []


def test_paragraphs_preserve_global_order(spark):
    got = _seg(spark, "Alpha beta gamma.\nDelta epsilon zeta. Eta theta iota.")
    assert [s for _, s in got] == [
        "Alpha beta gamma.",
        "Delta epsilon zeta.",
        "Eta theta iota.",
    ]
