"""Byte-identical extraction contract (FIXTURES.md §5; north-rule invariant).

Direct Python invocation and the Spark mapInPandas stage must both reproduce
the golden text exactly, per url — the purity property of reference E1
(languages/python.py:100-124: parse is a pure function of file bytes)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.extract import extract_stage, extract_text

from .conftest import golden


def test_direct_extraction_byte_identical(corpus_dir):
    pages = pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    assert len(pages) > 0
    for row in pages:
        got = extract_text(row["html"])
        assert got == row["text"], f"mismatch for {row['url']!r}"


def test_spark_stage_matches_direct(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    out = extract_stage(pages, keep=("url", "text"))
    bad = out.where(F.col("text_extracted") != F.col("text"))
    assert bad.count() == 0


@pytest.mark.parametrize(
    "html,expected",
    [
        (b"", ""),
        (None, ""),
        (b"<html><body><nav>x</nav><footer>y</footer></body></html>", ""),
        (b"<p>Broken markup page <b>bold text</p><div>second line", "Broken markup page bold text\nsecond line"),
        (b"<p>caf\xe9 latte</p>", "caf� latte"),  # invalid utf-8 -> U+FFFD
        (b"<p>a &amp; b &lt;c&gt;</p>", "a & b <c>"),  # entity unescape
        (b"<main><p>one</p><p>two  three</p></main>", "one\ntwo three"),  # ws collapse
        (b"<script>var x = '<p>no</p>';</script><p>yes</p>", "yes"),
        (b"<head><title>drop me</title></head><body><p>keep</p></body>", "keep"),
    ],
)
def test_edge_cases(html, expected):
    assert extract_text(html) == expected


def test_latest_snapshot_wins(spark, corpus_dir, pipeline_out):
    row = (
        pipeline_out["docs"]
        .where(F.col("url") == "https://edge.example/dup")
        .collect()
    )
    assert len(row) == 1
    assert row[0].text_extracted == "New snapshot body."


def test_equal_ts_tie_breaks_on_html_md5(spark, corpus_dir, pipeline_out):
    """Two snapshots with identical warc_ts: the winner is the one with the
    lexicographically-max md5(html) — the shared deterministic tie-break used
    by the full build, the links stage, and the incremental delta fold."""
    import hashlib

    url = "https://edge.example/tie"
    snaps = pq.read_table(f"{corpus_dir}/pages.parquet").to_pylist()
    cand = [r for r in snaps if r["url"] == url]
    assert len(cand) == 2 and cand[0]["warc_ts"] == cand[1]["warc_ts"]
    expected = max(cand, key=lambda r: hashlib.md5(r["html"]).hexdigest())
    rows = pipeline_out["docs"].where(F.col("url") == url).collect()
    assert len(rows) == 1
    assert rows[0].text_extracted == expected["text"]
    # the links stage picked the SAME snapshot
    link_rows = pipeline_out["links"].where(F.col("url") == url).collect()
    assert {r.domain for r in link_rows} == {
        d for d in expected["text"].split() if d.startswith("ref")
    }


def test_duplinks_only_winner_links_survive(spark, pipeline_out):
    rows = (
        pipeline_out["links"]
        .where(F.col("url") == "https://edge.example/duplinks")
        .collect()
    )
    assert {r.domain for r in rows} == {"ref2.example.org"}
