"""Stage 2 — sentence segmentation.

Entirely JVM-side (split / transform / flatten / posexplode — whole-stage
codegen, no Python): the deterministic segmentation contract is

  * paragraphs = lines of the extracted text (split on '\\n'),
  * sentence boundary = whitespace preceded by a period that follows two
    lowercase letters (so initials like "A. Lovelace" do NOT split —
    Java regex ``(?<=[a-z]{2}\\.)\\s+``),
  * only chunks ending with '.' count as sentences (trailing link-anchor
    text like "see ref3.example.org" is dropped from sentence numbering),
  * sent_id = 0-based position over the kept sentences of the whole doc.

This is a narrow map — it pipelines with extraction, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SENT_SPLIT = r"(?<=[a-z]{2}\.)\s+"


def sentences_expr(text_col):
    """array<string> of sentences for a text column (pure Catalyst expr)."""
    paras = F.split(text_col, "\n")
    chunks = F.flatten(F.transform(paras, lambda p: F.split(p, _SENT_SPLIT)))
    return F.filter(chunks, lambda s: s.endswith("."))


def segment_stage(docs: DataFrame, text_col: str = "text_extracted") -> DataFrame:
    """docs(url, <text_col>, ...) -> sentences(url, sent_id, sentence[, lang]).

    The page's lang tag rides along (when present) so the extraction stage
    can dispatch the per-language pattern pack — the analog of the
    reference's per-file-extension parser choice (graph_builder.py:58-61)."""
    cols = ["url"] + (["lang"] if "lang" in docs.columns else [])
    return docs.select(
        *cols,
        F.posexplode(sentences_expr(F.col(text_col))).alias("sent_id", "sentence"),
    )
