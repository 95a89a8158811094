"""Stage 1 — deterministic boilerplate-stripped HTML -> text extraction.

This is the engine's FROZEN reference extractor: a pure, stdlib-only function of the
raw ``html`` bytes. The north-rule contract is "byte-identical extracted text per url",
which mirrors the reference's determinism property — its per-file parse is a pure
function of file bytes (reference ``languages/python.py:100-124``: tree-sitter parse of
``f.read()``, no time/randomness). Do NOT change the behavior of :func:`extract_text`
without bumping ``EXTRACTOR_VERSION`` and regenerating golden fixtures.

The Spark stage (:func:`extract_stage`) applies the same function over Arrow record
batches via ``mapInPandas`` — no per-row Python UDFs — so the distributed output is
byte-identical to direct invocation (asserted in tests/test_extract.py).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

EXTRACTOR_VERSION = 1

# Tags whose entire subtree is boilerplate/non-content.
_DROP_SUBTREE = frozenset(
    {"script", "style", "noscript", "template", "svg", "head",
     "nav", "header", "footer", "aside", "iframe", "form", "button"}
)
# Void elements never get close tags; they must not affect the drop-depth stack.
_VOID = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)
# Tags that terminate the current text line (block-level boundary).
_BLOCK = frozenset(
    {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
     "table", "tr", "td", "th", "blockquote", "pre", "article", "section",
     "main", "br", "hr", "title", "figure", "figcaption", "dl", "dt", "dd"}
)


class _TextExtractor(HTMLParser):
    """Streaming extractor: accumulate text chunks per block line, skipping
    boilerplate subtrees. html.parser is tolerant of malformed markup (never
    raises), which covers the reference's syntax-error-file edge case
    (reference tests/test_graph_indexing.py:356 — broken input must not crash)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._lines: list[str] = []
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._buf:
            line = " ".join("".join(self._buf).split())
            self._buf = []
            if line:
                self._lines.append(line)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREE:
            # Tolerate stray close tags in malformed input.
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag in _BLOCK:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth == 0 and data:
            self._buf.append(data)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._lines)


def extract_text(html: bytes | str | None) -> str:
    """Pure deterministic HTML -> text. bytes are decoded utf-8 with
    errors='replace' (deterministic for arbitrary byte junk)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if not html:
        return ""
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser should never raise, but the pipeline contract is
        # "malformed input must not crash" — fail to whatever was parsed.
        pass
    return parser.result()


def extract_stage(pages_df, keep: tuple[str, ...] = ("url", "warc_ts", "lang")):
    """pages(url, warc_ts, html, ...) -> (keep..., text_extracted).

    Arrow-batched mapInPandas; narrow map (no shuffle), pipelines with the
    downstream segmenter. CRITICAL at scale: the ``html`` blob enters the
    Python worker but is NOT in the output schema — shipping it back through
    Arrow costs ~20x the extraction itself (measured: 60s vs 3s on a 450 MB
    corpus). Only the small ``keep`` columns ride along.
    """
    from pyspark.sql import types as T

    keep_cols = [c for c in keep if c in pages_df.columns]
    in_schema = {f.name: f for f in pages_df.schema.fields}
    out_schema = T.StructType(
        [in_schema[c] for c in keep_cols]
        + [T.StructField("text_extracted", T.StringType(), nullable=False)]
    )

    def _batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = pdf[keep_cols].copy()
            out["text_extracted"] = [extract_text(h) for h in pdf["html"]]
            yield out

    return pages_df.select(*keep_cols, "html").mapInPandas(_batches, schema=out_schema)
