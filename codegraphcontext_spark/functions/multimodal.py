"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque binary
columns next to typed metadata, and runs decode / feature-extraction as
Arrow-batched stages (``mapInPandas``) so bytes never round-trip through
per-row Python. The decode libraries (PIL/ffmpeg/etc.) are NOT in this
container, so the actual pixel/sample decode is stubbed behind
``decode_image_real`` (raises ``NotImplementedError``); everything around it —
schema, batch shape, partitioning, deterministic fake features — is real and
tested.

Design notes for scale:
  * ``mapInPandas`` keeps the binary column inside Arrow record batches
    (zero-copy to pandas, no Python-object per row).
  * ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory:
    batches of large blobs must be capped by *bytes*, so callers should
    repartition by size before decode (``repartition_for_blobs``).
  * Output features are fixed-width columns -> columnar downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, checksum string, "
    "fake_width int, fake_height int, decoder string"
)


def decode_image_real(blob: bytes) -> dict:
    """The real decoder seam (PIL/turbojpeg on a production cluster)."""
    raise NotImplementedError(
        "image decode libraries are not available in this environment; "
        "use decode_image_stub (deterministic fake) instead"
    )


def decode_image_stub(blob: bytes) -> dict:
    """Deterministic fake decode: features derived only from the bytes."""
    n = len(blob)
    return {
        "n_bytes": n,
        "checksum": hashlib.md5(blob).hexdigest(),
        "fake_width": n % 640,
        "fake_height": (n * 7) % 480,
        "decoder": "stub-v1",
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one pandas frame per Arrow batch; vectorized-ish
    loop over the batch (the per-blob work is the irreducible unit — a real
    decoder is C under the hood)."""
    for pdf in batches:
        feats = [decode_image_stub(b) for b in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def repartition_for_blobs(df: DataFrame, target_mb: int = 64) -> DataFrame:
    """Size-aware repartition so each Arrow batch of blobs stays bounded:
    partitions ~ total_bytes / target_mb (floor 1). At 100 TB this is the
    difference between streaming decode and executor OOM."""
    total = df.select(F.sum(F.length("payload"))).first()[0] or 0
    n = max(1, int(total / (target_mb * 1024 * 1024)))
    return df.repartition(n)


def decode_stage(df: DataFrame) -> DataFrame:
    """df(doc_id, payload:binary) -> typed feature columns via mapInPandas."""
    return df.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)
