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
        # NULL payloads are skipped (not crashed on): at 100 TB a bad row
        # must not kill the stage. The oracle filters NULL text identically.
        mask = pdf["payload"].notna()
        feats = [decode_image_stub(b) for b in pdf.loc[mask, "payload"]]
        out = pd.DataFrame(
            feats,
            columns=["n_bytes", "checksum", "fake_width", "fake_height",
                     "decoder"],
        )
        out.insert(0, "doc_id", pdf.loc[mask, "doc_id"].values)
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


# ---------------------------------------------------------------------------
# Frame sampling (video/audio analog): 1 blob -> N sampled frame rows.
# ---------------------------------------------------------------------------
FRAME_BYTES = 256     # fake frame size (a real decoder derives it from headers)
FRAME_STRIDE = 4      # sample every 4th frame
MAX_SAMPLED = 16      # per-doc cap — bounds output rows per blob

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_md5 string, frame_bytes int"
)


def sample_frames_real(blob: bytes) -> list:
    """The real frame-extraction seam (ffmpeg/pyav on a production cluster)."""
    raise NotImplementedError(
        "video decode libraries are not available in this environment; "
        "use the deterministic byte-slice sampler in frame_sample_stage"
    )


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: explode each blob into its sampled frame rows.
    The fake "frame" is a FRAME_BYTES byte slice; a real decoder replaces the
    slicing with keyframe extraction but keeps this exact row shape, so the
    downstream schema/partitioning is production-real."""
    for pdf in batches:
        doc_ids, idxs, md5s, sizes = [], [], [], []
        for did, blob in zip(pdf["doc_id"], pdf["payload"]):
            if blob is None:
                continue  # NULL payload: skip, don't kill the stage
            b = bytes(blob)
            n = len(b)
            if n == 0:
                continue
            n_frames = -(-n // FRAME_BYTES)
            for k, idx in enumerate(range(0, n_frames, FRAME_STRIDE)):
                if k >= MAX_SAMPLED:
                    break
                sl = b[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                doc_ids.append(did)
                idxs.append(idx)
                md5s.append(hashlib.md5(sl).hexdigest())
                sizes.append(len(sl))
        yield pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "frame_idx": pd.Series(idxs, dtype="int64"),
            "frame_md5": pd.Series(md5s, dtype="object"),
            "frame_bytes": pd.Series(sizes, dtype="int32"),
        })


def frame_sample_stage(df: DataFrame) -> DataFrame:
    """df(doc_id, payload:binary) -> one row per sampled frame.

    One blob in, ≤ MAX_SAMPLED rows out — the fan-out is bounded per row, so
    at 100 TB the stage's output size is a fixed multiple of its input row
    count regardless of blob sizes (size-aware repartition upstream via
    ``repartition_for_blobs`` keeps Arrow batches bounded)."""
    return df.mapInPandas(_frame_batches, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Byte-level feature extraction: REAL computation, no decoder needed.
# ---------------------------------------------------------------------------
BYTE_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes int, n_distinct_nibbles int, "
    "nibble_entropy_x1e6 bigint"
)


def _byte_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: numpy bincount over each blob's 4-bit nibbles.

    Unlike the decode/frame stages this is NOT a stub — byte-distribution
    features (entropy ~ compressibility, distinct-symbol count) need no media
    library and are what a curation pipeline uses to route opaque blobs
    (ciphertext/compressed vs structured) before paying for a real decode.
    Entropy is scaled to int (x1e6, half-up like SQL ROUND) for float-safe
    downstream hashing."""
    import math

    import numpy as np

    for pdf in batches:
        doc_ids, sizes, distinct, ents = [], [], [], []
        for did, blob in zip(pdf["doc_id"], pdf["payload"]):
            if blob is None:
                continue  # NULL payload: skip, don't kill the stage
            b = bytes(blob)
            if not b:
                continue  # no distribution to summarize; mirror oracle filter
            arr = np.frombuffer(b, dtype=np.uint8)
            counts = np.bincount(arr >> 4, minlength=16) + np.bincount(
                arr & 0x0F, minlength=16
            )
            p = counts[counts > 0] / float(counts.sum())
            ent = float(-(p * np.log2(p)).sum())
            doc_ids.append(did)
            sizes.append(arr.size)
            distinct.append(int((counts > 0).sum()))
            ents.append(int(math.floor(ent * 1e6 + 0.5)))
        yield pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "n_bytes": pd.Series(sizes, dtype="int32"),
            "n_distinct_nibbles": pd.Series(distinct, dtype="int32"),
            "nibble_entropy_x1e6": pd.Series(ents, dtype="int64"),
        })


def byte_features_stage(df: DataFrame) -> DataFrame:
    """df(doc_id, payload:binary) -> byte-distribution features, one row per
    non-empty blob. Arrow-batched numpy; O(bytes) per blob, fixed-width
    output regardless of blob size."""
    return df.mapInPandas(_byte_feature_batches, schema=BYTE_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Resize (image-preprocessing analog): metadata math real, pixel work seamed.
# ---------------------------------------------------------------------------
RESIZE_TARGET = 224  # the standard vision-model input side

RESIZE_SCHEMA = (
    "doc_id bigint, fake_width int, fake_height int, "
    "out_width int, out_height int, resizer string"
)


def resize_image_real(pixels, width: int, height: int):
    """The real resampling seam (PIL/opencv on a production cluster)."""
    raise NotImplementedError(
        "image resample libraries are not available in this environment; "
        "use resize_stage's deterministic dimension math instead"
    )


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: aspect-preserving fit into RESIZE_TARGET² —
    vectorized integer math over the whole Arrow batch (the real pixel
    resample slots in per row at the ``resize_image_real`` seam, keeping this
    exact output shape)."""
    import numpy as np

    for pdf in batches:
        w = pdf["fake_width"].to_numpy(np.int64)
        h = pdf["fake_height"].to_numpy(np.int64)
        side = np.maximum(w, h)
        safe = np.maximum(side, 1)  # avoid /0; masked below
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "fake_width": pd.Series(w, dtype="int32"),
            "fake_height": pd.Series(h, dtype="int32"),
            "out_width": pd.Series(
                np.where(side > 0, w * RESIZE_TARGET // safe, 0), dtype="int32"
            ),
            "out_height": pd.Series(
                np.where(side > 0, h * RESIZE_TARGET // safe, 0), dtype="int32"
            ),
            "resizer": "stub-v1",
        })


def resize_stage(df: DataFrame) -> DataFrame:
    """df(doc_id, fake_width, fake_height, ...) -> target dims preserving
    aspect ratio (long side -> RESIZE_TARGET, floor division). Degenerate
    0×N inputs resize to 0×0 rather than raising — at 100 TB a bad blob
    must not kill the stage."""
    return df.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-style blob fingerprint (aHash over the nibble histogram):
# real numpy math, no media library needed — the dedup analog of the
# byte-features routing stage.
# ---------------------------------------------------------------------------
PHASH_SCHEMA = "doc_id bigint, phash bigint, n_bytes int"


def _phash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: 16-bit average-hash over each blob's nibble
    histogram — bit i set when nibble i occurs above the uniform mean
    (count*16 > total), the aHash thresholding rule applied to the byte
    distribution instead of pixel intensities. Identical blobs collide
    exactly; near-identical payloads (same content, small edits) land in
    the same bucket with high probability because the histogram moves
    slowly under small edits."""
    import numpy as np

    for pdf in batches:
        doc_ids, hashes, sizes = [], [], []
        for did, blob in zip(pdf["doc_id"], pdf["payload"]):
            if blob is None:
                continue
            b = bytes(blob)
            if not b:
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            counts = np.bincount(arr >> 4, minlength=16) + np.bincount(
                arr & 0x0F, minlength=16
            )
            total = int(counts.sum())
            bits = (counts.astype(np.int64) * 16) > total
            h = int((bits.astype(np.int64) << np.arange(16)).sum())
            doc_ids.append(did)
            hashes.append(h)
            sizes.append(arr.size)
        yield pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "phash": pd.Series(hashes, dtype="int64"),
            "n_bytes": pd.Series(sizes, dtype="int32"),
        })


def phash_stage(df: DataFrame) -> DataFrame:
    """df(doc_id, payload:binary) -> (doc_id, phash, n_bytes), one row per
    non-empty blob. Arrow-batched numpy; the fingerprint is 16 bits, so
    bucketing by it is a bounded-cardinality groupBy."""
    return df.mapInPandas(_phash_batches, schema=PHASH_SCHEMA)
