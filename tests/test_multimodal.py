"""Multimodal plumbing: decode stubs + frame sampling (schema, batch shape,
caps, determinism). The decode libraries are absent from this container, so
the byte-derived fakes are the tested path; the real-decoder seams must stay
explicit NotImplementedError."""

from __future__ import annotations

import hashlib

import pytest

from codegraphcontext_spark.functions.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    MAX_SAMPLED,
    decode_image_real,
    frame_sample_stage,
    sample_frames_real,
)


def _frames_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def test_real_decoder_seams_are_explicit():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"x")
    with pytest.raises(NotImplementedError):
        sample_frames_real(b"x")


def test_frame_sample_shape_and_hashes(spark):
    blob = bytes(range(256)) * 5  # 1280 bytes -> 5 frames, sampled idx 0, 4
    out = frame_sample_stage(_frames_df(spark, [(1, blob)])).collect()
    assert [(r.frame_idx, r.frame_bytes) for r in out] == [(0, 256), (4, 256)]
    assert out[0].frame_md5 == hashlib.md5(blob[:256]).hexdigest()
    assert out[1].frame_md5 == hashlib.md5(blob[4 * 256:5 * 256]).hexdigest()


def test_frame_sample_tail_frame_is_short(spark):
    blob = b"a" * (FRAME_BYTES * FRAME_STRIDE + 10)  # tail frame = 10 bytes
    out = {r.frame_idx: r for r in
           frame_sample_stage(_frames_df(spark, [(1, blob)])).collect()}
    assert out[FRAME_STRIDE].frame_bytes == 10
    assert out[FRAME_STRIDE].frame_md5 == hashlib.md5(b"a" * 10).hexdigest()


def test_frame_sample_cap_and_empty(spark):
    big = b"z" * (FRAME_BYTES * FRAME_STRIDE * (MAX_SAMPLED + 5))
    rows = frame_sample_stage(
        _frames_df(spark, [(1, big), (2, b"")])
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc.get(1, [])) == MAX_SAMPLED  # per-doc fan-out bounded
    assert 2 not in by_doc  # empty payload -> no rows


def test_frame_sample_deterministic(spark):
    rows = [(i, bytes([i % 251]) * (100 + 97 * i)) for i in range(20)]
    a = sorted(map(tuple, frame_sample_stage(_frames_df(spark, rows)).collect()))
    b = sorted(map(tuple, frame_sample_stage(_frames_df(spark, rows)).collect()))
    assert a == b
