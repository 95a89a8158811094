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
    RESIZE_TARGET,
    byte_features_stage,
    decode_image_real,
    decode_stage,
    frame_sample_stage,
    resize_image_real,
    resize_stage,
    sample_frames_real,
)


def _frames_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def test_real_decoder_seams_are_explicit():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"x")
    with pytest.raises(NotImplementedError):
        sample_frames_real(b"x")
    with pytest.raises(NotImplementedError):
        resize_image_real(None, 2, 2)


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


def test_byte_features_known_values(spark):
    # b"\x00" -> nibbles {0,0}: entropy 0, 1 distinct symbol.
    # b"\x01" -> nibbles {0,1}: entropy 1 bit exactly.
    # 256-byte full range -> uniform nibble distribution: entropy 4 bits.
    rows = [(1, b"\x00"), (2, b"\x01"), (3, bytes(range(256))), (4, b"")]
    out = {r.doc_id: r for r in
           byte_features_stage(_frames_df(spark, rows)).collect()}
    assert out[1].nibble_entropy_x1e6 == 0
    assert out[1].n_distinct_nibbles == 1
    assert out[2].nibble_entropy_x1e6 == 1_000_000
    assert out[2].n_distinct_nibbles == 2
    assert out[3].nibble_entropy_x1e6 == 4_000_000
    assert out[3].n_distinct_nibbles == 16
    assert out[3].n_bytes == 256
    assert 4 not in out  # empty payload -> no row (mirrors the oracle filter)


def test_null_payload_skipped_not_crashed(spark):
    """A NULL payload row must be skipped by every blob worker, not kill the
    stage (and the oracles filter NULL text identically)."""
    df = _frames_df(spark, [(1, b"ok"), (2, None)])
    assert {r.doc_id for r in byte_features_stage(df).collect()} == {1}
    assert {r.doc_id for r in frame_sample_stage(df).collect()} == {1}
    assert {r.doc_id for r in decode_stage(df).collect()} == {1}


def test_byte_features_deterministic(spark):
    rows = [(i, bytes([(i * 37 + j) % 256 for j in range(50 + i)]))
            for i in range(30)]
    a = sorted(map(tuple, byte_features_stage(_frames_df(spark, rows)).collect()))
    b = sorted(map(tuple, byte_features_stage(_frames_df(spark, rows)).collect()))
    assert a == b


def test_resize_aspect_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, 640, 480), (2, 100, 200), (3, 0, 123), (4, 224, 224), (5, 0, 0)],
        "doc_id bigint, fake_width int, fake_height int",
    )
    out = {r.doc_id: r for r in resize_stage(df).collect()}
    # long side -> RESIZE_TARGET, short side floor-scaled
    assert (out[1].out_width, out[1].out_height) == (RESIZE_TARGET, 168)
    assert (out[2].out_width, out[2].out_height) == (112, RESIZE_TARGET)
    # zero width scales to zero; the nonzero side still hits the target
    assert (out[3].out_width, out[3].out_height) == (0, RESIZE_TARGET)
    assert (out[4].out_width, out[4].out_height) == (RESIZE_TARGET, RESIZE_TARGET)
    # fully degenerate 0x0 resizes to 0x0 instead of raising
    assert (out[5].out_width, out[5].out_height) == (0, 0)
    assert all(r.resizer == "stub-v1" for r in out.values())


def test_resize_chains_from_decode(spark):
    # The production composition: decode (stub) -> resize, one Arrow pipeline.
    blobs = _frames_df(spark, [(1, b"x" * 1000), (2, b"y" * 640)])
    out = {r.doc_id: r for r in resize_stage(
        decode_stage(blobs).select("doc_id", "fake_width", "fake_height")
    ).collect()}
    assert out[1].fake_width == 1000 % 640 and out[1].fake_height == 7000 % 480
    # 640-byte blob: fake_width = 0 -> degenerate path via the real chain
    assert out[2].fake_width == 0
    assert (out[2].out_width, out[2].out_height) == (0, RESIZE_TARGET)


def test_phash_stage_null_and_empty_blobs_skipped(spark):
    """The fingerprint stage mirrors byte_features_stage's null/empty
    discipline (a None payload must not kill the Arrow batch), identical
    blobs collide, and the hash stays within 16 bits."""
    from pyspark.sql import functions as F

    from codegraphcontext_spark.functions.multimodal import phash_stage

    df = spark.createDataFrame(
        [
            (1, bytearray(b"hello world")),
            (2, bytearray(b"hello world")),
            (3, None),
            (4, bytearray(b"")),
            (5, bytearray(b"completely different payload bytes!")),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in phash_stage(df).collect()}
    assert set(out) == {1, 2, 5}
    assert out[1].phash == out[2].phash
    assert 0 <= out[1].phash < (1 << 16)
    assert out[1].n_bytes == 11
