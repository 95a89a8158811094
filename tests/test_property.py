"""Property-based tests (hypothesis) over the engine's pure seams — an
upgrade over the reference's test strategy, which has no randomized tests
(SURVEY.md §5.7). Every property here runs WITHOUT Spark: these are the
frozen per-row functions whose purity the distributed stages inherit
(extract_stage is extract_text mapped over Arrow batches; the streaming
sessionizer is _session_fn over grouped batches)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from codegraphcontext_spark.datagen.vocab import (
    char_3grams,
    jaccard,
    norm_surface,
)
from codegraphcontext_spark.extract.html_extract import extract_text
from codegraphcontext_spark.streaming.sessionize import (
    SESSION_GAP_S,
    _session_fn,
)

# --------------------------------------------------------------------------
# extract_text: total, deterministic, idempotent-normal-form
# --------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_text_total_and_deterministic(blob):
    """Any byte string (malformed markup, invalid UTF-8, binary junk) must
    extract without raising, byte-identically on repeat calls."""
    a = extract_text(blob)
    b = extract_text(blob)
    assert isinstance(a, str) and a == b


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_extract_text_output_is_whitespace_normal(s):
    """Extracted text never carries leading/trailing or doubled whitespace —
    the normal form the byte-identical contract depends on."""
    out = extract_text(f"<html><body><p>{s}</p></body></html>")
    assert out == " ".join(out.split())


# --------------------------------------------------------------------------
# similarity primitives: the canonicalizer's metric axioms
# --------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=64), st.text(max_size=64))
def test_jaccard_axioms(a, b):
    ga, gb = char_3grams(a), char_3grams(b)
    j = jaccard(ga, gb)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(gb, ga)  # symmetric
    if norm_surface(a) == norm_surface(b):
        # identical normal forms are always a perfect match (or both empty)
        assert j == 1.0 or (not ga and not gb)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=64))
def test_norm_surface_idempotent(s):
    assert norm_surface(norm_surface(s)) == norm_surface(s)


# --------------------------------------------------------------------------
# sessionizer: the streaming state function vs a direct reference
# --------------------------------------------------------------------------


class _FakeState:
    """Minimal GroupState stand-in: enough for _session_fn's contract."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _reference_sessions(events):
    """Plain-Python gap sessionization: events = [(ts_s, value)] sorted."""
    sessions = []
    cur = None
    for ts, v in events:
        if cur is None:
            cur = [ts, ts, 1, v]
        elif ts - cur[1] > SESSION_GAP_S:
            sessions.append(tuple(cur))
            cur = [ts, ts, 1, v]
        else:
            cur[1] = ts
            cur[2] += 1
            cur[3] += v
    return sessions, cur  # (closed, open)


_T0 = dt.datetime(2025, 1, 1)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6 * SESSION_GAP_S),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_session_fn_matches_reference(raw):
    """Feeding ALL events as one batch, the stateful function must emit
    exactly the reference's closed sessions and hold the open tail in
    state — for arbitrary event timings (value ints keep sums exact)."""
    events = sorted((ts, float(v)) for ts, v in raw)
    pdf = pd.DataFrame(
        {
            "event_id": range(len(events)),
            "ts": [_T0 + dt.timedelta(seconds=ts) for ts, _ in events],
            "user_id": [7] * len(events),
            "event_type": ["click"] * len(events),
            "value": [v for _, v in events],
            "props": ["{}"] * len(events),
        }
    )
    state = _FakeState()
    out = list(_session_fn((7,), iter([pdf]), state))
    closed_ref, open_ref = _reference_sessions(events)

    got_closed = []
    for frame in out:
        for r in frame.itertuples():
            got_closed.append(
                (
                    int((r.session_start - _T0).total_seconds()),
                    int((r.session_end - _T0).total_seconds()),
                    int(r.n_events),
                    float(r.sum_value),
                )
            )
    assert got_closed == [tuple(c) for c in closed_ref]
    assert state.exists
    s0, s1, n, sv = state.get
    assert (s0 - int(s0 % 1_000_000_000)) >= 0  # epoch-ns longs
    assert (
        int((s0 - _ns(_T0)) / 1_000_000_000),
        int((s1 - _ns(_T0)) / 1_000_000_000),
        n,
        sv,
    ) == (open_ref[0], open_ref[1], open_ref[2], open_ref[3])


def _ns(t: dt.datetime) -> int:
    return int(pd.Timestamp(t).value)


# --------------------------------------------------------------------------
# byte features: the mapInPandas worker vs a plain-Python reference
# --------------------------------------------------------------------------


def _reference_nibble_features(b: bytes) -> tuple[int, int, int]:
    """Slow, obviously-correct reference: Counter over explicit nibbles."""
    import math
    from collections import Counter

    nibs = []
    for byte in b:
        nibs.append(byte >> 4)
        nibs.append(byte & 0x0F)
    counts = Counter(nibs)
    total = len(nibs)
    ent = -sum(
        (c / total) * math.log2(c / total) for c in counts.values()
    )
    return len(b), len(counts), int(math.floor(ent * 1e6 + 0.5))


@settings(max_examples=300, deadline=None)
@given(st.lists(st.binary(min_size=1, max_size=512), min_size=1, max_size=8))
def test_byte_features_match_reference(blobs):
    """The vectorized numpy worker must agree with the per-nibble Counter
    reference on arbitrary payloads (entropy to the same scaled int)."""
    from codegraphcontext_spark.functions.multimodal import (
        _byte_feature_batches,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(len(blobs)), "payload": blobs}
    )
    out = pd.concat(list(_byte_feature_batches(iter([pdf]))))
    assert len(out) == len(blobs)
    for row, blob in zip(out.itertuples(), blobs):
        n, nd, ent = _reference_nibble_features(blob)
        assert (row.n_bytes, row.n_distinct_nibbles,
                row.nibble_entropy_x1e6) == (n, nd, ent)


# --------------------------------------------------------------------------
# streaming transitions fold: batch-split invariance (mergeable state)
# --------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=30,
    ),
    st.data(),
)
def test_transition_fold_is_batch_split_invariant(seq, data):
    """Folding a per-user event sequence through _trans_fn must emit the
    SAME pair multiset no matter how the (time-ordered) sequence is cut
    into micro-batches — the property that makes the streaming op equal
    its batch twin across any trigger cadence and restart point."""
    from codegraphcontext_spark.streaming.transitions import _trans_fn

    events = [
        {"event_id": i, "ts": i * 1000, "event_type": t}
        for i, (_, t) in enumerate(seq)
    ]

    def run(batches):
        state, out = _FakeState(), []
        for b in batches:
            pdf = pd.DataFrame(b) if b else pd.DataFrame(
                columns=["event_id", "ts", "event_type"]
            )
            for res in _trans_fn((7,), [pdf], state):
                out += list(zip(res["from_type"], res["to_type"]))
        return out

    whole = run([events])
    # random cut points, preserving time order across batches
    n_cuts = data.draw(st.integers(0, min(5, len(events))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, len(events)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    parts, prev = [], 0
    for c in cuts + [len(events)]:
        parts.append(events[prev:c])
        prev = c
    split = run(parts)
    assert split == whole
