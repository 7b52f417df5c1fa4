"""Codec round-trip: property tests (SURVEY.md §5.2 item 1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docinsight_ray.codec import (
    decode_posting,
    delta_decode,
    delta_encode,
    encode_posting,
    varbyte_decode,
    varbyte_encode,
    varbyte_lengths,
)


def test_varbyte_known_values():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    buf = varbyte_encode(v)
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    np.testing.assert_array_equal(varbyte_decode(buf), v)
    assert varbyte_lengths(v).sum() == len(buf)


def test_varbyte_empty():
    assert varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varbyte_roundtrip_property(values):
    v = np.array(values, dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(v), v.size), v)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**63), min_size=1, max_size=500))
def test_delta_roundtrip_property(ids):
    v = np.array(sorted(ids), dtype=np.uint64)
    np.testing.assert_array_equal(delta_decode(delta_encode(v)), v)


def test_delta_rejects_nonincreasing():
    with pytest.raises(ValueError):
        delta_encode(np.array([3, 3], dtype=np.uint64))
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 2], dtype=np.uint64))


def test_posting_roundtrip_and_blockmax():
    rng = np.random.default_rng(0)
    n = 1000
    doc_ids = np.cumsum(rng.integers(1, 50, size=n).astype(np.uint64))
    tfs = rng.integers(1, 30, size=n).astype(np.uint64)
    w = rng.random(n)
    doc_vb, tf_vb, bmax, blast = encode_posting(doc_ids, tfs, w, block_size=128)
    d2, t2 = decode_posting(doc_vb, tf_vb, n)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)
    assert bmax.size == blast.size == (n + 127) // 128
    # block maxima dominate their block
    for bi in range(bmax.size):
        seg = w[bi * 128 : (bi + 1) * 128]
        assert np.float32(seg.max()) <= bmax[bi] + 1e-6
        assert blast[bi] == doc_ids[min((bi + 1) * 128, n) - 1]
