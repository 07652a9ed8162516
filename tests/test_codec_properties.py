"""Property-based codec tests (hypothesis): the Gorilla XOR float codec
and delta-of-delta timestamp codec must round-trip ANY input bit-exactly
— including NaN payloads, infinities, subnormals, and adversarial delta
patterns — and the block variants must agree with the scalar encoders."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sits_spark import codec

finite = st.floats(allow_nan=False, allow_infinity=False, width=64)
anyf = st.one_of(
    finite,
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(float("-inf")),
    st.just(0.0),
    st.just(-0.0),
    st.just(5e-324),  # smallest subnormal
)


@settings(max_examples=200, deadline=None)
@given(st.lists(anyf, min_size=0, max_size=64))
def test_xor_roundtrip_any_doubles(vals):
    arr = np.array(vals, dtype=np.float64)
    out = codec.decode_xor(codec.encode_xor(arr))
    assert np.array_equal(
        np.asarray(out).view(np.uint64), arr.view(np.uint64)
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**15), max_value=10**15),
        min_size=0,
        max_size=64,
    )
)
def test_ts_roundtrip_any_deltas(ts):
    arr = np.array(sorted(ts), dtype=np.int64)
    out = codec.decode_ts_d2(codec.encode_ts_d2(arr))
    assert np.array_equal(np.asarray(out, dtype=np.int64), arr)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.lists(anyf, min_size=1, max_size=20), min_size=1, max_size=8)
)
def test_xor_blocks_decode_bit_exact(blocks):
    """The block encoder's window-reuse policy deliberately differs from
    the scalar one (reuse on IDENTICAL window, not on fits — codec.py
    policy note), so bitstreams may differ; the invariant is that the
    scalar decoder reads every block back bit-exactly."""
    flat = np.array([v for b in blocks for v in b], dtype=np.float64)
    bounds = np.cumsum([0] + [len(b) for b in blocks]).astype(np.int64)
    got = codec.encode_xor_blocks(flat, bounds)
    for i, b in enumerate(blocks):
        arr = np.array(b, dtype=np.float64)
        out = np.asarray(codec.decode_xor(got[i]))
        assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=10**10), min_size=1, max_size=20
        ),
        min_size=1,
        max_size=8,
    )
)
def test_ts_blocks_agree_with_scalar(blocks):
    blocks = [sorted(b) for b in blocks]
    flat = np.array([v for b in blocks for v in b], dtype=np.int64)
    bounds = np.cumsum([0] + [len(b) for b in blocks]).astype(np.int64)
    got = codec.encode_ts_d2_blocks(flat, bounds)
    for i, b in enumerate(blocks):
        want = codec.encode_ts_d2(np.array(b, dtype=np.int64))
        assert got[i] == want
