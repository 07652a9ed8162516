"""Gorilla codec round-trip tests (FIXTURES.md packed tier)."""

import numpy as np
import pytest

from sits_spark import codec


@pytest.mark.parametrize("n", [0, 1, 2, 3, 100])
def test_ts_roundtrip_sizes(n):
    rng = np.random.default_rng(n)
    ts = np.cumsum(rng.integers(1, 100, n)) + 1_735_689_600 if n else np.array([], dtype=np.int64)
    out = codec.decode_ts_d2(codec.encode_ts_d2(ts))
    np.testing.assert_array_equal(out, np.asarray(ts, dtype=np.int64))


def test_ts_regular_grid_compresses_hard():
    ts = 1_735_689_600 + 60 * np.arange(1000, dtype=np.int64)
    blob = codec.encode_ts_d2(ts)
    # constant delta -> 1 bit per point after the header
    assert len(blob) < 8 * 2 + 4 + 1000 // 8 + 8
    np.testing.assert_array_equal(codec.decode_ts_d2(blob), ts)


def test_ts_large_and_negative_dods():
    ts = np.array([0, 10**15, 10**15 + 1, 10**15 + 10**12, 10**15 + 10**12 + 5], dtype=np.int64)
    np.testing.assert_array_equal(codec.decode_ts_d2(codec.encode_ts_d2(ts)), ts)


@pytest.mark.parametrize("n", [0, 1, 2, 500])
def test_xor_roundtrip_sizes(n):
    rng = np.random.default_rng(n + 10)
    vals = rng.normal(size=n)
    out = codec.decode_xor(codec.encode_xor(vals))
    np.testing.assert_array_equal(
        out.view(np.uint64), np.asarray(vals, dtype=np.float64).view(np.uint64)
    )


def test_xor_constant_series():
    vals = np.full(256, 3.14159)
    blob = codec.encode_xor(vals)
    assert len(blob) <= 4 + 8 + 256 // 8 + 8
    np.testing.assert_array_equal(codec.decode_xor(blob), vals)


def test_xor_nan_and_inf_bit_exact():
    vals = np.array([1.0, np.nan, np.inf, -np.inf, 0.0, -0.0, 2.0])
    out = codec.decode_xor(codec.encode_xor(vals))
    np.testing.assert_array_equal(out.view(np.uint64), vals.view(np.uint64))


def test_xor_smooth_series_compresses():
    x = np.linspace(0, 10, 2000)
    vals = np.round(np.sin(x) * 100, 2)  # smooth, repeating low-entropy diffs
    blob = codec.encode_xor(vals)
    assert len(blob) < 2000 * 8  # beats raw float64


# --- vectorized block encoders -------------------------------------------


def _ragged_blocks(seed, n_blocks=150):
    rng = np.random.default_rng(seed)
    sizes = rng.integers(0, 120, n_blocks)
    ts_blocks, val_blocks = [], []
    for n in sizes:
        ts_blocks.append(np.sort(rng.integers(0, 10**10, n)).astype(np.int64))
        v = np.where(rng.random(n) < 0.3, np.nan,
                     rng.choice([1.0, 2.5, 2.5, 3.125, 97.251], n))
        val_blocks.append(v)
    flat_ts = np.concatenate(ts_blocks)
    flat_v = np.concatenate(val_blocks)
    bounds = np.cumsum([0] + [len(b) for b in ts_blocks])
    return ts_blocks, val_blocks, flat_ts, flat_v, bounds


def test_ts_blocks_bit_identical_to_scalar():
    ts_blocks, _v, flat_ts, _fv, bounds = _ragged_blocks(7)
    out = codec.encode_ts_d2_blocks(flat_ts, bounds)
    for i, b in enumerate(ts_blocks):
        assert out[i] == codec.encode_ts_d2(b), i


def test_xor_blocks_roundtrip_bit_exact():
    _t, val_blocks, _ft, flat_v, bounds = _ragged_blocks(8)
    out = codec.encode_xor_blocks(flat_v, bounds)
    for i, b in enumerate(val_blocks):
        dec = codec.decode_xor(out[i])
        assert np.array_equal(dec.view(np.uint64), b.view(np.uint64)), i


def test_xor_blocks_edge_sizes_and_nan():
    blocks = [
        np.array([], dtype=np.float64),
        np.array([np.nan]),
        np.array([1.0, 1.0]),
        np.array([np.nan, np.nan, 3.0, 3.0, np.nan]),
    ]
    flat = np.concatenate(blocks)
    bounds = np.cumsum([0] + [len(b) for b in blocks])
    out = codec.encode_xor_blocks(flat, bounds)
    for i, b in enumerate(blocks):
        dec = codec.decode_xor(out[i])
        assert np.array_equal(dec.view(np.uint64), b.view(np.uint64)), i
