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
