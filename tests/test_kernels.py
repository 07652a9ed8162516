"""Kernel unit tests — golden values recomputed from raw formulas, the
reference's test pattern (/root/reference/tests/testthat/test-reduce.R:27-33)."""

import numpy as np
import pytest

from sits_spark import kernels


def test_sgolay_central_row_classic():
    c = kernels.sgolay_coef(3, 5)
    np.testing.assert_allclose(c[2] * 35, [-3, 12, 17, 12, -3], atol=1e-9)


def test_sgolay_rows_sum_to_one():
    c = kernels.sgolay_coef(3, 7)
    np.testing.assert_allclose(c.sum(axis=1), np.ones(7), atol=1e-9)


def test_sg_exact_on_cubic():
    x = np.arange(30, dtype=float)
    y = (0.05 * x**3 - 0.7 * x**2 + 3 * x + 7).reshape(1, -1)
    out = kernels.smooth_sg_mtx(y)
    np.testing.assert_allclose(out, y, atol=1e-8)


def test_sg_short_series_passthrough():
    y = np.array([[1.0, 2.0, 3.0]])
    np.testing.assert_array_equal(kernels.smooth_sg_mtx(y), y)


def test_sg_mirror_symmetry():
    # reversing the input reverses the output (head/tail matrices mirror,
    # R/api_signal.R:76)
    rng = np.random.default_rng(7)
    y = rng.normal(size=(1, 21))
    fwd = kernels.smooth_sg_mtx(y)
    rev = kernels.smooth_sg_mtx(y[:, ::-1])
    np.testing.assert_allclose(fwd, rev[:, ::-1], atol=1e-10)


def test_whittaker_lambda_zero_is_identity():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(2, 25))
    out = kernels.smooth_whit_mtx(d, 1e-12)
    np.testing.assert_allclose(out, d, atol=1e-8)


def test_whittaker_solves_normal_equations():
    # z must satisfy (I + lambda * D'D) z = y with 2nd-order differences
    rng = np.random.default_rng(1)
    y = rng.normal(size=30)
    lam = 2.5
    z = kernels.smooth_whit_mtx(y.reshape(1, -1), lam)[0]
    n = len(y)
    D = np.zeros((n - 2, n))
    for i in range(n - 2):
        D[i, i : i + 3] = [1.0, -2.0, 1.0]
    A = np.eye(n) + lam * D.T @ D
    np.testing.assert_allclose(A @ z, y, atol=1e-8)


def test_whittaker_short_series_passthrough():
    y = np.array([[1.0, 5.0, 2.0]])
    np.testing.assert_array_equal(kernels.smooth_whit_mtx(y, 0.5), y)


def test_linear_interp_taxonomy():
    v = np.array([[np.nan, np.nan, 2.0, np.nan, np.nan, 8.0, np.nan]])
    out = kernels.linear_interp_mtx(v)[0]
    np.testing.assert_allclose(out, [2, 2, 2, 4, 6, 8, 8])


def test_linear_interp_all_nan_stays():
    v = np.array([[np.nan, np.nan]])
    assert np.isnan(kernels.linear_interp_mtx(v)).all()


def test_reduce_kernels_against_formulas():
    rng = np.random.default_rng(3)
    m = rng.normal(size=(5, 40))
    np.testing.assert_allclose(kernels.temp_mean(m), m.mean(axis=1))
    np.testing.assert_allclose(kernels.temp_std(m), m.std(axis=1, ddof=1))
    np.testing.assert_allclose(kernels.temp_median(m), np.median(m, axis=1))
    np.testing.assert_allclose(
        kernels.temp_amplitude(m), m.max(axis=1) - m.min(axis=1)
    )
    np.testing.assert_allclose(
        kernels.temp_fslope(m), np.abs(np.diff(m, axis=1)).max(axis=1)
    )
    np.testing.assert_allclose(
        kernels.temp_iqr(m),
        np.quantile(m, 0.75, axis=1) - np.quantile(m, 0.25, axis=1),
    )


def test_skew_kurt_match_reference_formulas():
    rng = np.random.default_rng(4)
    m = rng.normal(size=(3, 50))
    n = m.shape[1]
    mean = m.mean(axis=1, keepdims=True)
    m3 = ((m - mean) ** 3).sum(axis=1) / n
    s = (((m - mean) ** 2).sum(axis=1) / n) ** 1.5
    adj = np.sqrt(n * (n - 1)) / n - 2  # reference's literal (reduce_fns.cpp:43)
    np.testing.assert_allclose(kernels.temp_skew(m), m3 / s * adj)
    m4 = ((m - mean) ** 4).sum(axis=1)
    m2 = (((m - mean) ** 2).sum(axis=1)) ** 2
    np.testing.assert_allclose(kernels.temp_kurt(m), n * m4 / m2)


def test_sgolay_validation():
    with pytest.raises(ValueError):
        kernels.sgolay_coef(3, 4)
    with pytest.raises(ValueError):
        kernels.sgolay_coef(5, 5)


def test_temp_mse_parseval_identity():
    """mean(|FFT(x)|^2) == sum(x^2) (Parseval) — the identity the engine's
    Catalyst t_mse path relies on (queries.ts_mse_spectral)."""
    rng = np.random.default_rng(3)
    mtx = rng.normal(scale=100.0, size=(7, 129))
    got = kernels.temp_mse(mtx)
    want = np.sum(mtx * mtx, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dtw_windows_matches_reference_recurrence():
    """Vectorized DP == direct transliteration of the symmetric-2
    recurrence (src/dtw.cpp:73-105), bit-exact."""
    def naive(a, b):
        n, o = len(a), len(b)
        d = np.zeros((n, o))
        d[0][0] = abs(a[0] - b[0])
        for i in range(1, n):
            d[i][0] = d[i - 1][0] + abs(a[i] - b[0])
        for j in range(1, o):
            d[0][j] = d[0][j - 1] + abs(a[0] - b[j])
        for i in range(1, n):
            for j in range(1, o):
                c = abs(a[i] - b[j])
                d[i][j] = min(d[i - 1][j - 1] + 2 * c, d[i][j - 1] + c, d[i - 1][j] + c)
        return d[n - 1][o - 1]

    rng = np.random.default_rng(11)
    for w, m in ((4, 3), (7, 7), (3, 9)):
        wins = rng.normal(0, 10, (40, w))
        pat = rng.normal(0, 10, m)
        got = kernels.dtw_windows(wins, pat)
        want = np.array([naive(win, pat) for win in wins])
        assert np.array_equal(got, want)


def test_dtw_identity_and_shift():
    pat = np.array([1.0, 2.0, 3.0])
    wins = np.array([[1.0, 2.0, 3.0], [2.0, 3.0, 4.0]])
    d = kernels.dtw_windows(wins, pat)
    assert d[0] == 0.0 and d[1] > 0.0
