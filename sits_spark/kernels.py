"""Pure-numpy time-series kernels shared by the single-node oracle and the
Spark pandas/Arrow UDFs.

Every kernel operates on a 2-D float64 matrix ``(n_series, n_time)`` — the
same "pixels x time" block shape the reference's C++ kernels receive
(e.g. ``smooth_sg_mtx`` at /root/reference/src/smooth_sgp.cpp:63-75,
``smooth_whit_mtx`` at /root/reference/src/smooth_whit.cpp:70-81,
``linear_interp`` at /root/reference/src/linear_interp.cpp:76-85) — so the
inner loops vectorize across series with numpy while recurrences run along
the (short) time axis.

Using one shared implementation on both sides makes the Spark-vs-oracle
byte-match test exercise exactly what can diverge in a distributed run:
partitioning, shuffle, grouping, ordering and salting — not float noise.

Semantics are mirrored from the reference (file:line cited per function);
they are re-implemented from the published math, not translated code.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sgolay_coef",
    "smooth_sg_mtx",
    "smooth_whit_mtx",
    "linear_interp_mtx",
    "temp_mean",
    "temp_median",
    "temp_std",
    "temp_min",
    "temp_max",
    "temp_amplitude",
    "temp_fslope",
    "temp_skew",
    "temp_kurt",
    "temp_quantile",
    "temp_iqr",
]

# ---------------------------------------------------------------------------
# Savitzky-Golay
# ---------------------------------------------------------------------------


_SG_COEF_CACHE: dict[tuple[int, int], np.ndarray] = {}


def sgolay_coef(order: int = 3, length: int = 5) -> np.ndarray:
    """Savitzky-Golay filter coefficient matrix (length x length).

    Mirrors the reference's ``.signal_sgolay_coef``
    (/root/reference/R/api_signal.R:49-79): row ``r`` (0-based) estimates
    x(k) from the r preceding and length-1-r following samples; rows are
    pseudo-inverse rows of the Vandermonde design on the unit grid, and the
    lower half is the mirrored upper half (m=0 derivative).
    """
    if length % 2 != 1:
        raise ValueError("sgolay length must be odd")
    if order >= length:
        raise ValueError("sgolay order must be < length")
    key = (order, length)
    if key in _SG_COEF_CACHE:
        return _SG_COEF_CACHE[key]
    n, p = length, order
    filt = np.zeros((n, n), dtype=np.float64)
    k = n // 2
    for row in range(k + 1):  # R rows 1..k+1 -> 0..k
        # C[i, j] = (i - row)^j on the unit grid (R/api_signal.R:67-68)
        x = np.arange(n, dtype=np.float64) - row
        weights = x[:, None] ** np.arange(p + 1, dtype=np.float64)[None, :]
        pinv = np.linalg.pinv(weights)  # SVD pinv = .signal_mass_ginv (:97-100)
        filt[row, :] = pinv[0, :]  # m = 0 derivative row (:73)
    # mirrored lower half (R/api_signal.R:76)
    filt[k + 1 : n, :] = filt[k - 1 :: -1, ::-1]
    _SG_COEF_CACHE[key] = filt
    return filt


def _signal_filter_mtx(filt_coef: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Octave-style one-sided FIR filter, rowwise over a matrix.

    Mirrors ``signal_filter`` (/root/reference/src/smooth_sgp.cpp:14-32):
    left-pad with zeros, then out[i] = sum_j ext[i+j] * coef[n-1-j].
    """
    n = filt_coef.shape[0]
    n_series, n_time = data.shape
    ext = np.concatenate(
        [np.zeros((n_series, n - 1), dtype=np.float64), data], axis=1
    )
    out = np.zeros_like(data)
    rev = filt_coef[::-1]
    for j in range(n):  # n is tiny (filter length); vectorized across series
        out += ext[:, j : j + n_time] * rev[j]
    return out


def smooth_sg_mtx(
    data: np.ndarray, coef: np.ndarray | None = None, order: int = 3, length: int = 5
) -> np.ndarray:
    """Savitzky-Golay smoothing over rows of ``data`` (series x time).

    Mirrors ``smooth_sg`` (/root/reference/src/smooth_sgp.cpp:37-59): the
    interior uses the central filter row via the one-sided FIR pass, the
    first k points use the asymmetric head rows applied to the first n
    samples, and the last k points use the tail rows applied to the last n
    samples.

    Series shorter than ``length`` are returned unchanged (the reference
    errors on them; the oracle defines passthrough — see FIXTURES.md §3.4).
    """
    if coef is None:
        coef = sgolay_coef(order, length)
    n = length
    k = n // 2
    n_series, n_time = data.shape
    if n_time < n:
        return data.copy()
    central = coef[k, :]
    z = _signal_filter_mtx(central, data)
    out = np.empty_like(data)
    # head: rows 0..k-1 of coef applied to the first n samples (:54).
    # Explicit tap loops (not matmul) so the per-row float ops are
    # identical whatever the batch height — (B, T) rows bit-match (1, T).
    for r in range(k):
        acc = data[:, 0] * coef[r, 0]
        for j in range(1, n):
            acc = acc + data[:, j] * coef[r, j]
        out[:, r] = acc
    # interior: filtered output shifted so z[n-1..] aligns to out[k..] (:55)
    out[:, k : n_time - k] = z[:, n - 1 :]
    # tail: rows k+1..n-1 applied to the last n samples (:56)
    for r in range(k + 1, n):
        acc = data[:, n_time - n] * coef[r, 0]
        for j in range(1, n):
            acc = acc + data[:, n_time - n + j] * coef[r, j]
        out[:, n_time - n + r] = acc
    return out


# ---------------------------------------------------------------------------
# Whittaker
# ---------------------------------------------------------------------------


def _whit_factor(length: int, lamb: float) -> tuple[np.ndarray, np.ndarray]:
    """Precompute the (data-independent) forward-elimination coefficients
    d, c, e for the Whittaker pentadiagonal solve with unit weights.

    Mirrors /root/reference/src/smooth_whit.cpp:34-57 with w[i] = 1. The
    factorization depends only on (length, lambda), so it is computed once
    on the driver and closed over by the UDF (same trick as the reference
    precomputing SG coefficients at R/sits_filters.R:128-129).
    """
    m = length - 1
    d = np.zeros(length)
    c = np.zeros(length)
    e = np.zeros(length)
    d[0] = 1.0 + lamb
    c[0] = -2.0 * lamb / d[0]
    e[0] = lamb / d[0]
    d[1] = 1.0 + 5.0 * lamb - d[0] * c[0] * c[0]
    c[1] = (-4.0 * lamb - d[0] * c[0] * e[0]) / d[1]
    e[1] = lamb / d[1]
    for i in range(2, m - 1):
        i1, i2 = i - 1, i - 2
        d[i] = 1.0 + 6.0 * lamb - c[i1] * c[i1] * d[i1] - e[i2] * e[i2] * d[i2]
        c[i] = (-4.0 * lamb - d[i1] * c[i1] * e[i1]) / d[i]
        e[i] = lamb / d[i]
    i1, i2 = m - 2, m - 3
    d[m - 1] = 1.0 + 5.0 * lamb - c[i1] * c[i1] * d[i1] - e[i2] * e[i2] * d[i2]
    c[m - 1] = (-2.0 * lamb - d[i1] * c[i1] * e[i1]) / d[m - 1]
    i1, i2 = m - 1, m - 2
    d[m] = 1.0 + lamb - c[i1] * c[i1] * d[i1] - e[i2] * e[i2] * d[i2]
    return d, np.stack([c, e])


_WHIT_CACHE: dict[tuple[int, float], tuple[np.ndarray, np.ndarray]] = {}


def smooth_whit_mtx(data: np.ndarray, lamb: float = 0.5) -> np.ndarray:
    """Whittaker smoother (2nd-order difference penalty) over rows.

    Mirrors the ptw-derived bespoke banded solve at
    /root/reference/src/smooth_whit.cpp:20-64 — including its boundary rows
    — with the forward/back substitution vectorized across series (the time
    recurrence stays sequential, as in the original). Series shorter than 4
    points are returned unchanged (the recurrence needs >= 4 points; the
    oracle defines passthrough).
    """
    n_series, n_time = data.shape
    if n_time < 4:
        return data.copy()
    key = (n_time, float(lamb))
    if key not in _WHIT_CACHE:
        _WHIT_CACHE[key] = _whit_factor(n_time, float(lamb))
    d, ce = _WHIT_CACHE[key]
    c, e = ce[0], ce[1]
    m = n_time - 1
    z = np.zeros_like(data)
    # forward pass (smooth_whit.cpp:37-58), vectorized across rows
    z[:, 0] = data[:, 0]
    z[:, 1] = data[:, 1] - c[0] * z[:, 0]
    for i in range(2, m - 1):
        z[:, i] = data[:, i] - c[i - 1] * z[:, i - 1] - e[i - 2] * z[:, i - 2]
    z[:, m - 1] = data[:, m - 1] - c[m - 2] * z[:, m - 2] - e[m - 3] * z[:, m - 3]
    z[:, m] = (data[:, m] - c[m - 1] * z[:, m - 1] - e[m - 2] * z[:, m - 2]) / d[m]
    # back substitution (:59-61)
    z[:, m - 1] = z[:, m - 1] / d[m - 1] - c[m - 1] * z[:, m]
    for i in range(m - 2, -1, -1):
        z[:, i] = z[:, i] / d[i] - c[i] * z[:, i + 1] - e[i] * z[:, i + 2]
    return z


# ---------------------------------------------------------------------------
# Gap fill: linear interior + edge fill (backfill leading, LOCF trailing)
# ---------------------------------------------------------------------------


def linear_interp_mtx(data: np.ndarray) -> np.ndarray:
    """Fill NaN runs per row: interior NaNs linearly interpolated, leading
    NaNs back-filled from the first valid value, trailing NaNs carried
    forward; all-NaN rows stay NaN.

    Same NULL taxonomy as /root/reference/src/linear_interp.cpp:25-73
    (leading :29-38, trailing :47-54, interior :56-71, all-NA :35).
    ``np.interp`` on integer positions gives exactly these semantics
    (endpoint clamping = backfill/LOCF).
    """
    out = data.copy()
    n_series, n_time = data.shape
    idx = np.arange(n_time)
    nan_mask = np.isnan(data)
    rows = np.where(nan_mask.any(axis=1) & ~nan_mask.all(axis=1))[0]
    for r in rows:
        valid = ~nan_mask[r]
        out[r] = np.interp(idx, idx[valid], data[r, valid])
    return out


# ---------------------------------------------------------------------------
# Temporal reduce kernels (rowwise over series x time matrices)
# Mirrors /root/reference/src/reduce_fns.cpp
# ---------------------------------------------------------------------------


def temp_max(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:12-14 (arma::max dim 1)."""
    return np.max(mtx, axis=1)


def temp_min(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:17-19."""
    return np.min(mtx, axis=1)


def temp_mean(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:22-24."""
    return np.mean(mtx, axis=1)


def temp_median(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:27-29 (arma::median: midpoint of the two central
    order statistics for even n)."""
    return np.median(mtx, axis=1)


def temp_std(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:32-34 — arma::stddev norm_type 0 = sample (n-1)."""
    return np.std(mtx, axis=1, ddof=1)


def temp_amplitude(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:63-65."""
    return np.max(mtx, axis=1) - np.min(mtx, axis=1)


def temp_fslope(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:68-70 — max |first difference| along time."""
    return np.max(np.abs(np.diff(mtx, axis=1)), axis=1)


def temp_skew(mtx: np.ndarray) -> np.ndarray:
    """Adjusted Fisher-Pearson skewness, reduce_fns.cpp:37-49 (including
    the reference's literal adjustment factor sqrt(n(n-1))/n - 2)."""
    n = mtx.shape[1]
    adj = np.sqrt(n * (n - 1.0)) / n - 2.0
    mean = np.mean(mtx, axis=1, keepdims=True)
    m3 = np.sum((mtx - mean) ** 3, axis=1) / n
    s = (np.sum((mtx - mean) ** 2, axis=1) / n) ** 1.5
    return (m3 / s) * adj


def temp_kurt(mtx: np.ndarray) -> np.ndarray:
    """Pearson kurtosis (normal -> 3.0), reduce_fns.cpp:52-60."""
    n = mtx.shape[1]
    mean = np.mean(mtx, axis=1, keepdims=True)
    m4 = np.sum((mtx - mean) ** 4, axis=1)
    m2 = np.sum((mtx - mean) ** 2, axis=1) ** 2
    return n * m4 / m2


def temp_quantile(mtx: np.ndarray, p: float) -> np.ndarray:
    """reduce_fns.cpp:79-86 — arma::quantile uses the R type-5 definition;
    numpy's 'midpoint'-free equivalent is interpolation='linear' on
    (n*p - 0.5) positions. We standardize on numpy's default linear
    interpolation (R type-7), identically on both engine and oracle."""
    return np.quantile(mtx, p, axis=1)


def temp_iqr(mtx: np.ndarray) -> np.ndarray:
    """reduce_fns.cpp:89-92."""
    return temp_quantile(mtx, 0.75) - temp_quantile(mtx, 0.25)
