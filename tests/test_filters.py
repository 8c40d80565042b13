"""Unit tests for Gaussian taps and convolution matrices."""

import numpy as np
import pytest

from sift3d_tpu.filters import conv_matrix, gauss_kernel, incremental_sigma


def test_gauss_kernel_normalized():
    for sigma in (0.5, 1.0, 1.6, 2.45):
        k = gauss_kernel(sigma)
        assert k.dtype == np.float32
        assert abs(k.sum() - 1.0) < 1e-6
        # half-width = max(ceil(3 sigma), 1)
        assert len(k) == 2 * max(int(np.ceil(3.0 * sigma)), 1) + 1
        assert np.all(k == k[::-1])  # symmetric


def test_gauss_kernel_degenerate_sigma():
    k = gauss_kernel(0.0)
    assert len(k) == 3  # half-width forced to 1


def test_incremental_sigma():
    assert incremental_sigma(3.0, 5.0) == pytest.approx(4.0)
    with pytest.raises(ValueError):
        incremental_sigma(5.0, 3.0)


def test_conv_matrix_rows_sum_to_one():
    # Taps sum to 1 and every sample is a lerp whose weights sum to the tap,
    # so every row of W must sum to 1 (boundary rows included).
    k = gauss_kernel(1.6)
    for n, uf in [(32, 1.0), (32, 0.5), (17, 0.25), (64, 1.0)]:
        W = conv_matrix(n, k, uf)
        assert np.allclose(W.sum(axis=1), 1.0, atol=1e-5)


def test_conv_matrix_interior_is_plain_convolution():
    """For unit_factor=1 the interior rows are the plain FIR stencil."""
    k = gauss_kernel(1.0)  # width 7, half-width 3
    n = 20
    W = conv_matrix(n, k, 1.0)
    x = np.random.default_rng(0).normal(size=n).astype(np.float32)
    out = W @ x
    ref = np.convolve(x, k[::-1], mode="same")  # symmetric kernel
    # interior: rows half_width .. n-2-half_width
    assert np.allclose(out[3:n - 4], ref[3:n - 4], atol=1e-5)


def test_conv_matrix_boundary_semantics():
    """Replicate the reference's boundary rule by hand for unit_factor=1:
    lower edge mirrors exactly; upper edge is a 0.9/0.1 lerp."""
    taps = np.array([0.25, 0.5, 0.25], dtype=np.float32)
    n = 8
    W = conv_matrix(n, taps, 1.0)
    x = np.arange(n, dtype=np.float32) ** 2
    out = W @ x

    def sample(p):
        if int(np.trunc(p)) < 0:
            p = -p
        elif int(np.trunc(p)) >= n - 1:
            p = 2.0 * (n - 1) - p - np.float32(0.1)
        lo = int(np.trunc(p))
        fr = p - lo
        return (1 - fr) * x[lo] + fr * x[min(lo + 1, n - 1)]

    for xi in (0, 1, n - 2, n - 1):
        want = sum(t * sample(xi - d) for t, d in zip(taps, (-1, 0, 1)))
        assert out[xi] == pytest.approx(want, rel=1e-5)
