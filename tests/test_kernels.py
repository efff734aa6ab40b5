"""Unit tests for SPH smoothing kernels: normalization, support, symmetry,
gradient consistency (SURVEY.md §4 test-strategy item a)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import kernels

H = 0.1


def test_cubic_normalization():
    # Integral of W over R^3 must be ~1 (midpoint rule on a fine grid).
    n = 80
    xs = (np.arange(n) + 0.5) / n * 2 * H - H
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    w = kernels.cubic_w(jnp.asarray(g), H)
    integral = float(jnp.sum(w)) * (2 * H / n) ** 3
    assert abs(integral - 1.0) < 1e-2


def test_cubic_compact_support():
    assert float(kernels.cubic_w_scalar(H * 1.0001, H)) == 0.0
    assert float(kernels.cubic_w_scalar(2 * H, H)) == 0.0
    assert float(kernels.cubic_w_scalar(0.999 * H, H)) > 0.0
    g = kernels.cubic_grad_w(jnp.asarray([1.2 * H, 0.0, 0.0]), H)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_cubic_w0_matches_limit():
    assert float(kernels.cubic_w_scalar(0.0, H)) == pytest.approx(kernels.cubic_w0(H))


def test_cubic_piecewise_continuity():
    # continuous at q = 0.5 and q = 1
    lo = float(kernels.cubic_w_scalar(0.5 * H - 1e-7, H))
    hi = float(kernels.cubic_w_scalar(0.5 * H + 1e-7, H))
    assert abs(lo - hi) < 1e-3 * kernels.cubic_w0(H)


def test_grad_matches_finite_difference():
    def w64(p):
        # float64 restatement of the cubic spline for an accurate FD oracle
        q = np.linalg.norm(p, axis=-1) / H
        sigma = 8.0 / (np.pi * H**3)
        inner = 6 * q**3 - 6 * q**2 + 1
        outer = 2 * (1 - q) ** 3
        return sigma * np.where(q <= 1.0, np.where(q <= 0.5, inner, outer), 0.0)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-H, H, size=(256, 3))
    q = np.linalg.norm(pts, axis=1) / H
    # keep away from the piecewise kinks (q = 0.5, 1.0) and the origin
    pts = pts[(q > 0.05) & (np.abs(q - 0.5) > 0.02) & (q < 0.97)]
    eps = 1e-7 * H
    grad = np.asarray(kernels.cubic_grad_w(jnp.asarray(pts, dtype=jnp.float32), H))
    for d in range(3):
        e = np.zeros(3)
        e[d] = eps
        fd = (w64(pts + e) - w64(pts - e)) / (2 * eps)
        scale = np.maximum(np.abs(fd), 1e-3 * 8.0 / np.pi / H**4)
        assert np.max(np.abs(grad[:, d] - fd) / scale) < 1e-2


def test_grad_antisymmetric():
    r = jnp.asarray([[0.3 * H, 0.2 * H, -0.1 * H]])
    g1 = np.asarray(kernels.cubic_grad_w(r, H))
    g2 = np.asarray(kernels.cubic_grad_w(-r, H))
    np.testing.assert_allclose(g1, -g2, rtol=1e-6)


def test_grad_zero_at_origin():
    g = np.asarray(kernels.cubic_grad_w(jnp.zeros((1, 3)), H))
    np.testing.assert_allclose(g, 0.0)


def test_cohesion_support_and_sign():
    assert float(kernels.cohesion_w_scalar(1.1 * H, H)) == 0.0
    # positive in the outer band (attraction), negative offset near center
    assert float(kernels.cohesion_w_scalar(0.75 * H, H)) > 0.0
    assert float(kernels.cohesion_w_scalar(0.0, H)) < 0.0
    # matches the closed form at a sample point
    r = 0.6 * H
    expected = 32.0 / (np.pi * H**9) * (H - r) ** 3 * r**3
    assert float(kernels.cohesion_w_scalar(r, H)) == pytest.approx(expected, rel=1e-5)


def test_adhesion_support():
    assert float(kernels.adhesion_w_scalar(0.3 * H, H)) == 0.0  # inner half: zero
    assert float(kernels.adhesion_w_scalar(0.75 * H, H)) > 0.0
    assert float(kernels.adhesion_w_scalar(1.2 * H, H)) == 0.0
    r = 0.8 * H
    expected = 0.007 / H**3.25 * (-4 * r * r / H + 6 * r - 2 * H) ** 0.25
    assert float(kernels.adhesion_w_scalar(r, H)) == pytest.approx(expected, rel=1e-5)
