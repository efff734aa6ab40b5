"""SPH smoothing kernels as pure, branchless jnp functions.

Math parity with the reference kernel classes:
  - cubic spline W / gradW : reference kernels/CubicKernel.py:20-54
  - cohesion (Akinci 2013 surface tension) : kernels/CohesionKernel.py:17-29
  - adhesion (Akinci 2013 fluid-solid)     : kernels/AdhesionKernel.py:20-29

All functions take the support radius ``h`` explicitly and broadcast over
arbitrary array shapes, so they vectorize over the (N, K) pair arrays used by
the neighbor sweeps.  Branches become ``jnp.where`` selections: on TPU the VPU
evaluates both sides, which is far cheaper than divergent control flow.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS = 1.0e-5


def cubic_w_q(q: jnp.ndarray, h: float) -> jnp.ndarray:
    """Cubic spline W as a function of q = |r| / h (scaled by 8/(pi h^3)).

    W(q) = sigma * (6q^3 - 6q^2 + 1)   for q <= 0.5
         = sigma * 2 (1 - q)^3         for 0.5 < q <= 1
         = 0                           otherwise
    with sigma = 8 / (pi h^3).
    """
    sigma = 8.0 / (math.pi * h * h * h)
    q = jnp.asarray(q)
    inner = 6.0 * q * q * q - 6.0 * q * q + 1.0
    f = 1.0 - q
    outer = 2.0 * f * f * f
    w = jnp.where(q <= 0.5, inner, outer)
    return jnp.where(q <= 1.0, sigma * w, 0.0)


def cubic_w_scalar(dist: jnp.ndarray, h: float) -> jnp.ndarray:
    """W(|r|) for a scalar distance array (reference Cubic_W_norm)."""
    return cubic_w_q(jnp.asarray(dist) / h, h)


def cubic_w(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """W(r) for vectors r of shape (..., 3) (reference Cubic_W)."""
    dist = jnp.linalg.norm(r, axis=-1)
    return cubic_w_scalar(dist, h)


def cubic_w0(h: float) -> float:
    """W(0): the self-contribution used in density sums (sesph.py:140)."""
    return 8.0 / (math.pi * h * h * h)


def cubic_grad_w(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Gradient of the cubic spline, shape (..., 3).

    gradW(r) = L * q (3q - 2) * r / (|r| h)      for q <= 0.5
             = -L * (1 - q)^2 * r / (|r| h)      for 0.5 < q <= 1
             = 0 for |r| <= 1e-5 or q > 1
    with L = 48 / (pi h^3).   (reference CubicKernel.py:20-32)
    """
    m_l = 48.0 / (math.pi * h * h * h)
    dist = jnp.linalg.norm(r, axis=-1, keepdims=True)
    q = dist / h
    # Safe inverse distance; masked out below for tiny |r|.
    inv = 1.0 / jnp.maximum(dist, _EPS)
    gradq = r * (inv / h)
    inner = m_l * q * (3.0 * q - 2.0)
    outer = -m_l * (1.0 - q) * (1.0 - q)
    mag = jnp.where(q <= 0.5, inner, outer)
    valid = (dist > _EPS) & (q <= 1.0)
    return jnp.where(valid, mag * gradq, 0.0)


def cubic_grad_scale(dist: jnp.ndarray, h: float) -> jnp.ndarray:
    """Scalar s(|r|) with gradW(r) = s * r.

    TPU layout note: storing gradW as a (..., 3) vector array pads the
    minormost dim 3 to 128 lanes (a 42x memory blowup at scale); the scalar
    factor keeps every pair array 2-D and lane-aligned.  Derivation from
    CubicKernel.py:20-32: gradW = mag(q) * r/(|r| h), so
      s = L (3q - 2) / h^2          for q <= 0.5   (q/(d h) = 1/h^2)
      s = -L (1 - q)^2 / (d h)      for 0.5 < q <= 1
      s = 0                         for d <= 1e-5 or q > 1
    with L = 48 / (pi h^3).
    """
    m_l = 48.0 / (math.pi * h * h * h)
    dist = jnp.asarray(dist)
    q = dist / h
    inner = m_l * (3.0 * q - 2.0) / (h * h)
    outer = -m_l * (1.0 - q) * (1.0 - q) / (jnp.maximum(dist, _EPS) * h)
    s = jnp.where(q <= 0.5, inner, outer)
    return jnp.where((dist > _EPS) & (q <= 1.0), s, 0.0)


def cohesion_w_scalar(dist: jnp.ndarray, h: float) -> jnp.ndarray:
    """Akinci cohesion spline (CohesionKernel.py:17-29).

    W(r) = k (h - r)^3 r^3                 for h/2 < r <= h
         = k [2 (h - r)^3 r^3] - h^6/64    for 0 <= r <= h/2
    with k = 32 / (pi h^9).
    """
    m_k = 32.0 / (math.pi * h**9)
    m_c = h**6 / 64.0
    dist = jnp.asarray(dist)
    base = (h - dist) ** 3 * dist**3
    far = m_k * base
    near = m_k * 2.0 * base - m_c
    w = jnp.where(dist > 0.5 * h, far, near)
    return jnp.where(dist * dist <= h * h, w, 0.0)


def cohesion_w(r: jnp.ndarray, h: float) -> jnp.ndarray:
    return cohesion_w_scalar(jnp.linalg.norm(r, axis=-1), h)


def adhesion_w_scalar(dist: jnp.ndarray, h: float) -> jnp.ndarray:
    """Akinci adhesion spline (AdhesionKernel.py:20-29).

    W(r) = 0.007/h^3.25 * (-4r^2/h + 6r - 2h)^(1/4) for h/2 < r <= h, else 0.
    """
    m_k = 0.007 / h**3.25
    dist = jnp.asarray(dist)
    arg = -4.0 * dist * dist / h + 6.0 * dist - 2.0 * h
    # arg >= 0 exactly on [h/2, h]; clamp for safe fractional power outside.
    w = m_k * jnp.maximum(arg, 0.0) ** 0.25
    inside = (dist > 0.5 * h) & (dist * dist <= h * h)
    return jnp.where(inside, w, 0.0)


def adhesion_w(r: jnp.ndarray, h: float) -> jnp.ndarray:
    return adhesion_w_scalar(jnp.linalg.norm(r, axis=-1), h)
