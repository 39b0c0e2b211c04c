"""On-the-fly trilinear cell geometry.

Capability of the reference's "quadratic geometry coefficients"
(``poisson_operator.h:151-179``): the benchmark runs with a tri-*linear*
mapping (``MappingQGeneric(1)``, ``benchmark.h:89``), so of the 27 tri-quadratic
slots only the 8 constant/linear/bilinear/trilinear ones are populated.  We
store exactly those 8 coefficient vectors per cell (24 floats) and rebuild the
Jacobian at every quadrature point in registers — trading FLOPs for HBM
traffic, the same locality decision as the reference (SURVEY.md §3.6).

The closed-form 3x3 inversion mirrors ``Poisson::do_invert``
(``poisson_operator.h:41-63``) but is written for JAX arrays of shape
(..., 3, 3) so it vectorizes over (cell, q-point) batches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def trilinear_coefficients(cell_vertices: np.ndarray) -> np.ndarray:
    """Trilinear map coefficients from hex corner coordinates.

    ``cell_vertices``: (..., 8, 3) with deal.II local corner order
    (bit0 -> x, bit1 -> y, bit2 -> z).  Returns ``c`` of shape (..., 8, 3) with

        x(u, v, w) = c0 + c1 u + c2 v + c3 uv + c4 w + c5 uw + c6 vw + c7 uvw

    for local coordinates (u, v, w) in [0, 1]^3.
    """
    v = np.asarray(cell_vertices, dtype=np.float64)
    c = np.empty_like(v)
    c[..., 0, :] = v[..., 0, :]
    c[..., 1, :] = v[..., 1, :] - v[..., 0, :]
    c[..., 2, :] = v[..., 2, :] - v[..., 0, :]
    c[..., 3, :] = v[..., 3, :] - v[..., 2, :] - v[..., 1, :] + v[..., 0, :]
    c[..., 4, :] = v[..., 4, :] - v[..., 0, :]
    c[..., 5, :] = v[..., 5, :] - v[..., 4, :] - v[..., 1, :] + v[..., 0, :]
    c[..., 6, :] = v[..., 6, :] - v[..., 4, :] - v[..., 2, :] + v[..., 0, :]
    c[..., 7, :] = (v[..., 7, :] - v[..., 6, :] - v[..., 5, :] + v[..., 4, :]
                    - v[..., 3, :] + v[..., 2, :] + v[..., 1, :] - v[..., 0, :])
    return c


def map_points(coeffs, uvw):
    """Evaluate the trilinear map: coeffs (..., 8, 3), uvw (..., 3) -> (..., 3)."""
    u, v, w = uvw[..., 0:1], uvw[..., 1:2], uvw[..., 2:3]
    c = coeffs
    return (c[..., 0, :] + c[..., 1, :] * u + c[..., 2, :] * v + c[..., 3, :] * u * v
            + c[..., 4, :] * w + c[..., 5, :] * u * w + c[..., 6, :] * v * w
            + c[..., 7, :] * u * v * w)


def jacobian(coeffs, uvw):
    """Jacobian J[d, e] = dx_d / d(uvw)_e of the trilinear map.

    ``coeffs``: (..., 8, 3); ``uvw``: (..., 3).  Returns (..., 3, 3).
    Broadcasting-friendly: a (cells, 1, 8, 3) coeff array against a
    (1, n_q, 3) point array yields (cells, n_q, 3, 3).
    """
    u, v, w = uvw[..., 0:1], uvw[..., 1:2], uvw[..., 2:3]
    c = coeffs
    col0 = c[..., 1, :] + c[..., 3, :] * v + c[..., 5, :] * w + c[..., 7, :] * v * w
    col1 = c[..., 2, :] + c[..., 3, :] * u + c[..., 6, :] * w + c[..., 7, :] * u * w
    col2 = c[..., 4, :] + c[..., 5, :] * u + c[..., 6, :] * v + c[..., 7, :] * u * v
    return jnp.stack([col0, col1, col2], axis=-1) if isinstance(
        coeffs, jnp.ndarray
    ) else np.stack([col0, col1, col2], axis=-1)


def invert_3x3(j):
    """Closed-form inverse of (..., 3, 3) matrices; returns (inverse, det).

    Cofactor expansion, vectorized over leading axes — the batched analog of
    ``Poisson::do_invert`` (``poisson_operator.h:41-63``).
    """
    xp = jnp if isinstance(j, jnp.ndarray) else np
    a, b, c = j[..., 0, 0], j[..., 0, 1], j[..., 0, 2]
    d, e, f = j[..., 1, 0], j[..., 1, 1], j[..., 1, 2]
    g, h, i = j[..., 2, 0], j[..., 2, 1], j[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    inv = xp.stack(
        [
            xp.stack([A, B, C], axis=-1),
            xp.stack([D, E, F], axis=-1),
            xp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    ) * inv_det[..., None, None]
    return inv, det
