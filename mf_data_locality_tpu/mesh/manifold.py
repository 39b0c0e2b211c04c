"""The sine-deformation chart manifold of the BP4 benchmark geometry.

Capability of ``MyManifold`` (reference: ``common_code/curved_manifold.h:12-87``):
the unit box is deformed by ``x_d += factor * prod_e sin(pi * x_e)`` so that
cell Jacobians are non-constant and the operator cannot shortcut to a
Cartesian metric.  ``pull_back`` is the Newton inverse of the chart
(``curved_manifold.h:37-83``), vectorized over many points at once.

Everything here is host-side float64 NumPy — manifold evaluation happens once
at setup to place mesh vertices; the device-side operator only ever sees the
resulting trilinear cell coefficients.
"""

from __future__ import annotations

import numpy as np

DEFAULT_FACTOR = 0.1


def push_forward(points: np.ndarray, factor: float = DEFAULT_FACTOR) -> np.ndarray:
    """Map reference points (..., dim) through the sine deformation."""
    points = np.asarray(points, dtype=np.float64)
    sinval = factor * np.prod(np.sin(np.pi * points), axis=-1, keepdims=True)
    return points + sinval


def pull_back(
    points: np.ndarray,
    factor: float = DEFAULT_FACTOR,
    tol: float = 1e-12,
    max_iter: int = 100,
) -> np.ndarray:
    """Invert :func:`push_forward` by a vectorized Newton iteration.

    The Jacobian of the chart is ``I + ones * d(sinval)/dx^T`` (rank-one
    update), matching the dense Newton solve of the reference
    (``curved_manifold.h:55-80``) but solved across all points at once.
    """
    p = np.asarray(points, dtype=np.float64)
    x = p.copy()
    dim = p.shape[-1]
    for _ in range(max_iter):
        sines = np.sin(np.pi * x)
        sinval = factor * np.prod(sines, axis=-1, keepdims=True)
        residual = p - x - sinval
        if np.max(np.linalg.norm(residual, axis=-1)) <= tol:
            return x
        # d(sinval)/dx_d = factor * pi * cos(pi x_d) * prod_{e != d} sin(pi x_e)
        cos = np.cos(np.pi * x)
        prod_others = np.empty_like(x)
        for d in range(dim):
            others = [e for e in range(dim) if e != d]
            prod_others[..., d] = np.prod(sines[..., others], axis=-1)
        grad = factor * np.pi * cos * prod_others  # (..., dim)
        jac = np.broadcast_to(np.eye(dim), x.shape + (dim,)).copy()
        jac += grad[..., None, :]  # every row of J gets the same gradient row
        x = x + np.linalg.solve(jac, residual[..., None])[..., 0]
    sines = np.sin(np.pi * x)
    sinval = factor * np.prod(sines, axis=-1, keepdims=True)
    residual = p - x - sinval
    if np.max(np.linalg.norm(residual, axis=-1)) > tol:
        raise RuntimeError("Newton iteration for manifold pull_back did not converge")
    return x
