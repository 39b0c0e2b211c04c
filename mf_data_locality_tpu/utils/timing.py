"""Benchmark timing protocol.

Reproduces the reference measurement protocol (``common_code/benchmark.h:
184-215``): min over repeats of wall time, separate warmup before timing
(``curved_manifold.h:90-106`` — here: jit compile + one discarded run), and
``jax.block_until_ready`` in place of MPI barriers.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def time_min(fn: Callable[[], object], repeats: int, inner: int = 1,
             warmup: int = 1) -> float:
    """Min over ``repeats`` of (wall time of ``inner`` back-to-back calls)/inner.

    ``fn`` must return a JAX array (or pytree ending in one) so completion can
    be observed with ``block_until_ready``.
    """
    for _ in range(warmup):
        out = fn()
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def measure_hbm_bandwidth(nbytes: int = 1 << 28, dtype=None) -> float:
    """Measured triad-style HBM bandwidth (bytes/s) on the default device.

    Used to compute the roofline the matvec is judged against
    (BASELINE.md: >= 80% of per-chip HBM roofline).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    n = nbytes // dtype.dtype.itemsize if hasattr(dtype, "dtype") else nbytes // 4
    a = jnp.ones((n,), dtype=dtype)
    b = jnp.full((n,), 2.0, dtype=dtype)

    @jax.jit
    def triad(a, b):
        return a + 0.5 * b

    t = time_min(lambda: triad(a, b), repeats=5, warmup=2)
    # traffic: read a + read b + write out
    return 3 * n * a.dtype.itemsize / t
