"""Benchmark timing protocol.

Reproduces the reference measurement protocol (``common_code/benchmark.h:
184-215``): min over repeats of wall time, warmup before timing
(``curved_manifold.h:90-106`` — here: jit compile + one discarded run).

Completion handling: on tunneled TPU backends (platform "axon"),
``jax.block_until_ready`` does NOT block, so all timings here are based on
fetching a scalar result to the host, with the measured round-trip latency
subtracted.  Kernel-scale timings amortize further by scanning K applications
inside one jitted computation.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

_LATENCY: float | None = None


def round_trip_latency(refresh: bool = False) -> float:
    """Host->device->host latency for a trivial jitted scalar fetch."""
    global _LATENCY
    if _LATENCY is not None and not refresh:
        return _LATENCY
    f = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    float(f(z))  # compile
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(z))
        best = min(best, time.perf_counter() - t0)
    _LATENCY = best
    return best


def latency_recheck(tol: float = 0.2) -> tuple[bool, float, float]:
    """Re-measure the round-trip latency and compare with the cached value.

    The latency correction's failure mode (VERDICT r4 weak 4): a host that
    was busy when ``round_trip_latency`` first ran caches an INFLATED value
    that is then subtracted from every solve wall time, silently DEFLATING
    every reported time (a contaminated round-4 table showed p=3 at 115
    us/it vs the honest 204).  Measurement scripts call this AFTER their
    timed section: a drift beyond ``tol`` (relative to the larger of the
    two) means the host was not idle for at least part of the run and the
    table must be rejected, not annotated.

    Returns ``(ok, cached, fresh)`` and re-caches the fresh value either
    way (it is the more current estimate for anything timed next).
    """
    cached = round_trip_latency()
    fresh = round_trip_latency(refresh=True)
    drift = abs(fresh - cached) / max(cached, fresh, 1e-12)
    return drift <= tol, cached, fresh


def time_min_fetch(fn: Callable[[], jax.Array], repeats: int,
                   warmup: int = 1) -> float:
    """Min over ``repeats`` of the wall time of ``float(fn())``, latency-corrected.

    ``fn`` must return a scalar jax array whose value depends on the full
    computation being timed (fetching it forces execution).
    """
    for _ in range(warmup):
        float(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return max(best - round_trip_latency(), 1e-9)


def time_pair_fetch(fn1: Callable[[], jax.Array], fn2: Callable[[], jax.Array],
                    repeats: int, warmup: int = 1) -> tuple[float, float]:
    """Floor pair with ALTERNATING samples: min over ``repeats`` of the wall
    time of ``float(fn1())`` / ``float(fn2())``, sampled back-to-back,
    latency-corrected.

    For two-chain slope protocols.  The tunneled backend's per-call fixed
    cost (~22-32 ms here) is NON-STATIONARY — it drifts by several ms on
    minute timescales (measured: a trivial-fetch latency probe returning
    32 ms while a 50-iteration chain fetch minutes later took 28 ms).  A
    slope computed from floors measured in two separate blocks absorbs
    that drift into the subtraction; at small problem sizes the drift
    (±2-5 ms) exceeds the signal (a 50-iteration chain's ~3-5 ms of
    compute) and fabricates slopes as absurd as 6 us/it for a 95 us/it
    config.  Alternating keeps each fn1/fn2 sample pair time-adjacent, so
    the drift is common-mode in the floor difference.
    """
    for _ in range(warmup):
        float(fn1())
        float(fn2())
    b1 = b2 = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn1())
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fn2())
        b2 = min(b2, time.perf_counter() - t0)
    lat = round_trip_latency()
    return max(b1 - lat, 1e-9), max(b2 - lat, 1e-9)


def time_scan_fetch(step: Callable[[jax.Array], jax.Array], x0: jax.Array,
                    inner: int, repeats: int, warmup: int = 1) -> float:
    """Time one application of ``step`` by scanning chained applications
    inside a single jitted computation and fetching one scalar.

    The analog of the reference's 50-matvec inner loop
    (``benchmark.h:204-215``), with device-side chaining so per-call dispatch
    latency is amortized away.  The per-apply cost is the SLOPE between an
    ``inner``-long and a ``2*inner``-long chain, (t_2L - t_L) / L: the
    subtraction cancels every per-chain fixed cost exactly — dispatch, the
    tunneled round trip and whatever the latency correction mis-estimates
    of it, scan setup, the result fetch.  The one-chain quotient t_L / L
    keeps the mis-correction residual divided by only L=50 applies while
    the solve divides it by ~100 iterations, which is how round-3 tables
    produced the impossible time/matvec > time/it rows at the
    heavy-metric-stream configs (VERDICT r3 weak 3; fixed-overhead term
    measured ~2-12 ms/chain on the tunneled backend).  Falls back to the
    long-chain quotient if the slope drowns in noise (<=0 or a tiny
    problem finishing inside the round-trip latency).
    """

    def make_chain(length):
        @jax.jit
        def chain(x):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, x, None, length=length)
            # x0/step may carry a pytree (e.g. piece-state + Z-planes)
            return jax.tree.leaves(out)[0].ravel()[0]
        return chain

    chain = make_chain(inner)
    chain2 = make_chain(2 * inner)
    # alternating floor pair: the tunneled fixed cost drifts by ms on
    # minute timescales, so the two floors must be sampled time-adjacent
    # for the subtraction to cancel it (see time_pair_fetch)
    t1, t2 = time_pair_fetch(lambda: chain(x0), lambda: chain2(x0),
                             repeats=repeats, warmup=warmup)
    slope = (t2 - t1) / inner
    if slope > 0 and t2 > 0.2 * round_trip_latency():
        return slope
    long = make_chain(inner * 20)
    t = time_min_fetch(lambda: long(x0), repeats=repeats, warmup=warmup)
    return t / (inner * 20)


def scan_chain_pair(step: Callable[[jax.Array], jax.Array], x0,
                    inner: int, repeats: int, warmup: int = 1
                    ) -> Callable[[], tuple[float, float]]:
    """Return a zero-arg callable producing one alternating floor sample
    ``(t_L, t_2L)`` of the ``inner``- and ``2*inner``-long chains
    (``time_pair_fetch`` semantics; chains jitted once at build).

    For interleaved A/B protocols that aggregate across rounds: accumulate
    the MINIMUM of each chain's wall time over all rounds and take one
    slope of the floors, ``slope_of_floors(min t_L, min t_2L, inner)``.
    Two aggregation hazards, both measured in this repo's smoke history:
    (a) min of per-round SLOPES is biased downward — one lucky 2L / unlucky
    L chain fabricates an undershooting slope and min keeps it; (b) floors
    sampled in separate per-chain blocks absorb the tunnel's non-stationary
    per-call fixed cost into the subtraction (see ``time_pair_fetch``).
    Warmup runs once, on the first call.
    """

    def make_chain(length):
        @jax.jit
        def chain(x):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, x, None, length=length)
            return jax.tree.leaves(out)[0].ravel()[0]
        return chain

    chain = make_chain(inner)
    chain2 = make_chain(2 * inner)
    warm = [warmup]

    def sample() -> tuple[float, float]:
        w, warm[0] = warm[0], 0
        return time_pair_fetch(lambda: chain(x0), lambda: chain2(x0),
                               repeats=repeats, warmup=w)

    return sample


def slope_of_floors(t_l: float, t_2l: float, inner: int) -> float:
    """Per-apply slope from cross-round chain floors, with the same
    degenerate-slope fallback as ``time_scan_fetch`` (a non-positive slope
    means the problem finished inside the jitter floor; the long-chain
    quotient is then the conservative estimate)."""
    slope = (t_2l - t_l) / inner
    if slope > 0 and t_2l > 0.2 * round_trip_latency():
        return slope
    return t_2l / (2 * inner)


def measure_hbm_bandwidth(nbytes: int = 1 << 28) -> float:
    """Measured triad-style HBM bandwidth (bytes/s) on the default device.

    Used to compute the roofline the matvec is judged against
    (BASELINE.md: >= 80% of per-chip HBM roofline).
    """
    n = nbytes // 4
    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 2.0, jnp.float32)
    t = time_scan_fetch(lambda x: x + 0.5 * b, a, inner=20, repeats=3, warmup=1)
    return 3 * n * 4 / t
