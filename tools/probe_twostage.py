"""Same-session A/B: dense vs twostage factorization in the fused kernel.

VERDICT round-2 item 1b: measure the two-stage (z-on-VPU + 2D MXU stage)
form instead of extrapolating it.  Parity at p=4 s=7, then interleaved
100-iteration timings at the ladder sizes for the degrees where the
(p+1)x FLOP cut should matter most.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_TWOSTAGE.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_twostage backend={jax.default_backend()}")

    # -- parity: identical iteration counts on-chip ---------------------
    for factor in ("dense", "twostage"):
        pb = bp4.build(7, 4, dtype=jnp.float32, backend="pallas",
                       precision="split3", windowing="pieces", factor=factor)
        lat = pb.layout.n_nodes_axis
        r = jax.jit(lambda pb=pb, lat=lat: cg_fused.fused_merged_cg_solve(
            pb.op, lat, pb.b.reshape((3,) + lat),
            pb.inv_diag.reshape((1,) + lat)))()
        log(f"parity p=4 s=7 split3 {factor}: itCG={int(r.n_iterations)} "
            f"res={float(r.res_norm):.3e} conv={bool(r.converged)}")

    # -- timing A/B at ladder sizes --------------------------------------
    cases = [
        (4, 13, "split3"),
        (4, 13, "split2m"),
        (5, 12, "split2m"),
        (6, 12, "split2m"),
        (6, 12, "split3"),
    ]
    for p, s, prec in cases:
        fns = {}
        nits = {}
        ndofs = 0
        for factor in ("dense", "twostage"):
            problem = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                                precision=prec, windowing="pieces",
                                factor=factor)
            ndofs = problem.n_dofs
            lataxis = problem.layout.n_nodes_axis
            b_lat = problem.b.reshape((3,) + lataxis)
            prec_lat = problem.inv_diag.reshape((1,) + lataxis)

            @jax.jit
            def solve(b_, p_, problem=problem, lataxis=lataxis):
                return cg_fused.fused_merged_cg_solve(
                    problem.op, lataxis, b_, p_, max_iter=100,
                    rel_tol=0.0, abs_tol=0.0)
            # CAUTION: rel_tol=0 does NOT guarantee 100 iterations — the
            # sigma-trick res^2 can hit <= 0 (or NaN) in reduced precision
            # and exit the while-loop early.  Always divide by the ACTUAL
            # iteration count (deterministic across repeats).
            r = solve(b_lat, prec_lat)
            nits[factor] = int(r.n_iterations)
            fns[factor] = lambda f=solve, b=b_lat, pr=prec_lat: f(b, pr).res_norm
        for rnd in range(2):
            for factor in ("dense", "twostage"):
                t = timing.time_min_fetch(fns[factor], repeats=2) / nits[factor]
                log(f"p={p} s={s} {prec} round {rnd} {factor}: "
                    f"{t*1e6:8.1f} us/it  {ndofs/t/1e9:.2f} G  "
                    f"(nit={nits[factor]})")


if __name__ == "__main__":
    main()
