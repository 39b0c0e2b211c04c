"""Same-session A/B: split3 vs split2m (bf16-rounded matrices, 2 passes).

Parity at p=2 s=7, then interleaved 100-iteration timing at p=4 s=13.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)
    with open("/root/repo/tools/PROBE_FUSED.txt", "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_split2m backend={jax.default_backend()}")
    for prec in ("split3", "split2m"):
        pb = bp4.build(7, 2, dtype=jnp.float32, backend="pallas",
                       precision=prec, windowing="pieces")
        lat = pb.layout.n_nodes_axis
        r = jax.jit(lambda pb=pb, lat=lat: cg_fused.fused_merged_cg_solve(
            pb.op, lat, pb.b.reshape((3,) + lat),
            pb.inv_diag.reshape((1,) + lat)))()
        log(f"parity p=2 s=7 {prec}: itCG={int(r.n_iterations)} "
            f"res={float(r.res_norm):.3e} conv={bool(r.converged)}")

    fns = {}
    ndofs = 0
    for prec in ("split3", "split2m"):
        problem = bp4.build(13, 4, dtype=jnp.float32, backend="pallas",
                            precision=prec, windowing="pieces")
        ndofs = problem.n_dofs
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)

        @jax.jit
        def solve(b_, p_, problem=problem, lataxis=lataxis):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, p_, max_iter=100,
                rel_tol=0.0, abs_tol=0.0)
        solve(b_lat, prec_lat)
        fns[prec] = lambda f=solve, b=b_lat, pr=prec_lat: f(b, pr).res_norm
    for rnd in range(2):
        for prec in ("split3", "split2m"):
            t = timing.time_min_fetch(fns[prec], repeats=2) / 100
            log(f"split2m-probe round {rnd} {prec}: {t*1e6:8.1f} us/it  "
                f"{ndofs/t/1e9:.2f} G")


if __name__ == "__main__":
    main()
