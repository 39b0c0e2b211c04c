"""Same-session A/B: split3 as 3 passes vs one K-stacked matmul (p=4 s=13)."""

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

    import mf_data_locality_tpu.ops.laplace_pallas as lp
    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_splitk backend={jax.default_backend()}")
    problem = bp4.build(13, 4, dtype=jnp.float32, backend="pallas",
                        precision="split3", windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)
    fns = {}
    for fusedk in (False, True):
        lp.SPLIT3_FUSED_K = fusedk

        @jax.jit
        def solve(b_, p_, k=fusedk):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, p_, max_iter=100,
                rel_tol=0.0, abs_tol=0.0)
        r = solve(b_lat, prec_lat)
        fns[fusedk] = lambda f=solve: f(b_lat, prec_lat).res_norm
    for rnd in range(2):
        for fusedk in (False, True):
            t = timing.time_min_fetch(fns[fusedk], repeats=2) / 100
            log(f"splitk round {rnd} fusedK={int(fusedk)}: "
                f"{t*1e6:8.1f} us/it  {problem.n_dofs/t/1e9:.2f} G")


if __name__ == "__main__":
    main()
