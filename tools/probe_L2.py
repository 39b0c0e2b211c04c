"""Same-session A/B: layers_per_step at p=2 s=14 (small per-step work).

At p=4 multi-layer steps measured neutral-to-worse; p=2 has 4x less work
per step so fixed per-step overheads weigh more.  100-iteration solves
(reliable timing).  Appends to tools/PROBE_FUSED.txt.
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

    log(f"# probe_L2 backend={jax.default_backend()}")
    problem = bp4.build(14, 2, dtype=jnp.float32, backend="pallas",
                        precision="split3", windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)
    fns = {}
    for L in (1, 2, 4):
        @jax.jit
        def solve(b_, p_, L=L):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, p_, max_iter=100,
                rel_tol=0.0, abs_tol=0.0, layers_per_step=L)
        solve(b_lat, prec_lat)
        fns[L] = lambda f=solve: f(b_lat, prec_lat).res_norm
    for rnd in range(2):
        for L in (1, 2, 4):
            t = timing.time_min_fetch(fns[L], repeats=2) / 100
            log(f"L2-probe p=2 s=14 round {rnd} L={L}: {t*1e6:8.1f} us/it  "
                f"{problem.n_dofs/t/1e9:.2f} G")


if __name__ == "__main__":
    main()
