"""Same-session interleaved A/B: layers_per_step L in {1, 2, 4}.

p=4 s=13 split3 and bf16.  Appends to tools/PROBE_FUSED.txt.
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

    log(f"# probe_L backend={jax.default_backend()}")

    for prec_mode, dt, label in (("split3", jnp.float32, "f32/split3"),
                                 ("bf16", jnp.bfloat16, "bf16")):
        problem = bp4.build(13, 4, dtype=dt, backend="pallas",
                            precision=prec_mode, windowing="pieces",
                            metric_dtype=(jnp.bfloat16 if dt == jnp.bfloat16
                                          else None))
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)
        fns = {}
        for L in (1, 2, 4):
            @jax.jit
            def solve50(b_, p_, L=L):
                return cg_fused.fused_merged_cg_solve(
                    problem.op, lataxis, b_, p_, max_iter=50,
                    rel_tol=0.0, abs_tol=0.0, layers_per_step=L)
            solve50(b_lat, prec_lat)
            fns[L] = solve50
        for rnd in range(2):
            for L in (1, 2, 4):
                t = timing.time_min_fetch(
                    lambda: fns[L](b_lat, prec_lat).res_norm,
                    repeats=2) / 50
                log(f"L-probe {label} round {rnd} L={L}: {t*1e6:8.1f} us/it  "
                    f"{problem.n_dofs/t/1e9:.2f} G")


if __name__ == "__main__":
    main()
