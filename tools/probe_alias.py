"""TPU probe: state-buffer aliasing in the fused kernel (copy elimination).

Parity first (itCG + residual vs merged at p=2 s=7), then same-session
timing at p=4 s=13 for split3 and bf16.  Appends to tools/PROBE_FUSED.txt.
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
    from mf_data_locality_tpu.solvers import cg_fused, cg_merged
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_alias backend={jax.default_backend()}")

    problem = bp4.build(7, 2, dtype=jnp.float32, backend="pallas",
                        precision="split3", windowing="pieces")
    lat = problem.layout.n_nodes_axis
    ref = jax.jit(lambda: cg_merged.merged_cg_solve(
        problem.a_apply, problem.b, problem.inv_diag))()
    res = jax.jit(lambda: cg_fused.fused_merged_cg_solve(
        problem.op, lat, problem.b.reshape((3,) + lat),
        problem.inv_diag.reshape((1,) + lat)))()
    log(f"parity p=2 s=7 split3 aliased: itCG merged={int(ref.n_iterations)} "
        f"fused={int(res.n_iterations)} res {float(ref.res_norm):.3e} vs "
        f"{float(res.res_norm):.3e}")
    ok = int(ref.n_iterations) == int(res.n_iterations)
    if not ok:
        log("# ALIAS PARITY FAILED — do not trust timings")

    for prec_mode, dt, md, label in (
            ("split3", jnp.float32, None, "f32/split3"),
            ("split3", jnp.float32, jnp.bfloat16, "f32/split3/bf16metric"),
            ("bf16", jnp.bfloat16, jnp.bfloat16, "bf16/bf16/bf16metric")):
        problem = bp4.build(13, 4, dtype=dt, backend="pallas",
                            precision=prec_mode, windowing="pieces",
                            metric_dtype=md)
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)

        @jax.jit
        def solve50(b_, p_, problem=problem, lataxis=lataxis):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, p_, max_iter=50,
                rel_tol=0.0, abs_tol=0.0)
        r = solve50(b_lat, prec_lat)
        n_it = int(r.n_iterations)
        t = timing.time_min_fetch(
            lambda: solve50(b_lat, prec_lat).res_norm,
            repeats=4) / max(n_it, 1)
        log(f"fused-aliased p=4 s=13 {label}: {t*1e6:8.1f} us/it  "
            f"{problem.n_dofs/t/1e9:.2f} GDoF/s/it")


if __name__ == "__main__":
    main()
