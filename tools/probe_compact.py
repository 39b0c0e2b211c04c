"""Same-session interleaved A/B: compact mm-only state vs full piece rows.

Parity first (p=2 s=7), then p=4 s=13 for split3/f32 and bf16.
Appends to tools/PROBE_FUSED.txt.
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

    log(f"# probe_compact backend={jax.default_backend()}")

    problem = bp4.build(7, 2, dtype=jnp.float32, backend="pallas",
                        precision="split3", windowing="pieces")
    lat = problem.layout.n_nodes_axis
    ref = jax.jit(lambda: cg_merged.merged_cg_solve(
        problem.a_apply, problem.b, problem.inv_diag))()
    res = jax.jit(lambda: cg_fused.fused_merged_cg_solve(
        problem.op, lat, problem.b.reshape((3,) + lat),
        problem.inv_diag.reshape((1,) + lat), compact=True))()
    log(f"parity p=2 s=7 split3 compact: itCG merged={int(ref.n_iterations)}"
        f" fused={int(res.n_iterations)} res {float(ref.res_norm):.3e} vs "
        f"{float(res.res_norm):.3e}")

    for prec_mode, dt, md, label in (
            ("split3", jnp.float32, None, "f32/split3"),
            ("bf16", jnp.bfloat16, jnp.bfloat16, "bf16")):
        problem = bp4.build(13, 4, dtype=dt, backend="pallas",
                            precision=prec_mode, windowing="pieces",
                            metric_dtype=md)
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)
        fns = {}
        for compact in (False, True):
            @jax.jit
            def solve_const(b_, p_, c=compact):
                return cg_fused.fused_merged_cg_solve(
                    problem.op, lataxis, b_, p_, max_iter=50,
                    rel_tol=0.0, abs_tol=0.0, compact=c)

            @jax.jit
            def solve_arg(op, b_, p_, c=compact):
                return cg_fused.fused_merged_cg_solve(
                    op, lataxis, b_, p_, max_iter=50,
                    rel_tol=0.0, abs_tol=0.0, compact=c)
            solve_const(b_lat, prec_lat)
            solve_arg(problem.op, b_lat, prec_lat)
            fns[(compact, "const")] = lambda f=solve_const: f(
                b_lat, prec_lat).res_norm
            fns[(compact, "arg")] = lambda f=solve_arg: f(
                problem.op, b_lat, prec_lat).res_norm
        for rnd in range(2):
            for key in fns:
                t = timing.time_min_fetch(fns[key], repeats=2) / 50
                log(f"compact-probe {label} round {rnd} "
                    f"compact={int(key[0])} op={key[1]}: {t*1e6:8.1f} us/it"
                    f"  {problem.n_dofs/t/1e9:.2f} G")


if __name__ == "__main__":
    main()
