"""Same-session A/B: lane-folded vs per-component fused CG kernel (TPU).

Measures the headline point p=4 s=13 under split3/f32 and bf16/bf16 with
fold on and off, plus an iteration-parity sanity check at p=2 s=7.
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

    log(f"# probe_fold backend={jax.default_backend()}")

    problem = bp4.build(7, 2, dtype=jnp.float32, backend="pallas",
                        precision="split3", windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)
    ref = jax.jit(lambda: cg_merged.merged_cg_solve(
        problem.a_apply, problem.b, problem.inv_diag))()
    for fold in (False, True):
        res = jax.jit(lambda f=fold: cg_fused.fused_merged_cg_solve(
            problem.op, lataxis, b_lat, prec_lat, fold=f))()
        log(f"parity p=2 s=7 split3 fold={fold}: itCG merged="
            f"{int(ref.n_iterations)} fused={int(res.n_iterations)} "
            f"res {float(ref.res_norm):.3e} vs {float(res.res_norm):.3e}")

    for prec_mode, dt, label in (("split3", jnp.float32, "f32/split3"),
                                 ("bf16", jnp.bfloat16, "bf16/bf16")):
        problem = bp4.build(13, 4, dtype=dt, backend="pallas",
                            precision=prec_mode, windowing="pieces")
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)
        for fold in (False, True):
            @jax.jit
            def solve50(b_, p_, f=fold):
                return cg_fused.fused_merged_cg_solve(
                    problem.op, lataxis, b_, p_, max_iter=50,
                    rel_tol=0.0, abs_tol=0.0, fold=f)
            r = solve50(b_lat, prec_lat)
            n_it = int(r.n_iterations)
            t = timing.time_min_fetch(
                lambda: solve50(b_lat, prec_lat).res_norm,
                repeats=4) / max(n_it, 1)
            dofs = problem.n_dofs
            log(f"fused p=4 s=13 {label} fold={int(fold)}: {t*1e6:8.1f} us/it"
                f"  {dofs/t/1e9:.2f} GDoF/s/it  (n_it={n_it})")


if __name__ == "__main__":
    main()
