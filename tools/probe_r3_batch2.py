"""Round-3 TPU batch 2: x-skip + bf16-P + metric-dtype stacking A/Bs.

Same-session A/Bs at the headline point for each precision class:
  - f32-class candidate stack: split2m (+ bf16 metric) (+ x-skip) (+ bf16 P)
  - split3 + x-skip
  - bf16 rung stack: bf16 (+ x-skip) (+ bf16 P)
  - p=6 twostage best-config check with the stack

Run detached:  setsid python tools/probe_r3_batch2.py < /dev/null \
                 > tools/R3_BATCH2.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH2.txt"


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

    log(f"# probe_r3_batch2 backend={jax.default_backend()}")
    bw = timing.measure_hbm_bandwidth()
    log(f"# session bandwidth {bw/1e9:.0f} GB/s")

    bf = jnp.bfloat16
    # (p, s, dtype, prec, factor, metric_dtype, x_skip, prec_dtype, label)
    cases = [
        (4, 13, jnp.float32, "split2m", "dense", None, False, None,
         "p4 split2m base"),
        (4, 13, jnp.float32, "split2m", "dense", bf, False, None,
         "p4 split2m +metbf16"),
        (4, 13, jnp.float32, "split2m", "dense", bf, True, None,
         "p4 split2m +metbf16 +xskip"),
        (4, 13, jnp.float32, "split2m", "dense", bf, True, bf,
         "p4 split2m +metbf16 +xskip +Pbf16"),
        (4, 13, jnp.float32, "split3", "dense", None, True, None,
         "p4 split3 +xskip"),
        (4, 13, bf, "bf16", "dense", bf, False, None, "p4 bf16 base"),
        (4, 13, bf, "bf16", "dense", bf, True, None, "p4 bf16 +xskip"),
        (4, 13, bf, "bf16", "dense", bf, True, bf, "p4 bf16 +xskip +Pbf16"),
        (6, 12, jnp.float32, "split2m", "twostage", bf, True, bf,
         "p6 split2m twostage full-stack"),
        (5, 12, jnp.float32, "split2m", "twostage", bf, True, bf,
         "p5 split2m twostage full-stack"),
    ]
    for p, s, dtype, prec, factor, mdt, xskip, pdt, label in cases:
        try:
            problem = bp4.build(s, p, dtype=dtype, backend="pallas",
                                precision=prec, windowing="pieces",
                                factor=factor, metric_dtype=mdt)
            lataxis = problem.layout.n_nodes_axis
            b_lat = problem.b.reshape((3,) + lataxis)
            prec_lat = problem.inv_diag.reshape((1,) + lataxis)

            @jax.jit
            def solve(b_, p_, problem=problem, lataxis=lataxis,
                      xskip=xskip, pdt=pdt):
                return cg_fused.fused_merged_cg_solve(
                    problem.op, lataxis, b_, p_, max_iter=100,
                    rel_tol=0.0, abs_tol=0.0, x_skip=xskip, prec_dtype=pdt)
            r = solve(b_lat, prec_lat)
            nit = int(r.n_iterations)
            fn = lambda f=solve, b=b_lat, pr=prec_lat: f(b, pr).res_norm
            for rnd in range(2):
                t = timing.time_min_fetch(fn, repeats=2) / nit
                log(f"{label} round {rnd}: {t*1e6:8.1f} us/it  "
                    f"{problem.n_dofs/t/1e9:.2f} G  (nit={nit})")
        except Exception:
            log(f"{label}: FAILED")
            log(traceback.format_exc())
    log("# batch2 done")


if __name__ == "__main__":
    main()
