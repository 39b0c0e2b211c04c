"""Round-3 TPU batch 1: convergent-point ladder + factorization/metric A/Bs.

VERDICT round-2 items 1a (split2m parity evidence at p=3..6 convergent
points), 5/6 (convergent rows + residual-history deviation vs the f64 CPU
reference in tools/CONV_REF.npz), plus the missing p=5 split3 dense-vs-
twostage datum and the split2m metric-dtype A/B at the headline point.

Run detached:  setsid python tools/probe_r3_batch1.py < /dev/null \
                 > tools/R3_BATCH1.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH1.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_r3_batch1 backend={jax.default_backend()}")

    ref = np.load("/root/repo/tools/CONV_REF.npz")
    hist_out = {}

    # -- A. convergent-point ladder (p, s) x (split3, split2m, bf16) ------
    # (p, s) = largest s converging < 100 it in f64 (tools/CONV_REF.npz);
    # p=6 uses s=4 (s=5 converges exactly at the cap in f64 - too fragile
    # for reduced precision).
    conv_pts = [(3, 9), (4, 7), (5, 6), (6, 4)]
    for p, s in conv_pts:
        it_ref = int(ref[f"p{p}_it"]) if f"p{p}_s" in ref.files and \
            int(ref[f"p{p}_s"]) == s else None
        if it_ref is None:
            # f64 reference at this exact (p, s) from the walk printout
            it_ref = {(6, 4): 75}.get((p, s))
        for prec, dtype, mdt in (("split3", jnp.float32, None),
                                 ("split2m", jnp.float32, None),
                                 ("bf16", jnp.bfloat16, jnp.bfloat16)):
            try:
                pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                               precision=prec, windowing="pieces",
                               metric_dtype=mdt)
                lat = pb.layout.n_nodes_axis
                r = jax.jit(
                    lambda pb=pb, lat=lat: cg_fused.fused_merged_cg_solve(
                        pb.op, lat, pb.b.reshape((3,) + lat),
                        pb.inv_diag.reshape((1,) + lat)))()
                it = int(r.n_iterations)
                hist = np.asarray(r.res_history)[: it + 1]
                hist_out[f"p{p}_s{s}_{prec}"] = hist
                log(f"conv p={p} s={s} {prec}: itCG={it} (f64 ref {it_ref}) "
                    f"res={float(r.res_norm):.3e} conv={bool(r.converged)}")
            except Exception:
                log(f"conv p={p} s={s} {prec}: FAILED")
                log(traceback.format_exc())
        np.savez("/root/repo/tools/CONV_TPU.npz", **hist_out)

    # -- B. timing A/Bs ---------------------------------------------------
    def timed_cases(cases):
        for p, s, prec, factor, mdt, label in cases:
            try:
                problem = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                                    precision=prec, windowing="pieces",
                                    factor=factor, metric_dtype=mdt)
                lataxis = problem.layout.n_nodes_axis
                b_lat = problem.b.reshape((3,) + lataxis)
                prec_lat = problem.inv_diag.reshape((1,) + lataxis)

                @jax.jit
                def solve(b_, p_, problem=problem, lataxis=lataxis):
                    return cg_fused.fused_merged_cg_solve(
                        problem.op, lataxis, b_, p_, max_iter=100,
                        rel_tol=0.0, abs_tol=0.0)
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

    bw = timing.measure_hbm_bandwidth()
    log(f"# session bandwidth {bw/1e9:.0f} GB/s")

    timed_cases([
        # missing p=5 split3 factor A/B
        (5, 12, "split3", "dense", None, "p=5 s=12 split3 dense"),
        (5, 12, "split3", "twostage", None, "p=5 s=12 split3 twostage"),
        # split2m metric-dtype A/B at the headline point
        (4, 13, "split2m", "dense", None, "p=4 s=13 split2m metf32"),
        (4, 13, "split2m", "dense", jnp.bfloat16, "p=4 s=13 split2m metbf16"),
        # p=7 / p=8 ladder rows (reference budget caps s at 11)
        (7, 11, "split2m", "dense", jnp.bfloat16, "p=7 s=11 split2m dense"),
        (7, 11, "split2m", "twostage", jnp.bfloat16,
         "p=7 s=11 split2m twostage"),
        (8, 11, "split2m", "twostage", jnp.bfloat16,
         "p=8 s=11 split2m twostage"),
        (8, 11, "split3", "twostage", jnp.bfloat16,
         "p=8 s=11 split3 twostage"),
    ])
    log("# batch1 done")


if __name__ == "__main__":
    main()
