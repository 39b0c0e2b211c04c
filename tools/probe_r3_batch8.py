"""Round-3 TPU batch 8: single-pass stream rungs — RTN vs stochastic.

Batch-6/7 showed the split2m iteration is VPU-serial-bound: metric ~106
us (ALU floor), hi/lo split machinery + extra MXU passes ~70 us
(split1 ablate: 195 vs 265 us/it), and no Mosaic MXU/VPU overlap to
exploit.  The remaining lever is dropping the stream splits: single-pass
bf16 streams over f32 state.  Two candidate rungs:

  - ``--dtype f32 --precision bf16``  (split1-RTN): round-to-nearest
    stream casts; per-apply biased noise ~4e-3.
  - ``--dtype f32 --precision bf16sr``: NEW — stochastically rounded
    stream casts (pltpu.stochastic_round), zero-mean per-apply noise;
    CG sees an unbiased inexact matvec.

Protocol: timing at the p=4 headline point, then itCG at the on-chip
convergent points (PARITY.md ladder; f64 refs p2@s10=67-ish, p3@s9=95,
p4@s7=91, p5@s6=95, p6@s4=75), then the extended timing ladder if the
iteration counts hold.  Also: does SR rescue the reduced-precision
dtype=bf16 rung's 1e-5 stall?

Run detached:  setsid python tools/probe_r3_batch8.py < /dev/null \
                 > tools/R3_BATCH8.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH8.txt"


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

    log(f"# probe_r3_batch8 backend={jax.default_backend()}")
    bw = timing.measure_hbm_bandwidth()
    log(f"# session bandwidth {bw/1e9:.0f} GB/s")

    def timed(p, s, prec, label, dtype=jnp.float32, mdt=None):
        try:
            pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                           precision=prec, windowing="pieces",
                           metric_dtype=mdt)
            lat = pb.layout.n_nodes_axis
            bl = pb.b.reshape((3,) + lat)
            pl_ = pb.inv_diag.reshape((1,) + lat)

            @jax.jit
            def solve(b_, pr_):
                return cg_fused.fused_merged_cg_solve(
                    pb.op, lat, b_, pr_, max_iter=100,
                    rel_tol=0.0, abs_tol=0.0)
            r = solve(bl, pl_)
            nit = int(r.n_iterations)
            fn = lambda: solve(bl, pl_).res_norm
            for rnd in range(2):
                t = timing.time_min_fetch(fn, repeats=2) / nit
                log(f"{label} round {rnd}: {t*1e6:8.1f} us/it  "
                    f"{pb.n_dofs/t/1e9:.2f} G  (nit={nit})")
        except Exception:
            log(f"{label}: FAILED")
            log(traceback.format_exc())

    def conv(p, s, prec, it_ref, label, dtype=jnp.float32, mdt=None):
        try:
            pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                           precision=prec, windowing="pieces",
                           metric_dtype=mdt)
            lat = pb.layout.n_nodes_axis
            r = jax.jit(
                lambda pb=pb, lat=lat: cg_fused.fused_merged_cg_solve(
                    pb.op, lat, pb.b.reshape((3,) + lat),
                    pb.inv_diag.reshape((1,) + lat)))()
            log(f"conv {label} p={p} s={s}: itCG={int(r.n_iterations)} "
                f"(f64 ref {it_ref}) res={float(r.res_norm):.3e} "
                f"conv={bool(r.converged)}")
        except Exception:
            log(f"conv {label} p={p} s={s}: FAILED")
            log(traceback.format_exc())

    # -- timing first: is the single-pass f32-state iteration ~195 us? ----
    timed(4, 13, "bf16", "p=4 f32-state RTN (split1)")
    timed(4, 13, "bf16sr", "p=4 f32-state SR")

    # -- convergence ladder ----------------------------------------------
    pts = [(2, 10, 67), (3, 9, 95), (4, 7, 91), (5, 6, 95), (6, 4, 75)]
    for p, s, ref in pts:
        conv(p, s, "bf16", ref, "f32-state RTN")
        conv(p, s, "bf16sr", ref, "f32-state SR")

    # -- does SR rescue the reduced (dtype=bf16) rung's stall? ------------
    for p, s, ref in pts:
        conv(p, s, "bf16sr", ref, "bf16-state SR",
             dtype=jnp.bfloat16, mdt=jnp.bfloat16)

    # -- extended timing ladder for the SR rung ---------------------------
    timed(3, 14, "bf16sr", "p=3 f32-state SR")
    timed(5, 12, "bf16sr", "p=5 f32-state SR (twostage)")
    timed(6, 12, "bf16sr", "p=6 f32-state SR (twostage)")
    timed(7, 11, "bf16sr", "p=7 f32-state SR (twostage)")
    timed(4, 13, "bf16sr", "p=4 bf16-state SR",
          dtype=jnp.bfloat16, mdt=jnp.bfloat16)
    log("# batch8 done")


if __name__ == "__main__":
    main()
