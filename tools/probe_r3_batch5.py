"""Round-3 TPU batch 5: prestacked-matrix kernel timings.

Re-time the key configuration points with the prestacked matrices
(matrices rounded/K-stacked once outside the kernel instead of per call;
batch-3 located ~80% of the p=4 iteration in the operator block).
Compare against the same-day batch-3 numbers (bw ~925 GB/s): full 275-278,
L=2 258, no-operator 62, piece_vmult 224.

Run detached:  setsid python tools/probe_r3_batch5.py < /dev/null \
                 > tools/R3_BATCH5.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH5.txt"


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
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_r3_batch5 (prestacked) backend={jax.default_backend()}")
    bw = timing.measure_hbm_bandwidth()
    log(f"# session bandwidth {bw/1e9:.0f} GB/s")

    def timed(p, s, prec, factor, label, dtype=jnp.float32, mdt=None, L=1):
        try:
            pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                           precision=prec, windowing="pieces",
                           factor=factor, metric_dtype=mdt)
            lat = pb.layout.n_nodes_axis
            bl = pb.b.reshape((3,) + lat)
            pl_ = pb.inv_diag.reshape((1,) + lat)

            @jax.jit
            def solve(b_, pr_):
                return cg_fused.fused_merged_cg_solve(
                    pb.op, lat, b_, pr_, max_iter=100,
                    rel_tol=0.0, abs_tol=0.0, layers_per_step=L)
            r = solve(bl, pl_)
            nit = int(r.n_iterations)
            fn = lambda: solve(bl, pl_).res_norm
            for rnd in range(2):
                t = timing.time_min_fetch(fn, repeats=2) / nit
                log(f"{label} round {rnd}: {t*1e6:8.1f} us/it  "
                    f"{pb.n_dofs/t/1e9:.2f} G  (nit={nit})")
            return pb
        except Exception:
            log(f"{label}: FAILED")
            log(traceback.format_exc())
            return None

    pb = timed(4, 13, "split2m", "dense", "p=4 split2m prestack")
    timed(4, 13, "split2m", "dense", "p=4 split2m prestack L=2", L=2)
    timed(4, 13, "split3", "dense", "p=4 split3 prestack")
    timed(4, 13, "bf16", "dense", "p=4 bf16 prestack",
          dtype=jnp.bfloat16, mdt=jnp.bfloat16)
    timed(5, 12, "split2m", "twostage", "p=5 split2m twostage prestack")
    timed(6, 12, "split2m", "twostage", "p=6 split2m twostage prestack")
    timed(7, 11, "split2m", "twostage", "p=7 split2m twostage prestack")

    # operator-only matvec with prestacking (vs batch-3 223.6)
    if pb is not None:
        try:
            p = 4
            lat = pb.layout.n_nodes_axis
            d0 = fk.to_piece_state(pb.b.reshape((3,) + lat), p)[:, :, :p * p]
            zd0 = fk.zplanes_init(d0, p)
            t = timing.time_scan_fetch(
                lambda c: fk.piece_vmult(pb.op, lat, c[0], c[1],
                                         compact=True),
                (d0, zd0), inner=50, repeats=2)
            log(f"p=4 split2m piece_vmult prestack: {t*1e6:8.1f} us/apply")
        except Exception:
            log("piece_vmult: FAILED")
            log(traceback.format_exc())
    log("# batch5 done")


if __name__ == "__main__":
    main()
