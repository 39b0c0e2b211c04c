"""Round-3 TPU batch 3: in-kernel cost ablations at the p=4 headline point.

The p=4 split2m iteration (~265 us) sits far above its component floor
(2-pass MXU ~120 us fully overlapped with ~110 us of DMA).  Ablate the
kernel's VPU phases to locate the serial overhead:

  - full iteration (baseline)
  - _ablate=("dots",)          -> cost of the 7 fused dot products
  - _ablate=("consistency",)   -> cost of the piece-consistency rolls
  - _ablate=("mask",)          -> cost of the per-layer iota mask build
  - piece_vmult chain          -> operator-only cost (no update4b/dots)
  - layers_per_step=2          -> cross-layer MXU/VPU overlap under split2m
plus a clean re-run of the contention-corrupted p=5 split3 dense rows and
the p=8 dense check.

Run detached:  setsid python tools/probe_r3_batch3.py < /dev/null \
                 > tools/R3_BATCH3.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH3.txt"


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

    log(f"# probe_r3_batch3 backend={jax.default_backend()}")
    bw = timing.measure_hbm_bandwidth()
    log(f"# session bandwidth {bw/1e9:.0f} GB/s")

    p, s, prec = 4, 13, "split2m"
    problem = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                        precision=prec, windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)
    ndofs = problem.n_dofs

    # -- ablations: fixed 100-iteration loop on the raw iteration ----------
    def solve_with(ablate=(), L=1):
        @jax.jit
        def run(b_, pr_):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, pr_, max_iter=100,
                rel_tol=0.0, abs_tol=0.0, layers_per_step=L)
        if not ablate and L == 1:
            return run
        # ablated forms change the math - drive the kernel loop directly
        p2 = p * p

        @jax.jit
        def run_ab(b_, pr_):
            prec_pieces = fk.to_piece_state(pr_, p)[:, :, :p2]
            g0 = fk.to_piece_state(-b_, p)[:, :, :p2]
            x = jnp.zeros_like(g0)
            d = jnp.zeros_like(g0)
            h = jnp.zeros_like(g0)
            zg = fk.zplanes_init(g0, p)
            zd = jnp.zeros_like(zg)
            zh = jnp.zeros_like(zg)
            scal = jnp.zeros((8,), jnp.float32).at[4].set(1.0)

            def body(i, st):
                x, g, d, h, zg, zd, zh, scal = st
                x, g, d, h, zg, zd, zh, scal = fk.fused_cg_iteration(
                    problem.op, lataxis, x, g, d, h, zg, zd, zh, scal,
                    prec_pieces, compact=True, layers_per_step=L,
                    _ablate=ablate)
                return (x, g, d, h, zg, zd, zh, scal)

            out = jax.lax.fori_loop(
                0, 100, body, (x, g0, d, h, zg, zd, zh, scal))
            return out[7][5]
        return run_ab

    cases = [
        ("full", (), 1),
        ("no-dots", ("dots",), 1),
        ("no-consistency", ("consistency",), 1),
        ("no-mask", ("mask",), 1),
        ("no-dots-no-consistency", ("dots", "consistency"), 1),
        ("no-operator", ("operator",), 1),
        ("streams-only", ("operator", "dots", "consistency"), 1),
        ("L=2", (), 2),
    ]
    for label, ab, L in cases:
        try:
            fn = solve_with(ab, L)
            r = fn(b_lat, prec_lat)
            out = (lambda f=fn: f(b_lat, prec_lat).res_norm) \
                if not ab and L == 1 else (lambda f=fn: f(b_lat, prec_lat))
            nit = int(r.n_iterations) if hasattr(r, "n_iterations") else 100
            for rnd in range(2):
                t = timing.time_min_fetch(out, repeats=2) / nit
                log(f"p=4 split2m {label} round {rnd}: {t*1e6:8.1f} us/it  "
                    f"(nit={nit})")
        except Exception:
            log(f"p=4 split2m {label}: FAILED")
            log(traceback.format_exc())

    # -- operator-only cost: 100-apply piece_vmult chain -------------------
    try:
        d0 = fk.to_piece_state(b_lat, p)[:, :, :p * p]
        zd0 = fk.zplanes_init(d0, p)
        t = timing.time_scan_fetch(
            lambda c: fk.piece_vmult(problem.op, lataxis, c[0], c[1],
                                     compact=True),
            (d0, zd0), inner=50, repeats=2)
        log(f"p=4 split2m piece_vmult: {t*1e6:8.1f} us/apply")
    except Exception:
        log("p=4 split2m piece_vmult: FAILED")
        log(traceback.format_exc())

    # -- clean re-runs of contention-suspect rows --------------------------
    def timed(p_, s_, prec_, factor, label):
        try:
            pb = bp4.build(s_, p_, dtype=jnp.float32, backend="pallas",
                           precision=prec_, windowing="pieces",
                           factor=factor)
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

    timed(5, 12, "split3", "dense", "p=5 s=12 split3 dense CLEAN")
    timed(8, 11, "split2m", "dense", "p=8 s=11 split2m dense")
    log("# batch3 done")


if __name__ == "__main__":
    main()
