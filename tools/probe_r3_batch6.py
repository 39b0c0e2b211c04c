"""Round-3 TPU batch 6: fine-grained operator-block ablations at p=4.

Batch-3/5 located the p=4 split2m iteration's cost: state sweep 62 us
(at HBM roofline), operator block ~215 us vs a 2-pass MXU floor of
81-125 us.  Candidate overheads inside the operator: the 9-FMA VPU
metric contraction (~80M ops/it), the hi/lo stream-split VPU work on
the (648, B) backward stream, the extra MXU pass, and M-padding waste
(648 -> 768).  This batch separates them:

  - no-metric            -> VPU metric contraction cost
  - split1 / fsplit1 / bsplit1 -> stream-split VPU + extra MXU pass
                            (both / forward-only / backward-only)
  - no-fwd / no-bwd      -> one full MXU contraction each
  - no-metric+split1     -> compound floor check
  - bf16 rung no-metric  -> does the metric also dominate the bf16 gap
                            (203 us vs 64 us one-pass floor)?
plus clean re-runs of the two corrupted batch-5 rows (L=2, piece_vmult).

Run detached:  setsid python tools/probe_r3_batch6.py < /dev/null \
                 > tools/R3_BATCH6.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH6.txt"


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

    log(f"# probe_r3_batch6 backend={jax.default_backend()}")
    bw = timing.measure_hbm_bandwidth()
    log(f"# session bandwidth {bw/1e9:.0f} GB/s")

    p = 4

    def build(prec, dtype=jnp.float32, mdt=None):
        return bp4.build(13, p, dtype=dtype, backend="pallas",
                         precision=prec, windowing="pieces",
                         metric_dtype=mdt)

    def ablated_runner(problem, ablate, L=1):
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)
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

        return lambda: run_ab(b_lat, prec_lat)

    pb = build("split2m")
    cases = [
        ("full", ()),
        ("no-metric", ("metric",)),
        ("split1", ("split1",)),
        ("fsplit1", ("fsplit1",)),
        ("bsplit1", ("bsplit1",)),
        ("no-fwd", ("fwd",)),
        ("no-bwd", ("bwd",)),
        ("no-metric split1", ("metric", "split1")),
    ]
    for label, ab in cases:
        try:
            fn = ablated_runner(pb, ab)
            fn()
            for rnd in range(2):
                t = timing.time_min_fetch(fn, repeats=2) / 100
                log(f"p=4 split2m {label} round {rnd}: {t*1e6:8.1f} us/it")
        except Exception:
            log(f"p=4 split2m {label}: FAILED")
            log(traceback.format_exc())

    # bf16 rung: is the 203-64 us gap also the metric contraction?
    try:
        pbb = build("bf16", dtype=jnp.bfloat16, mdt=jnp.bfloat16)
        for label, ab in [("full", ()), ("no-metric", ("metric",))]:
            fn = ablated_runner(pbb, ab)
            fn()
            for rnd in range(2):
                t = timing.time_min_fetch(fn, repeats=2) / 100
                log(f"p=4 bf16 {label} round {rnd}: {t*1e6:8.1f} us/it")
    except Exception:
        log("p=4 bf16 ablations: FAILED")
        log(traceback.format_exc())

    # clean re-runs of the corrupted batch-5 rows
    try:
        fn = ablated_runner(pb, (), L=2)
        fn()
        for rnd in range(2):
            t = timing.time_min_fetch(fn, repeats=2) / 100
            log(f"p=4 split2m L=2 CLEAN round {rnd}: {t*1e6:8.1f} us/it")
    except Exception:
        log("p=4 split2m L=2 CLEAN: FAILED")
        log(traceback.format_exc())
    try:
        lat = pb.layout.n_nodes_axis
        bl = pb.b.reshape((3,) + lat)
        d0 = fk.to_piece_state(bl, p)[:, :, :p * p]
        zd0 = fk.zplanes_init(d0, p)
        t = timing.time_scan_fetch(
            lambda c: fk.piece_vmult(pb.op, lat, c[0], c[1], compact=True),
            (d0, zd0), inner=50, repeats=2)
        log(f"p=4 split2m piece_vmult CLEAN: {t*1e6:8.1f} us/apply")
    except Exception:
        log("piece_vmult CLEAN: FAILED")
        log(traceback.format_exc())
    log("# batch6 done")


if __name__ == "__main__":
    main()
