"""Round-3 TPU batch 7: VPU-pass reduction in the operator block.

Batch-6 budget at p=4 split2m (bw 884): full 252, no-metric 145.5,
no-metric+split1 83-86, L=2 253-259, piece_vmult 228.  The VPU is the
serial bottleneck: metric contraction ~106 us, stream-split machinery
~60-110 us.  This batch tests three reductions:

  - fusesplit: round the metric outputs straight to hi/lo bf16 (exact
    restructure of split2m's backward product; one fewer VPU pass over
    the (3q^3, B) stream, half the stream write traffic)
  - reorder: stage-major instruction order (all fwd MXU, all VPU metric,
    all bwd MXU) — does Mosaic overlap independent MXU/VPU work when the
    program interleaves them?
  - metricbf16: all-bf16 metric arithmetic — is the VPU 2x at bf16?
    (timing probe under split2m; a legitimate candidate for the
    reduced-precision bf16 rung, which batch-6 shows is also
    metric-bound: 203 vs 84 us with metric+split elided)

Run detached:  setsid python tools/probe_r3_batch7.py < /dev/null \
                 > tools/R3_BATCH7.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH7.txt"


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
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_r3_batch7 backend={jax.default_backend()}")
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

        dtype = b_lat.dtype
        acc = jnp.float32 if dtype == jnp.bfloat16 else dtype

        @jax.jit
        def run_ab(b_, pr_):
            # mirror the solver's state dtypes: x, g, zg at acc; d, h (and
            # their z-planes) at the reduced storage dtype
            prec_pieces = fk.to_piece_state(
                pr_.astype(acc), p)[:, :, :p2]
            g0 = fk.to_piece_state(-b_.astype(acc), p)[:, :, :p2]
            x = jnp.zeros_like(g0)
            d = jnp.zeros(g0.shape, dtype)
            h = jnp.zeros(g0.shape, dtype)
            zg = fk.zplanes_init(g0, p)
            zd = jnp.zeros(zg.shape, dtype)
            zh = jnp.zeros(zg.shape, dtype)
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
        ("fusesplit", ("fusesplit",)),
        ("reorder", ("reorder",)),
        ("fusesplit reorder", ("fusesplit", "reorder")),
        ("metricbf16", ("metricbf16",)),
        ("metricbf16 fusesplit", ("metricbf16", "fusesplit")),
    ]
    for label, ab in cases:
        try:
            fn = ablated_runner(pb, ab)
            r0 = float(fn())
            for rnd in range(2):
                t = timing.time_min_fetch(fn, repeats=2) / 100
                log(f"p=4 split2m {label} round {rnd}: {t*1e6:8.1f} us/it  "
                    f"(res {r0:.3e})")
        except Exception:
            log(f"p=4 split2m {label}: FAILED")
            log(traceback.format_exc())

    # bf16 rung: budget + the bf16-metric-math candidate
    try:
        pbb = build("bf16", dtype=jnp.bfloat16, mdt=jnp.bfloat16)
        for label, ab in [("full", ()), ("no-metric", ("metric",)),
                          ("metricbf16", ("metricbf16",))]:
            fn = ablated_runner(pbb, ab)
            r0 = float(fn())
            for rnd in range(2):
                t = timing.time_min_fetch(fn, repeats=2) / 100
                log(f"p=4 bf16 {label} round {rnd}: {t*1e6:8.1f} us/it  "
                    f"(res {r0:.3e})")
    except Exception:
        log("p=4 bf16 ablations: FAILED")
        log(traceback.format_exc())
    log("# batch7 done")


if __name__ == "__main__":
    main()
