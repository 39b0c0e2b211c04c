"""Round-5 part B: per-degree serial-chain ablation in the SHIPPING shape.

VERDICT r4 item 6: the "remaining gap is serial VPU on one core" floor
claim rests on an R3_BATCH6 ablation measured at p=4 in the OLD
metric-streaming shape; the shipping shape (onthefly rebuild, twostage at
p>=4(f32-class)/5) has no per-phase budget at any degree.  This probe
re-runs the in-kernel ablation ladder at p=1, 2, 4, 9 with the shipping
config (split2m + resolve_factor/resolve_metric auto results) and
publishes the per-phase us/it breakdown per degree.

Ablations (one at a time; "wrong values, identical operand streams"):
  base         the full iteration
  dots         elide the 7 partial dot products
  metric       elide the 9-FMA metric application
  invert       keep the MXU Jacobian eval, elide the VPU cofactor/det/
               assembly chain (onthefly only)
  rebuild      elide the whole onthefly rebuild incl. the J matmul
  split1       pre-round both streams to bf16 (single MXU pass — isolates
               the hi/lo split VPU work + the extra pass)
  operator     elide the MXU contractions + metric entirely
  oper+cons    additionally elide the consistency rolls

Timing: two-chain slope over chained fused iterations (latency-immune).

Run: setsid python tools/probe_r5_ablate.py < /dev/null > tools/PROBE_R5_ABLATE.log 2>&1 &
Artifact: tools/PROBE_R5_ABLATE.txt
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_R5_ABLATE.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def make_step(p, s, factor, metric, ablate):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk
    from mf_data_locality_tpu.benchmark import resolve_cofactor

    pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                   precision="split2m", windowing="pieces",
                   factor=factor, metric=metric,
                   cofactor=resolve_cofactor("auto", p, factor, metric))
    op_c = jax.tree.map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, pb.op)
    lat = pb.layout.n_nodes_axis
    p2 = p * p
    b_lat = pb.b.reshape((pb.n_components,) + lat)
    prec_lat = pb.inv_diag.reshape((1,) + lat)
    g0 = fk.to_piece_state(-b_lat.astype(jnp.float32), p)[:, :, :p2]
    prec_pieces = fk.to_piece_state(prec_lat.astype(jnp.float32), p)[:, :, :p2]
    zg0 = fk.zplanes_init(g0, p)
    state0 = (jnp.zeros_like(g0), g0,
              jnp.zeros_like(g0), jnp.zeros_like(g0),
              zg0, jnp.zeros_like(zg0), jnp.zeros_like(zg0),
              jnp.zeros((8,), jnp.float32).at[4].set(1.0))

    def step(st):
        x, g, d, h, zg, zd, zh, scal = st
        return fk.fused_cg_iteration(op_c, lat, x, g, d, h, zg, zd, zh,
                                     scal, prec_pieces, compact=True,
                                     _ablate=ablate)

    return step, state0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mf_data_locality_tpu.utils import timing
    from mf_data_locality_tpu.benchmark import resolve_factor, resolve_metric

    bw = timing.measure_hbm_bandwidth()
    log(f"# shipping-shape ablation  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency="
        f"{timing.round_trip_latency()*1e3:.1f} ms  config: split2m "
        f"factor/metric=auto-resolved")

    LADDER = {1: 17, 2: 15, 4: 13, 9: 10}
    ABL = [("base", ()), ("dots", ("dots",)), ("metric", ("metric",)),
           ("invert", ("invert",)), ("rebuild", ("rebuild",)),
           ("split1", ("split1",)), ("operator", ("operator",)),
           ("oper+cons", ("operator", "consistency"))]

    for p in (1, 2, 4, 9):
        s = LADDER[p]
        factor = resolve_factor("auto", p, "pieces", precision="split2m",
                                solver="fused")
        metric = resolve_metric("auto", "fused", "pieces", factor, p,
                                precision="split2m")
        log(f"# p={p} s={s} factor={factor} metric={metric}")
        built = []
        for name, abl in ABL:
            if metric != "onthefly" and ("invert" in abl or "rebuild" in abl):
                continue
            try:
                built.append((name, make_step(p, s, factor, metric, abl)))
            except Exception:
                log(f"  p={p} {name:9s} BUILD FAILED")
                log(traceback.format_exc())
        # interleaved rounds, inner=50 (the inner=25 slope is jitter-
        # dominated on the tunneled backend: see PROBE_R5_COFACTOR run1)
        res = {}
        for rnd in range(3):
            for name, (step, st) in built:
                try:
                    t = timing.time_scan_fetch(step, st, inner=50, repeats=3)
                    res[name] = min(res.get(name, float("inf")), t)
                except Exception:
                    log(f"  p={p} {name:9s} FAILED")
                    log(traceback.format_exc())
        for name, _ in ABL:
            if name in res:
                log(f"  p={p} {name:9s} {res[name]*1e6:8.1f} us/it")

    ok, cached, fresh = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'REJECTED'} "
        f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms")


if __name__ == "__main__":
    main()
