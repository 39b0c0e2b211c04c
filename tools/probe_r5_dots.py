"""Round-5 part D: lazy in-kernel dot reduction + recurrence (VERDICT item 2).

The fused kernel's 7-dot cross-lane reduction ((8, B) -> (8,) log-tree)
and the scalar recurrence ran on EVERY grid step, with only the final
step's constant-index output write surviving.  At low degree the z-step
count is large exactly where the per-step work is small (p=1 s=17:
~64 steps of 8 DoF/cell work), which is where the round-4 tables show the
unexplained 160 us iteration-minus-matvec gap (VERDICT r4 weak 2).  The
kernel now runs that phase under ``pl.when(last executed step)`` — an
exact transformation (the discarded writes were dead) — with the old
behavior (eager, now the shipping default after this A/B measured the
lazy form slower) vs the ``lazydots``/``zerodots`` ablation arms.

Interleaved A/B (eager vs lazy), two-chain slope, shipping configs:
  p=1 s=17, p=2 s=15, p=4 s=13 on split2m; p=4 s=13 on bf16.

Run: setsid python tools/probe_r5_dots.py < /dev/null > tools/PROBE_R5_DOTS.log 2>&1 &
Artifact: tools/PROBE_R5_DOTS.txt
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_R5_DOTS.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def make_step(p, s, precision, ablate):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk
    from mf_data_locality_tpu.benchmark import resolve_factor, resolve_metric

    factor = resolve_factor("auto", p, "pieces", precision=precision,
                            solver="fused")
    metric = resolve_metric("auto", "fused", "pieces", factor, p,
                            precision=precision)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    pb = bp4.build(s, p, dtype=dtype, backend="pallas", precision=precision,
                   windowing="pieces",
                   metric_dtype=(jnp.bfloat16 if precision == "bf16"
                                 else None),
                   factor=factor, metric=metric)
    op_c = jax.tree.map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, pb.op)
    lat = pb.layout.n_nodes_axis
    acc = jnp.float32
    p2 = p * p
    b_lat = pb.b.reshape((pb.n_components,) + lat)
    prec_lat = pb.inv_diag.reshape((1,) + lat)
    g0 = fk.to_piece_state(-b_lat.astype(acc), p)[:, :, :p2]
    prec_pieces = fk.to_piece_state(prec_lat.astype(acc), p)[:, :, :p2]
    zg0 = fk.zplanes_init(g0, p)
    store = dtype
    state0 = (jnp.zeros_like(g0), g0,
              jnp.zeros(g0.shape, store), jnp.zeros(g0.shape, store),
              zg0, jnp.zeros(zg0.shape, store), jnp.zeros(zg0.shape, store),
              jnp.zeros((8,), acc).at[4].set(1.0))

    def step(st):
        x, g, d, h, zg, zd, zh, scal = st
        return fk.fused_cg_iteration(op_c, lat, x, g, d, h, zg, zd, zh,
                                     scal, prec_pieces, compact=True,
                                     _ablate=ablate)

    return step, state0, factor, metric


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--inner", type=int, default=50)
    # repeats=1 made the slope a difference of two SINGLE tunnel fetches:
    # one multi-ms jitter spike shifts the slope by spike/inner ~ 100 us,
    # which is exactly the 2-4x round-to-round scatter the first two runs
    # of this probe showed.  min-over-3 per chain kills the spikes and is
    # nearly free once compiles are cached.
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    lat0 = timing.round_trip_latency()
    log(f"# lazy-dots A/B  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency={lat0*1e3:.1f} ms  "
        f"rounds={args.rounds} inner={args.inner}")

    pts = [("split2m", 1, 17), ("split2m", 2, 15), ("split2m", 4, 13),
           ("bf16", 4, 13), ("split2m", 9, 10)]
    ARMS = [("eager", ()), ("lazy", ("lazydots",)),
            ("zero", ("zerodots",))]
    arms = {}
    for prec, p, s in pts:
        try:
            built = [make_step(p, s, prec, ab) for _, ab in ARMS]
            arms[(prec, p, s)] = [(bu[0], bu[1]) for bu in built]
            log(f"# point {prec} p={p} s={s}: factor={built[0][2]} "
                f"metric={built[0][3]}")
        except Exception:
            log(f"# point {prec} p={p} s={s}: build FAILED")
            log(traceback.format_exc())
    best = {}
    for rnd in range(args.rounds):
        for key, built in arms.items():
            prec, p, s = key
            ts = [timing.time_scan_fetch(st, x0, inner=args.inner,
                                         repeats=args.repeats)
                  for st, x0 in built]
            cur = best.get(key, [float("inf")] * len(ARMS))
            best[key] = [min(c, t) for c, t in zip(cur, ts)]
            log(f"  round {rnd}  {prec:8s} p={p} s={s}  "
                + "  ".join(f"{name} {t*1e6:7.1f}"
                            for (name, _), t in zip(ARMS, ts)) + " us/it")
    log("# slope minima (eager / lazy / zero), % vs eager:")
    for (prec, p, s), bs in best.items():
        log(f"  {prec:8s} p={p} s={s}: "
            + "  ".join(f"{name} {b*1e6:7.1f} ({(b/bs[0]-1)*100:+.1f}%)"
                        for (name, _), b in zip(ARMS, bs)))

    ok, cached, fresh = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'REJECTED (host not idle)'} "
        f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms")


if __name__ == "__main__":
    main()
