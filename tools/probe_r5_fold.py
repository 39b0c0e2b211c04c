"""Round-5 low-degree lever: component lane-folding at p=1/2.

The shipping-shape ablation (PROBE_R5_ABLATE) shows p=1's 316 us/it is
~282 us of operator — tiny-K dense MXU passes (K = (p+1)^3 = 8 after
K-stacking 16) over 3 separate component calls — not the dot/recurrence
phase.  Lane-folding the 3 components into one 3x-wide MXU call
(``fold_state``/``n_rep``) was measured ~10% SLOWER at p=4 (round-2
ledger: the in-VMEM re-tiling of metric/mask/P costs more than the wide
matmul saves), but p=1/2 sit in a different regime: the matmuls are too
SMALL, exactly where 3x width could pay.  Interleaved base-vs-fold slope
A/B at p=1 s=17 and p=2 s=15, split2m, auto-resolved factor/metric.

Run: setsid python tools/probe_r5_fold.py < /dev/null > tools/PROBE_R5_FOLD.log 2>&1 &
Artifact: tools/PROBE_R5_FOLD.txt
"""

from __future__ import annotations

import os
import statistics
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_R5_FOLD.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def make_step(p, s, fold):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk
    from mf_data_locality_tpu.benchmark import resolve_factor, resolve_metric

    factor = resolve_factor("auto", p, "pieces", precision="split2m",
                            solver="fused")
    metric = resolve_metric("auto", "fused", "pieces", factor, p,
                            precision="split2m")
    pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                   precision="split2m", windowing="pieces",
                   factor=factor, metric=metric)
    op_c = jax.tree.map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, pb.op)
    lat = pb.layout.n_nodes_axis
    p2 = p * p
    b_lat = pb.b.reshape((3,) + lat)
    prec_lat = pb.inv_diag.reshape((1,) + lat)
    g0 = fk.to_piece_state(-b_lat.astype(jnp.float32), p)[:, :, :p2]
    prec_pieces = fk.to_piece_state(prec_lat.astype(jnp.float32), p)[:, :, :p2]
    n_rep = 3 if fold else 1
    if fold:
        g0 = fk.fold_state(g0)
    zg0 = fk.zplanes_init(g0, p)
    state0 = (jnp.zeros_like(g0), g0,
              jnp.zeros_like(g0), jnp.zeros_like(g0),
              zg0, jnp.zeros_like(zg0), jnp.zeros_like(zg0),
              jnp.zeros((8,), jnp.float32).at[4].set(1.0))

    def step(st):
        x, g, d, h, zg, zd, zh, scal = st
        return fk.fused_cg_iteration(op_c, lat, x, g, d, h, zg, zd, zh,
                                     scal, prec_pieces, compact=True,
                                     n_rep=n_rep)

    return step, state0, factor, metric


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    lat0 = timing.round_trip_latency()
    log(f"# component lane-folding at low degree  "
        f"backend={jax.default_backend()}  bw={bw/1e9:.0f} GB/s  "
        f"latency={lat0*1e3:.1f} ms")

    pts = [(1, 17), (2, 15)]
    ARMS = [("base", False), ("fold", True)]
    arms = {}
    for p, s in pts:
        try:
            built = {}
            for name, f in ARMS:
                step, st, factor, metric = make_step(p, s, f)
                built[name] = (step, st)
            arms[(p, s)] = built
            log(f"# point split2m p={p} s={s}: factor={factor} "
                f"metric={metric}")
        except Exception:
            log(f"# point p={p} s={s}: build FAILED")
            log(traceback.format_exc())

    samples = {}
    for rnd in range(5):
        for key, built in arms.items():
            p, s = key
            row = []
            for name, _ in ARMS:
                step, st = built[name]
                t = timing.time_scan_fetch(step, st, inner=50, repeats=3)
                samples.setdefault(key, {}).setdefault(name, []).append(t)
                row.append(f"{name} {t*1e6:7.1f}")
            log(f"  round {rnd}  p={p} s={s}  " + "  ".join(row) + " us/it")
    log("# per-arm min / median (fold % vs base, same statistic):")
    for (p, s), by in samples.items():
        b, f = by["base"], by["fold"]
        bm, fm = min(b), min(f)
        bd, fd = statistics.median(b), statistics.median(f)
        log(f"  p={p} s={s}: base min {bm*1e6:7.1f} med {bd*1e6:7.1f}   "
            f"fold min {fm*1e6:7.1f} ({(fm/bm-1)*100:+5.1f}%) "
            f"med {fd*1e6:7.1f} ({(fd/bd-1)*100:+5.1f}%)")

    ok, cached, fresh = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'REJECTED (host not idle)'} "
        f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms")


if __name__ == "__main__":
    main()
