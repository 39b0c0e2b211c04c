"""Interleaved layers_per_step A/B at the weak low-degree rows (round 4).

The per-degree table's weakest rows are p=1 (frac 0.046) and p=2 (0.138);
the layer ablations hinted multi-layer grid steps help exactly there
(PROBE_PROD: p=2 L2 127.6 vs L1 168.1 same session; PROBE_FOLLOWUP E:
p=1 L8 84.2 vs L1 96.1) but with large cross-session variance (the round-3
L-sweep had contradictory rows).  This probe interleaves the arms at the
ladder-max sizes so drift cancels, using the shipping config per degree
(p=1: dense+precomputed; p=2: dense+onthefly; both split2m).

Run detached: setsid python tools/probe_lowdeg_layers.py < /dev/null \
    > tools/PROBE_LOWDEG.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_LOWDEG.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.benchmark import run_one
    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    log(f"# low-degree layers_per_step interleaved A/B  "
        f"backend={jax.default_backend()}  bw={bw/1e9:.0f} GB/s  split2m")

    cases = [  # (p, s, metric, L arms)
        (2, 15, "onthefly", (1, 2, 4)),
        (1, 17, "precomputed", (1, 2, 8)),
    ]
    for p, s, metric, arms in cases:
        pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                       precision="split2m", windowing="pieces",
                       factor="dense", metric=metric)
        best = {L: float("inf") for L in arms}
        for rnd in range(2):
            for L in arms:
                try:
                    r = run_one(p, s, solver="fused", dtype=jnp.float32,
                                backend="pallas", precision="split2m",
                                windowing="pieces", factor="dense",
                                metric=metric, layers_per_step=L,
                                solve_repeats=2, matvec_repeats=1,
                                matvec_inner=50, problem=pb)
                    best[L] = min(best[L], r.time_per_it)
                    log(f"  p={p} s={s} {metric} r{rnd} L{L}: "
                        f"{r.time_per_it*1e6:8.1f} us/it | "
                        f"mv {r.time_per_matvec*1e6:8.1f} | "
                        f"itCG {r.n_iterations}"
                        + ("" if r.converged else " [nc]"))
                except Exception:
                    log(f"  p={p} s={s} {metric} r{rnd} L{L}: FAILED")
                    log(traceback.format_exc())
        ok = {L: t for L, t in best.items() if t < float("inf")}
        if ok:
            win = min(ok, key=ok.get)
            log(f"# p={p} verdict: L{win} "
                + " ".join(f"L{L}={t*1e6:.1f}" for L, t in ok.items()))
    log("# lowdeg probe done")


if __name__ == "__main__":
    main()
