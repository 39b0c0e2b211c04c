"""Decisive interleaved A/B: p=4 factor under onthefly geometry (round 4).

Two prior same-session A/Bs disagree on the p=4 split2m+onthefly factor
(PROBE_FOLLOWUP part B: twostage 199.6 vs dense 220.4; PROBE_DISPATCH2
part F: dense 243.0 vs twostage 259.5).  This probe interleaves the two
arms three times each (A B A B A B) so slow session drift cancels, and
reports per-round and min times.  Also checks the bf16-rung p=3
convergence question: dense+onthefly vs twostage+onthefly vs
dense+precomputed at the convergent point p=3 s=9 (f64 ref 95 its) — the
dispatch currently keeps p=3 bf16 on the precomputed stream because the
DENSE padded-odd-q rebuild broke the iteration class on the split2m rung
(PROBE_PRODHIST) and the twostage rebuild was never convergence-tested
on bf16.

Run detached: setsid python tools/probe_p4factor.py < /dev/null \
    > tools/PROBE_P4FACTOR.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_P4FACTOR.txt"


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

    from mf_data_locality_tpu.benchmark import run_one
    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    log(f"# p=4 factor interleaved A/B + bf16 p=3 convergence  "
        f"backend={jax.default_backend()}  bw={bw/1e9:.0f} GB/s")

    # part A: interleaved timing, p=4 s=13 split2m onthefly
    pbs = {}
    for factor in ("dense", "twostage"):
        pbs[factor] = bp4.build(13, 4, dtype=jnp.float32, backend="pallas",
                                precision="split2m", windowing="pieces",
                                factor=factor, metric="onthefly")
    best = {"dense": float("inf"), "twostage": float("inf")}
    for rnd in range(3):
        for factor in ("dense", "twostage"):
            try:
                r = run_one(4, 13, solver="fused", dtype=jnp.float32,
                            backend="pallas", precision="split2m",
                            windowing="pieces", factor=factor,
                            metric="onthefly", solve_repeats=2,
                            matvec_repeats=1, matvec_inner=50,
                            problem=pbs[factor])
                best[factor] = min(best[factor], r.time_per_it)
                log(f"  A r{rnd} | {factor:8s} | {r.time_per_it*1e6:8.1f} "
                    f"us/it | mv {r.time_per_matvec*1e6:8.1f}")
            except Exception:
                log(f"  A r{rnd} | {factor:8s} | FAILED")
                log(traceback.format_exc())
    if all(np.isfinite(list(best.values()))):
        win = min(best, key=best.get)
        log(f"# A verdict: {win} wins (dense {best['dense']*1e6:.1f} vs "
            f"twostage {best['twostage']*1e6:.1f} us/it, min of 3 rounds)")

    # part B: bf16-rung p=3 s=9 convergence at the convergent point
    ref = np.load("/root/repo/tools/CONV_REF.npz")
    it_ref = int(ref["p3_it"]) if "p3_s" in ref.files and \
        int(ref["p3_s"]) == 9 else None
    for factor, metric in (("dense", "onthefly"), ("twostage", "onthefly"),
                           ("dense", "precomputed")):
        try:
            pb = bp4.build(9, 3, dtype=jnp.bfloat16, backend="pallas",
                           precision="bf16", windowing="pieces",
                           metric_dtype=jnp.bfloat16, factor=factor,
                           metric=metric)
            lat = pb.layout.n_nodes_axis
            r = jax.jit(
                lambda pb=pb, lat=lat: cg_fused.fused_merged_cg_solve(
                    pb.op, lat, pb.b.reshape((3,) + lat),
                    pb.inv_diag.reshape((1,) + lat)))()
            log(f"  B p=3 s=9 bf16 {factor}+{metric}: "
                f"itCG={int(r.n_iterations)} (f64 ref {it_ref}) "
                f"conv={bool(r.converged)}")
        except Exception:
            log(f"  B p=3 s=9 bf16 {factor}+{metric}: FAILED")
            log(traceback.format_exc())
    log("# p4factor probe done")


if __name__ == "__main__":
    main()
