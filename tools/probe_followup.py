"""Round-4 follow-up evidence batch (single idle-chip session).

Closes the questions PROBE_DISPATCH / PROBE_PRODHIST left open before the
dispatch flip and the headline re-capture:

* part A — convergence class at the remaining dispatch-decision points:
  p=2 (s=11, f64 ref 87 its) precomputed vs onthefly; and whether the
  TWOSTAGE on-the-fly rebuild restores the convergence class at p=3/p=4
  (the dense rebuild is out of class at p=3: PROBE_PRODHIST).
* part B — dense vs twostage under onthefly at p=2..4, split2m, same
  session: PROBE_DISPATCH only crossed the factors at the precomputed
  metric; the onthefly combination may move the p<=4 crossover
  (headline p=4 candidate).
* part C — clean re-time of the two remaining time/matvec > time/it
  anomalies (p=9 twostage precomputed, p=6 twostage onthefly): the
  PROBE_PRODHIST rows ran overlapped with the dispatch probe.
* part D — bf16 rung x onthefly at p=7..11 (PROBE_DISPATCH part 2 only
  covered p=2..6): completes the bf16 dispatch table.
* part E — p=1 layers-per-step ablation (L=1,2,4,8 at s=15): names the
  low-degree per-cell floor (grid-step count vs per-layer work).

Run detached with an idle host:
  setsid python tools/probe_followup.py < /dev/null \
      > tools/PROBE_FOLLOWUP.log 2>&1 & echo $! > /tmp/probe_followup.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_FOLLOWUP.txt"

LADDER = {1: 15, 2: 14, 3: 14, 4: 13, 5: 12, 6: 12, 7: 11, 8: 11,
          9: 10, 10: 10, 11: 10}


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
    log(f"# round-4 follow-up  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s")

    ref = np.load("/root/repo/tools/CONV_REF.npz")

    # -- part A: convergence class at the open dispatch points -------------
    log("# part A: convergence (split2m, fused pieces)")
    for p, s, factor, metric in ((2, 11, "dense", "precomputed"),
                                 (2, 11, "dense", "onthefly"),
                                 (3, 9, "twostage", "onthefly"),
                                 (4, 7, "twostage", "onthefly")):
        it_ref = int(ref[f"p{p}_it"])
        h_ref = np.asarray(ref[f"p{p}_hist"])
        try:
            pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                           precision="split2m", windowing="pieces",
                           factor=factor, metric=metric)
            lat = pb.layout.n_nodes_axis
            r = jax.jit(
                lambda pb=pb, lat=lat: cg_fused.fused_merged_cg_solve(
                    pb.op, lat, pb.b.reshape((3,) + lat),
                    pb.inv_diag.reshape((1,) + lat)))()
            it = int(r.n_iterations)
            hist = np.asarray(r.res_history)[: it + 1]
            n = min(hist.size, h_ref.size)
            dev = np.abs(hist[:n] - h_ref[:n]) / np.maximum(h_ref[:n], 1e-300)
            log(f"  A p={p} s={s} {factor}+{metric}: itCG={it} (f64 ref "
                f"{it_ref}) conv={bool(r.converged)}  hist dev half/full = "
                f"{dev[: n // 2].max():.1e} / {dev.max():.1e}")
        except Exception:
            log(f"  A p={p} s={s} {factor}+{metric}: FAILED")
            log(traceback.format_exc())

    def run(part, p, s, factor, metric, dtype, precision, mdt, L=1):
        try:
            pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                           precision=precision, windowing="pieces",
                           metric_dtype=mdt, factor=factor, metric=metric)
            r = run_one(p, s, solver="fused", dtype=dtype, backend="pallas",
                        precision=precision, windowing="pieces",
                        metric_dtype=mdt, factor=factor, metric=metric,
                        layers_per_step=L, solve_repeats=2, matvec_repeats=2,
                        matvec_inner=50, problem=pb)
            flag = "" if r.time_per_matvec <= r.time_per_it else "  ** mv>it"
            log(f"  {part:1s} | {p:2d} | {s:2d} | L{L} | {factor:8s} | "
                f"{precision:7s} | {metric:11s} | {r.time_per_it*1e6:10.1f} | "
                f"{r.dofs_per_s_per_it/1e9:9.2f} | "
                f"{r.time_per_matvec*1e6:10.1f} | {r.n_iterations}"
                + ("" if r.converged else " [nc]") + flag)
        except Exception:
            log(f"  {part:1s} | {p:2d} | {s:2d} | L{L} | {factor:8s} | "
                f"{precision:7s} | {metric:11s} | FAILED")
            log(traceback.format_exc())

    log("# part | p |  s | L | factor   | rung    | metric      | "
        "time/it us | GDoF/s/it | time/mv us | itCG")

    # -- part B: factor crossover under onthefly, split2m ------------------
    for p in (2, 3, 4):
        for factor in ("dense", "twostage"):
            run("B", p, LADDER[p], factor, "onthefly", jnp.float32,
                "split2m", None)

    # -- part C: clean anomaly re-time --------------------------------------
    run("C", 9, 10, "twostage", "precomputed", jnp.float32, "split2m", None)
    run("C", 6, 12, "twostage", "onthefly", jnp.float32, "split2m", None)

    # -- part D: bf16 x onthefly at the twostage degrees --------------------
    for p in (7, 8, 9, 10, 11):
        for metric in ("precomputed", "onthefly"):
            run("D", p, LADDER[p], "twostage", metric, jnp.bfloat16, "bf16",
                jnp.bfloat16)

    # -- part E: p=1 layers-per-step ablation --------------------------------
    for L in (1, 2, 4, 8):
        run("E", 1, 15, "dense", "precomputed", jnp.float32, "split2m",
            None, L=L)
    run("E", 1, 15, "dense", "onthefly", jnp.float32, "split2m", None, L=4)

    log("# follow-up probe done")


if __name__ == "__main__":
    main()
