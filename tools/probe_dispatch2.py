"""Final same-session A/B for the round-4 geometry/factor dispatch flip.

PROBE_DISPATCH and PROBE_FOLLOWUP were separate chip sessions with ~10%
cross-session drift, which leaves three dispatch cells ambiguous:

* p=2 split2m: dense+onthefly beat dense+precomputed in one session
  (114.9 vs 138.9) but PERP_TABLE's precomputed row (166.4 at bw=975)
  does not reproduce in either; decide on ONE session.  Also recheck
  the p=2 dense+onthefly time/matvec > time/it flag (FOLLOWUP part B).
* p=3 split2m: dense+onthefly is out of its convergence class
  (PROBE_PRODHIST), so the real contest is dense+precomputed vs
  twostage+onthefly — never measured in the same session.
* p=4 split2m: twostage+onthefly won FOLLOWUP part B (199.6 vs dense
  onthefly 220.4); confirm against dense+precomputed in-session.

bf16 rung: twostage+onthefly at p=3/p=4 was never measured (dispatch
part 2 used dense); measure it against dense+onthefly in-session.

Run detached with an idle host:
  setsid python tools/probe_dispatch2.py < /dev/null \
      > tools/PROBE_DISPATCH2.log 2>&1 & echo $! > /tmp/probe_d2.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_DISPATCH2.txt"


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
    log(f"# dispatch final A/B  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s")
    log("# part | p |  s | factor   | rung    | metric      | "
        "time/it us | GDoF/s/it | time/mv us | itCG")

    def run(part, p, s, factor, metric, dtype, precision, mdt):
        try:
            pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                           precision=precision, windowing="pieces",
                           metric_dtype=mdt, factor=factor, metric=metric)
            r = run_one(p, s, solver="fused", dtype=dtype, backend="pallas",
                        precision=precision, windowing="pieces",
                        metric_dtype=mdt, factor=factor, metric=metric,
                        solve_repeats=2, matvec_repeats=3,
                        matvec_inner=50, problem=pb)
            flag = "" if r.time_per_matvec <= r.time_per_it else "  ** mv>it"
            log(f"  {part:1s} | {p:2d} | {s:2d} | {factor:8s} | "
                f"{precision:7s} | {metric:11s} | {r.time_per_it*1e6:10.1f} | "
                f"{r.dofs_per_s_per_it/1e9:9.2f} | "
                f"{r.time_per_matvec*1e6:10.1f} | {r.n_iterations}"
                + ("" if r.converged else " [nc]") + flag)
        except Exception:
            log(f"  {part:1s} | {p:2d} | {s:2d} | {factor:8s} | "
                f"{precision:7s} | {metric:11s} | FAILED")
            log(traceback.format_exc())

    f32, bf16 = jnp.float32, jnp.bfloat16

    # -- part F: split2m final dispatch cells (one session) -----------------
    run("F", 2, 14, "dense", "precomputed", f32, "split2m", None)
    run("F", 2, 14, "dense", "onthefly", f32, "split2m", None)
    run("F", 3, 14, "dense", "precomputed", f32, "split2m", None)
    run("F", 3, 14, "twostage", "onthefly", f32, "split2m", None)
    run("F", 4, 13, "dense", "precomputed", f32, "split2m", None)
    run("F", 4, 13, "dense", "onthefly", f32, "split2m", None)
    run("F", 4, 13, "twostage", "onthefly", f32, "split2m", None)

    # -- part G: bf16 rung, twostage x onthefly at p=3/4 --------------------
    run("G", 3, 14, "dense", "onthefly", bf16, "bf16", bf16)
    run("G", 3, 14, "twostage", "onthefly", bf16, "bf16", bf16)
    run("G", 4, 13, "dense", "onthefly", bf16, "bf16", bf16)
    run("G", 4, 13, "twostage", "onthefly", bf16, "bf16", bf16)

    log("# dispatch2 probe done")


if __name__ == "__main__":
    main()
