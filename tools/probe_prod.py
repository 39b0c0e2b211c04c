"""Clean-host production-config probe: geometry auto x layers_per_step.

1. Convergent-point check for the on-the-fly geometry (p=4 s=7): itCG must
   match the precomputed-metric split2m count (93) within the usual +-1 —
   the in-kernel Jacobian rebuild is f32-class (split3 J-eval), so the
   operator stays in the split2m accuracy class.
2. Per-degree production config (split2m, factor auto, geometry auto)
   at L = 1 vs 2: the first L sweep ran against a pytest-contaminated
   host for p<=2 (single-CPU rule) — this is the decisive clean pass.

Run detached with an idle host:
  setsid python tools/probe_prod.py < /dev/null \
      > tools/PROBE_PROD.log 2>&1 & echo $! > /tmp/probe_prod.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_PROD.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.benchmark import run_one, resolve_metric
    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    log(f"# production probe  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  split2m, factor=auto, geometry=auto")

    # --- 1. onthefly convergent point ---------------------------------
    log("# convergent point p=4 s=7 (f64 ref itCG 91, split2m 93):")
    for metric in ("precomputed", "onthefly"):
        try:
            r = run_one(4, 7, solver="fused", dtype=jnp.float32,
                        backend="pallas", precision="split2m",
                        windowing="pieces", factor="dense", metric=metric,
                        solve_repeats=2, matvec_repeats=1, matvec_inner=10)
            log(f"#   {metric:11s}: itCG={r.n_iterations} "
                f"converged={r.converged}")
        except Exception:
            log(f"#   {metric:11s}: FAILED")
            log(traceback.format_exc())

    # --- 2. per-degree L sweep under the production config ------------
    log("#  p |  s |  L | geometry    | time/it us | GDoF/s/it | "
        "time/mv us | itCG")
    for p, s in ((1, 15), (2, 14), (3, 14), (4, 13), (5, 12), (6, 12)):
        factor = "twostage" if p >= 5 else "dense"
        gm = resolve_metric("auto", "fused", "pieces", factor, p)
        pb = None
        for L in (1, 2):
            try:
                if pb is None:
                    pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                                   precision="split2m", windowing="pieces",
                                   factor=factor, metric=gm)
                r = run_one(p, s, solver="fused", dtype=jnp.float32,
                            backend="pallas", precision="split2m",
                            windowing="pieces", layers_per_step=L,
                            solve_repeats=2, matvec_repeats=2,
                            matvec_inner=50, problem=pb)
                log(f"  {p:2d} | {s:2d} | {L:2d} | {gm:11s} | "
                    f"{r.time_per_it*1e6:10.1f} | "
                    f"{r.dofs_per_s_per_it/1e9:9.2f} | "
                    f"{r.time_per_matvec*1e6:10.1f} | {r.n_iterations}")
            except Exception as exc:
                log(f"  {p:2d} | {s:2d} | {L:2d} | {gm:11s} | FAILED: "
                    f"{type(exc).__name__}: {exc}")
    log("# production probe done")


if __name__ == "__main__":
    main()
