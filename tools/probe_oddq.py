"""Odd-q on-the-fly geometry A/B with sublane row padding.

PROBE_ONTHEFLY.txt showed the in-kernel Jacobian rebuild losing 2x at
p=3 (q^3 = 125 misaligned) while winning 20-25% at even q.  The build
now pads every q^3 row block to the next multiple of 8 with exact no-op
rows for onthefly operators — this probe measures whether alignment was
indeed the whole story (and whether odd degrees should flip to onthefly
in resolve_metric).

Run detached with an idle host:
  setsid python tools/probe_oddq.py < /dev/null \
      > tools/PROBE_ODDQ.log 2>&1 & echo $! > /tmp/probe_oddq.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_ODDQ.txt"


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
    log(f"# odd-q (padded) + twostage onthefly A/B  "
        f"backend={jax.default_backend()}  bw={bw/1e9:.0f} GB/s  split2m")
    log("#  p |  s | factor   | metric      | time/it us | GDoF/s/it | "
        "time/mv us | itCG")
    cases = [(3, 14, "dense"), (5, 12, "dense"),      # odd-q padding A/B
             (5, 12, "twostage"), (6, 12, "twostage"),  # production p>=5
             (9, 10, "twostage")]
    for p, s, factor in cases:
        for metric in ("precomputed", "onthefly"):
            try:
                pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                               precision="split2m", windowing="pieces",
                               factor=factor, metric=metric)
                r = run_one(p, s, solver="fused", dtype=jnp.float32,
                            backend="pallas", precision="split2m",
                            windowing="pieces", factor=factor,
                            metric=metric,
                            solve_repeats=2, matvec_repeats=2,
                            matvec_inner=50, problem=pb)
                log(f"  {p:2d} | {s:2d} | {factor:8s} | {metric:11s} | "
                    f"{r.time_per_it*1e6:10.1f} | "
                    f"{r.dofs_per_s_per_it/1e9:9.2f} | "
                    f"{r.time_per_matvec*1e6:10.1f} | {r.n_iterations}")
            except Exception:
                log(f"  {p:2d} | {s:2d} | {factor:8s} | {metric:11s} | "
                    "FAILED")
                log(traceback.format_exc())
    log("# odd-q probe done")


if __name__ == "__main__":
    main()
