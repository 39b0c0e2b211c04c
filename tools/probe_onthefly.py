"""A/B probe: metric='precomputed' (streamed 6q^3 words/cell) vs
metric='onthefly' (24 words/cell, in-kernel Jacobian rebuild) on the
production fused path.

The reference's namesake data-locality trade (poisson_operator.h:470-520)
on TPU: prediction from the batch-6 cost model is that onthefly is SLOWER
per iteration (the VPU is the serial bottleneck and the metric DMA is
already overlapped) but 54x lighter on geometry memory — this probe
measures both sides so the tradeoff is documented, not estimated.

Run detached with an idle host:
  setsid python tools/probe_onthefly.py < /dev/null \
      > tools/PROBE_ONTHEFLY.log 2>&1 & echo $! > /tmp/probe_otf.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_ONTHEFLY.txt"


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
    log(f"# onthefly A/B  backend={jax.default_backend()}  bw={bw/1e9:.0f} "
        f"GB/s  fused solver, split2m, factor=dense (onthefly constraint)")
    log("#  p |  s | metric      | geo MB | time/it us | GDoF/s/it | "
        "time/mv us | itCG")
    for p, s in ((2, 14), (3, 14), (4, 13), (6, 12)):
        for metric in ("precomputed", "onthefly"):
            try:
                pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                               precision="split2m", windowing="pieces",
                               factor="dense", metric=metric)
                geo_mb = ((pb.op.gmetric.size * 4 if pb.op.gmetric is not None
                           else pb.op.coeffs.size * 4) / 1e6)
                r = run_one(p, s, solver="fused", dtype=jnp.float32,
                            backend="pallas", precision="split2m",
                            windowing="pieces", factor="dense",
                            solve_repeats=2, matvec_repeats=2,
                            matvec_inner=50, problem=pb)
                log(f"  {p:2d} | {s:2d} | {metric:11s} | {geo_mb:6.1f} | "
                    f"{r.time_per_it*1e6:10.1f} | "
                    f"{r.dofs_per_s_per_it/1e9:9.2f} | "
                    f"{r.time_per_matvec*1e6:10.1f} | {r.n_iterations}")
            except Exception:
                log(f"  {p:2d} | {s:2d} | {metric:11s} | FAILED")
                log(traceback.format_exc())
    log("# probe done")


if __name__ == "__main__":
    main()
