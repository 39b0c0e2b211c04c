"""layers_per_step (L) sweep for the fused solver: is L=1 leaving
grid-step overhead on the table?

Batch-3 found L=2 saves ~18 us/it at p=4 (258 vs 275, split2m); at p=1..2
the iteration (~106-166 us) is far above its streamed-traffic DMA floor
(~28-44 us), and per-grid-step fixed cost is the prime suspect — L-fold
fewer steps amortizes it.  If a clear winner emerges per degree, promote
it to an auto-L dispatch in benchmark.run_one.

Run detached with an idle host:
  setsid python tools/probe_lsweep.py < /dev/null \
      > tools/PROBE_LSWEEP.log 2>&1 & echo $! > /tmp/probe_lsweep.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_LSWEEP.txt"


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
    log(f"# L sweep  backend={jax.default_backend()}  bw={bw/1e9:.0f} GB/s"
        f"  fused solver, split2m, factor=auto")
    log("#  p |  s |  L | time/it us | GDoF/s/it | time/mv us | itCG")
    for p, s in ((1, 15), (2, 14), (3, 14), (4, 13), (5, 12), (6, 12)):
        pb = None
        for L in (1, 2, 4):
            try:
                if pb is None:
                    factor = "twostage" if p >= 5 else "dense"
                    pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                                   precision="split2m", windowing="pieces",
                                   factor=factor)
                r = run_one(p, s, solver="fused", dtype=jnp.float32,
                            backend="pallas", precision="split2m",
                            windowing="pieces", layers_per_step=L,
                            solve_repeats=2, matvec_repeats=2,
                            matvec_inner=50, problem=pb)
                log(f"  {p:2d} | {s:2d} | {L:2d} | "
                    f"{r.time_per_it*1e6:10.1f} | "
                    f"{r.dofs_per_s_per_it/1e9:9.2f} | "
                    f"{r.time_per_matvec*1e6:10.1f} | {r.n_iterations}")
            except Exception as exc:
                log(f"  {p:2d} | {s:2d} | {L:2d} | FAILED: "
                    f"{type(exc).__name__}: {exc}")
                if "divide" not in str(exc):
                    log(traceback.format_exc())
    log("# L sweep done")


if __name__ == "__main__":
    main()
