"""Full-dispatch on-the-fly geometry A/B: every degree, both factors' winner.

VERDICT r3 items 2/4/5 evidence run, in one session (same-chip bandwidth):

* part 1 — p=1..11 at the PERP ladder sizes, split2m, factor per the
  auto rule (dense p<=4, twostage p>=5), metric precomputed vs onthefly:
  the table that decides benchmark.resolve_metric's dispatch.
* part 2 — bf16 rung (dtype=bf16, precision=bf16, metric-dtype bf16)
  x onthefly at p=2..6: the combination VERDICT flagged as never measured
  (the metric stream is exactly the term separating bf16 from its 84 us
  ablation floor).
* part 3 — p=1 and p=2 at ladder-max sizes (reference budget
  (p+1)^3 * 2^s * 3 < 6e6, benchmark.h:245,252-257: s<=17 / s<=16) to
  test whether the weak low-degree rows are a size artifact.

Run detached with an idle host:
  setsid python tools/probe_dispatch.py < /dev/null \
      > tools/PROBE_DISPATCH.log 2>&1 & echo $! > /tmp/probe_dispatch.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_DISPATCH.txt"

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

    from mf_data_locality_tpu.benchmark import run_one
    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    log(f"# dispatch A/B  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s")
    log("#  part | p |  s | factor   | rung    | metric      | time/it us | "
        "GDoF/s/it | time/mv us | itCG")

    def run(part, p, s, factor, metric, dtype, precision, mdt):
        try:
            pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                           precision=precision, windowing="pieces",
                           metric_dtype=mdt, factor=factor, metric=metric)
            r = run_one(p, s, solver="fused", dtype=dtype, backend="pallas",
                        precision=precision, windowing="pieces",
                        metric_dtype=mdt, factor=factor, metric=metric,
                        solve_repeats=2, matvec_repeats=2, matvec_inner=50,
                        problem=pb)
            log(f"  {part:4s} | {p:2d} | {s:2d} | {factor:8s} | "
                f"{precision:7s} | {metric:11s} | {r.time_per_it*1e6:10.1f} | "
                f"{r.dofs_per_s_per_it/1e9:9.2f} | "
                f"{r.time_per_matvec*1e6:10.1f} | {r.n_iterations}"
                + ("" if r.converged else " [nc]"))
        except Exception:
            log(f"  {part:4s} | {p:2d} | {s:2d} | {factor:8s} | "
                f"{precision:7s} | {metric:11s} | FAILED")
            log(traceback.format_exc())

    # part 1: the dispatch table
    for p in range(1, 12):
        factor = "dense" if p <= 4 else "twostage"
        for metric in ("precomputed", "onthefly"):
            run("p1", p, LADDER[p], factor, metric, jnp.float32, "split2m",
                None)

    # part 2: bf16 rung x onthefly
    for p in range(2, 7):
        factor = "dense" if p <= 4 else "twostage"
        for metric in ("precomputed", "onthefly"):
            run("p2", p, LADDER[p], factor, metric, jnp.bfloat16, "bf16",
                jnp.bfloat16)

    # part 3: ladder-max low degrees
    for p, sizes in ((1, (16, 17)), (2, (15, 16))):
        for s in sizes:
            for metric in ("precomputed", "onthefly"):
                run("p3", p, s, "dense", metric, jnp.float32, "split2m", None)

    log("# dispatch probe done")


if __name__ == "__main__":
    main()
