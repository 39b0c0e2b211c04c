"""Round-5 part A: settle the p=3 regression with an interleaved A/B.

VERDICT r4 weak 3 / next-round item 4: round 3 measured p=3 s=14 split2m
dense+precomputed at 164 us/it (8.43 G); round-4 tables show 193-207 us/it
for the SAME config, attributed to session variance but never settled with
the interleaved protocol the repo's own methodology demands.  The p=3
dispatch carve-out (dense+odd-q keeps the precomputed stream) also rests on
"dense+precomputed is FASTER than twostage+onthefly there" — re-decided
here in the same session.

Arms, interleaved A B C A B C x3 (min per arm), p=3 s=14 split2m:
  A: dense + precomputed   (shipping config, the regression question)
  B: twostage + onthefly   (the carve-out alternative)
  C: dense + onthefly      (the convergence-rejected config — timed for
                            completeness; its row is speed-only, it is out
                            of iteration class at p=3, PROBE_PRODHIST)

Protocol: iteration cost via the two-chain slope over chained fused
iterations (latency/fixed-cost cancelling), plus one 4x-min timed solve
per arm at the end for the time/it column.  Idle host required for the
solve section only.

Run: setsid python tools/probe_r5_p3ab.py < /dev/null > tools/PROBE_R5_P3AB.log 2>&1 &
Artifact: tools/PROBE_R5_P3AB.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_R5_P3AB.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mf_data_locality_tpu.utils import timing
    from mf_data_locality_tpu.benchmark import run_one
    from mf_data_locality_tpu.models import bp4
    from tools.smoke_dispatch import make_iteration_step

    bw = timing.measure_hbm_bandwidth()
    lat0 = timing.round_trip_latency()
    log(f"# p=3 interleaved A/B  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency={lat0*1e3:.1f} ms")

    p, s = 3, 14
    arms = [
        ("A dense+precomputed", dict(factor="dense", metric="precomputed")),
        ("B twostage+onthefly", dict(factor="twostage", metric="onthefly")),
        ("C dense+onthefly   ", dict(factor="dense", metric="onthefly")),
    ]
    steps = [(name, *make_iteration_step(p, s, "split2m", cfg))
             for name, cfg in arms]
    best = {name: float("inf") for name, _, _ in steps}
    for rnd in range(3):
        for name, step, st in steps:
            t = timing.time_scan_fetch(step, st, inner=25, repeats=1)
            best[name] = min(best[name], t)
            log(f"  round {rnd}  {name}  slope {t*1e6:8.1f} us/it")
    log("# slope minima:")
    for name, _, _ in steps:
        log(f"  {name}: {best[name]*1e6:8.1f} us/it")

    # timed solves (reference protocol column), interleaved x2
    import jax.numpy as jnp

    sol = {name: float("inf") for name, _ in arms}
    itc = {}
    pbs = {name: bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                           precision="split2m", windowing="pieces",
                           factor=cfg["factor"], metric=cfg["metric"])
           for name, cfg in arms}
    for rnd in range(2):
        for name, cfg in arms:
            r = run_one(p, s, solver="fused", backend="pallas",
                        precision="split2m", windowing="pieces",
                        factor=cfg["factor"], metric=cfg["metric"],
                        solve_repeats=2, matvec_repeats=1, matvec_inner=25,
                        problem=pbs[name])
            sol[name] = min(sol[name], r.time_per_it)
            itc[name] = (r.n_iterations, r.converged, r.n_dofs)
            log(f"  round {rnd}  {name}  time/it {r.time_per_it*1e6:8.1f} us"
                f"  itCG {r.n_iterations}{'' if r.converged else ' [nc]'}"
                f"  mv {r.time_per_matvec*1e6:8.1f}")
    log("# solve minima:")
    for name, _ in arms:
        n_it, conv, nd = itc[name]
        g = nd / sol[name] / 1e9
        log(f"  {name}: {sol[name]*1e6:8.1f} us/it = {g:6.2f} GDoF/s/it"
            f"  itCG {n_it}{'' if conv else ' [not converged]'}")

    ok, cached, fresh = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'REJECTED (host not idle)'} "
        f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms")


if __name__ == "__main__":
    main()
