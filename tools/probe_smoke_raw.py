"""Diagnose the smoke's impossible chain times: print EVERY raw wall
sample for the L- and 2L-chains of the p3 point's two arms, plus a
re-fetch of the same chain result twice in a row (memoization check).

The smoke has now twice produced physically impossible per-iteration
times at record time (6.08 us/it, 11.6 us/it at p=3 s=12 where the
full-size s=13 solve measures ~190 us/it), under BOTH the min-of-slopes
and the floor-of-chains aggregation — so the contamination must be in
the raw per-call wall times themselves, not the aggregation.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mf_data_locality_tpu.utils import timing
from tools.smoke_dispatch import POINTS, make_iteration_step


def main():
    name, p, s, rung, cfg_a, cfg_b = POINTS[0]  # p3 point
    lat = timing.round_trip_latency()
    print(f"# latency {lat*1e3:.1f} ms", flush=True)
    for arm, cfg in (("A", cfg_a), ("B", cfg_b)):
        step, st = make_iteration_step(p, s, rung, cfg)

        def make_chain(length):
            @jax.jit
            def chain(x):
                def body(c, _):
                    return step(c), None
                out, _ = jax.lax.scan(body, x, None, length=length)
                return jax.tree.leaves(out)[0].ravel()[0]
            return chain

        for L in (50, 100):
            chain = make_chain(L)
            v0 = float(chain(st))  # compile+warm
            samples = []
            for i in range(6):
                t0 = time.perf_counter()
                v = float(chain(st))
                samples.append(time.perf_counter() - t0)
            ss = " ".join(f"{x*1e3:8.2f}" for x in samples)
            print(f"  {arm} L={L:3d}  wall_ms [{ss}]  "
                  f"per-it(min-lat)/L={max(min(samples)-lat,0)/L*1e6:7.1f}us "
                  f"v={v:.3e} v0={v0:.3e}", flush=True)


if __name__ == "__main__":
    main()
