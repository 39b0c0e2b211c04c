"""Final traces: where the bf16 (189 us/it) and split2m (270 us/it)
fused iterations spend time — the round-3 starting map.

Appends op summaries to tools/PROBE_FUSED.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)
    with open("/root/repo/tools/PROBE_FUSED.txt", "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing, profiling, trace_summary

    log(f"# probe_final_trace backend={jax.default_backend()}")
    for prec, dt, md, label in (
            ("bf16", jnp.bfloat16, jnp.bfloat16, "bf16"),
            ("split2m", jnp.float32, None, "split2m")):
        problem = bp4.build(13, 4, dtype=dt, backend="pallas",
                            precision=prec, windowing="pieces",
                            metric_dtype=md)
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)

        @jax.jit
        def solve(b_, p_, problem=problem, lataxis=lataxis):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, p_, max_iter=100,
                rel_tol=0.0, abs_tol=0.0)
        t = timing.time_min_fetch(
            lambda: solve(b_lat, prec_lat).res_norm, repeats=3) / 100
        log(f"final-trace {label}: {t*1e6:8.1f} us/it  "
            f"{problem.n_dofs/t/1e9:.2f} G")
        d = f"/tmp/bp4_final_{label}"
        with profiling.trace(d):
            float(solve(b_lat, prec_lat).res_norm)
        top = trace_summary.top_ops(d, 8)
        log(f"# {label} top ops (us over 100 its):")
        for nm, dur in top:
            log(f"#   {dur:12.1f}  {nm[:60]}")


if __name__ == "__main__":
    main()
