"""TPU probe: (a) same-session A/B of bf16 metric under split3 matmuls,
(b) profiler trace of the fused solve, with a top-op duration summary.

Appends results to tools/PROBE_FUSED.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)
    with open("/root/repo/tools/PROBE_FUSED.txt", "a") as f:
        f.write(msg + "\n")


def summarize_trace(log_dir):
    """Print top device ops by total duration (utils.trace_summary)."""
    from mf_data_locality_tpu.utils import trace_summary

    top = trace_summary.top_ops(log_dir)
    if not top:
        log(f"# no trace.json.gz under {log_dir}")
        return
    log("# trace top ops (us total over captured window):")
    for nm, d in top:
        log(f"#   {d:12.1f}  {nm[:60]}")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused, cg_merged
    from mf_data_locality_tpu.utils import timing, profiling

    log(f"# probe_profile backend={jax.default_backend()}")

    # iteration parity: split3 with bf16 metric at a convergent size
    pb = bp4.build(7, 2, dtype=jnp.float32, backend="pallas",
                   precision="split3", windowing="pieces",
                   metric_dtype=jnp.bfloat16)
    lat7 = pb.layout.n_nodes_axis
    rb = jax.jit(lambda: cg_fused.fused_merged_cg_solve(
        pb.op, lat7, pb.b.reshape((3,) + lat7),
        pb.inv_diag.reshape((1,) + lat7)))()
    log(f"parity p=2 s=7 split3+bf16metric: itCG={int(rb.n_iterations)} "
        f"(split3/f32metric was 34) res={float(rb.res_norm):.3e}")

    # same-session A/B at the headline point
    variants = [
        ("split3/f32metric", jnp.float32, "split3", None),
        ("split3/bf16metric", jnp.float32, "split3", jnp.bfloat16),
        ("bf16/bf16metric", jnp.bfloat16, "bf16", jnp.bfloat16),
    ]
    solves = {}
    for label, dt, prec_mode, md in variants:
        problem = bp4.build(13, 4, dtype=dt, backend="pallas",
                            precision=prec_mode, windowing="pieces",
                            metric_dtype=md)
        lataxis = problem.layout.n_nodes_axis
        b_lat = problem.b.reshape((3,) + lataxis)
        prec_lat = problem.inv_diag.reshape((1,) + lataxis)

        @jax.jit
        def solve50(b_, p_, problem=problem, lataxis=lataxis):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, p_, max_iter=50,
                rel_tol=0.0, abs_tol=0.0)
        r = solve50(b_lat, prec_lat)
        n_it = int(r.n_iterations)
        t = timing.time_min_fetch(
            lambda: solve50(b_lat, prec_lat).res_norm,
            repeats=4) / max(n_it, 1)
        log(f"fused p=4 s=13 {label}: {t*1e6:8.1f} us/it  "
            f"{problem.n_dofs/t/1e9:.2f} GDoF/s/it")
        solves[label] = (solve50, b_lat, prec_lat)

    # profile the baseline variant
    trace_dir = "/tmp/bp4_trace"
    solve50, b_lat, prec_lat = solves["split3/f32metric"]
    with profiling.trace(trace_dir):
        with profiling.marker("cg_solver"):
            float(solve50(b_lat, prec_lat).res_norm)
    summarize_trace(trace_dir)


if __name__ == "__main__":
    main()
