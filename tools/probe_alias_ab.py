"""Same-session A/B: fused kernel with and without state-buffer aliasing.

Interleaved repeats so session drift cannot masquerade as a difference;
also traces the aliased variant to count residual copies in the loop body.
Appends to tools/PROBE_FUSED.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)
    with open("/root/repo/tools/PROBE_FUSED.txt", "a") as f:
        f.write(msg + "\n")


def copies_in_trace(log_dir):
    from mf_data_locality_tpu.utils import trace_summary

    if not trace_summary.op_durations(log_dir):
        return None
    return trace_summary.total_matching(log_dir, "copy.")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing, profiling

    log(f"# probe_alias_ab backend={jax.default_backend()}")

    problem = bp4.build(13, 4, dtype=jnp.float32, backend="pallas",
                        precision="split3", windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)

    fns = {}
    for al in (False, True):
        @jax.jit
        def solve50(b_, p_, al=al):
            return cg_fused.fused_merged_cg_solve(
                problem.op, lataxis, b_, p_, max_iter=50,
                rel_tol=0.0, abs_tol=0.0, alias=al)
        solve50(b_lat, prec_lat)  # compile
        fns[al] = solve50

    # interleaved timing: 6 alternating rounds of min-of-2
    for rnd in range(3):
        for al in (False, True):
            t = timing.time_min_fetch(
                lambda: fns[al](b_lat, prec_lat).res_norm, repeats=2) / 50
            log(f"A/B round {rnd} alias={int(al)}: {t*1e6:8.1f} us/it")

    # trace both variants, count copy time
    for al in (False, True):
        d = f"/tmp/bp4_trace_alias{int(al)}"
        with profiling.trace(d):
            float(fns[al](b_lat, prec_lat).res_norm)
        c = copies_in_trace(d)
        if c is not None:
            log(f"copies alias={int(al)}: {c:.1f} us total over 50 its "
                f"({c/50:.1f} us/it)")


if __name__ == "__main__":
    main()
