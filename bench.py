"""Headline benchmark: BP4 merged-CG throughput on the local TPU chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Metric: DoFs/s per CG iteration of the fully-merged solver (the CEED
throughput metric, ``benchmark.h:222``) at p=4 on the largest ladder-typical
single-chip size.  ``vs_baseline``: fraction of the per-chip HBM-bandwidth
roofline, computed from the measured triad bandwidth and the merged solver's
ideal traffic of ~9 f32 words per DoF per iteration (BASELINE.md — the
reference publishes no numbers; its north star is >=80% of roofline).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import jax

    if jax.default_backend() not in ("cpu",):
        # persistent compile cache (TPU-only; see benchmark.main)
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from mf_data_locality_tpu.benchmark import run_one
    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()

    degree, s = 4, 13  # 8192 cells, ~1.6M DoFs
    # headline config: whole-iteration fused Pallas kernel (piece-resident
    # state, solvers/cg_fused.py) + split2m matmuls — bf16-rounded
    # matrices (one fixed ~2e-3 SPD operator perturbation), hi/lo-split
    # stream, 2 MXU passes.  Promoted to the default f32-class rung in
    # round 3: iteration counts at the p=3..6 convergent points are within
    # +1..+2 of the f64 reference and never worse than split3
    # (PARITY.md "On-chip convergence evidence"; tools/R3_BATCH1.txt).
    # metric='auto' resolves to the in-kernel on-the-fly Jacobian rebuild
    # (even-q dense degrees + all twostage degrees on this rung): measured
    # -12..-20% time/it at p=4 vs the streamed precomputed metric at 54x
    # less geometry memory (tools/PROBE_ONTHEFLY.txt, PROBE_DISPATCH.txt)
    # — the reference's own data-locality trade, poisson_operator.h:470-520.
    r = run_one(degree, s, solver="fused", dtype=jnp.float32,
                backend="pallas", precision="split2m", windowing="pieces",
                metric="auto",
                solve_repeats=2, matvec_repeats=2, matvec_inner=20)

    # self-guard (VERDICT r4 weak 4): if the latency correction drifted
    # during the headline run the solve time is contaminated (deflated) —
    # re-measure once with the fresh latency instead of reporting it
    ok, cached, fresh = timing.latency_recheck()
    if not ok:
        print(f"# WARNING: round-trip latency drifted {cached*1e3:.1f} -> "
              f"{fresh*1e3:.1f} ms during the headline run; re-measuring",
              file=sys.stderr)
        r = run_one(degree, s, solver="fused", dtype=jnp.float32,
                    backend="pallas", precision="split2m",
                    windowing="pieces", metric="auto",
                    solve_repeats=2, matvec_repeats=2, matvec_inner=20)

    ideal_bytes_per_dof_per_it = 9 * 4  # x,g,d,h sweeps + diag + geometry (f32)
    roofline = bw / ideal_bytes_per_dof_per_it
    print(json.dumps({
        "metric": f"bp4_merged_cg_dofs_per_s_per_it_p{degree}",
        "value": r.dofs_per_s_per_it,
        "unit": "DoF/s/iter",
        "vs_baseline": r.dofs_per_s_per_it / roofline,
    }))
    print(f"# n_dofs={r.n_dofs} itCG={r.n_iterations} "
          f"time/it={r.time_per_it:.3e}s time/matvec={r.time_per_matvec:.3e}s "
          f"measured_bw={bw/1e9:.0f}GB/s roofline={roofline/1e9:.2f}GDoF/s/it "
          f"latency={timing.round_trip_latency()*1e3:.1f}ms "
          f"converged={r.converged}", file=sys.stderr)
    # the round 1-4 one-chain protocol number, for cross-round comparison
    # (includes the tunneled backend's per-solve dispatch fixed cost; the
    # headline uses the two-solve slope — see benchmark.run_one)
    print(f"# old-protocol (one-chain wall): time/it="
          f"{r.time_per_it_wall:.3e}s dofs/s/it="
          f"{r.n_dofs / max(r.time_per_it_wall, 1e-12):.3e}",
          file=sys.stderr)
    # Second denominator: the kernel's OWN streamed traffic.  The 9-word
    # model above is the REFERENCE's — it holds there because the reference
    # rebuilds the Jacobian per q-point from compressed per-cell
    # coefficients (poisson_operator.h:470-520), making geometry ~0.3
    # words/DoF.  With metric='auto' the p=4 headline uses the same trade
    # in-kernel (24 geometry words/cell; q=6 is sublane-even — see
    # benchmark.resolve_metric for the full dispatch).  Per-cell
    # streamed bytes: x,g r+w f32 + d,h r+w + Z-planes + P + geometry.
    nc, q = 2 ** s, degree + 2
    geom_bytes = 96  # 24 f32 trilinear coefficients per cell
    stream_bytes = nc * (3 * degree ** 3 * 32 + 3 * degree ** 2 * 24
                         + 4 * degree ** 3 + geom_bytes)
    frac_str = (stream_bytes / bw) / r.time_per_it
    print(f"# frac_of_streamed_traffic_roofline={frac_str:.3f} "
          f"(streamed {stream_bytes/1e6:.0f} MB/it; vs_baseline keeps the "
          "reference's 9-word ideal as the cross-round denominator)",
          file=sys.stderr)

    # split3 variant: explicit bf16 hi/lo 3-product decomposition —
    # bitwise f32-class matmuls, 3 MXU passes (the previous headline)
    r2 = run_one(degree, s, solver="fused", dtype=jnp.float32,
                 backend="pallas", precision="split3", windowing="pieces",
                 solve_repeats=2, matvec_repeats=2, matvec_inner=20)
    print(f"# split3 variant: dofs/s/it={r2.dofs_per_s_per_it:.3e} "
          f"({r2.dofs_per_s_per_it / roofline:.3f} of roofline) "
          f"time/it={r2.time_per_it:.3e}s itCG={r2.n_iterations}",
          file=sys.stderr)

    # reduced-precision variant (vector_access_reduced capability slot:
    # bf16 operator-stream storage + single-pass bf16 matmuls + bf16 metric)
    rb = run_one(degree, s, solver="fused", dtype=jnp.bfloat16,
                 backend="pallas", precision="bf16", windowing="pieces",
                 metric_dtype=jnp.bfloat16,
                 solve_repeats=2, matvec_repeats=2, matvec_inner=20)
    print(f"# bf16 variant: dofs/s/it={rb.dofs_per_s_per_it:.3e} "
          f"({rb.dofs_per_s_per_it / roofline:.3f} of roofline) "
          f"time/it={rb.time_per_it:.3e}s "
          f"time/matvec={rb.time_per_matvec:.3e}s", file=sys.stderr)


if __name__ == "__main__":
    main()
