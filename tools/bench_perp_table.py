"""Per-degree roofline table for the production fused solver (p=1..8).

VERDICT round-2 item 5: one session's bandwidth measurement, then for each
degree the ladder's largest single-chip size with the production config,
reporting solve and matvec throughput AND their roofline fractions:

  - frac_solve: against the merged-CG ideal of 9 f32 words/DoF/iter
    (x, g, d, h read+write + P + geometry; BASELINE.md traffic model).
    NOTE this 9-word model is the REFERENCE's: it holds there because the
    reference rebuilds the Jacobian per q-point from 27 compressed
    per-cell coefficients (poisson_operator.h:470-520), so geometry costs
    ~0.3 words/DoF.  Our production kernel STREAMS the precomputed
    6 q^3-word metric instead (measured faster on TPU, where the VPU —
    not HBM — is the binding resource), so its own traffic is higher.
  - frac_str: against the kernel's OWN streamed traffic (state sweeps at
    their actual dtypes + Z-plane duplicates + P + the metric stream) —
    "how close is the iteration to the DMA floor of what it actually
    moves".  The gap between frac_str and 1.0 is serial in-kernel compute
    (MXU passes + VPU metric/sweep phases, R3_BATCH6/7 ablations).
  - matvec fraction: against read-src + write-dst (8 B/DoF f32-class) plus
    the operator's actual metric-stream bytes per DoF (precision-dependent).

Run detached: setsid python tools/bench_perp_table.py [--precision split2m]
                [--metric-dtype bf16] [--x-skip] [--prec-dtype bf16] \
                < /dev/null > tools/PERP_TABLE.log 2>&1 &
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PERP_TABLE.txt"

# largest ladder size per degree under the reference's single-rank budget
# (p+1)^3 * 2^s * 3 < 6e6  (benchmark.h:245,252-257)
LADDER = {1: 17, 2: 15, 3: 14, 4: 13, 5: 12, 6: 12, 7: 11, 8: 11,
          9: 10, 10: 10, 11: 10}


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    global OUT
    ap = argparse.ArgumentParser()
    # production config (round-3 measured): plain split2m + factor auto;
    # metric-bf16 / x-skip / bf16-P all measured neutral (R3_BATCH2.txt)
    ap.add_argument("--precision", default="split2m")
    ap.add_argument("--metric-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--x-skip", action="store_true", default=False)
    ap.add_argument("--prec-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="vector-stream storage dtype (bf16 = reduced rung)")
    ap.add_argument("--geometry", default="auto",
                    choices=["auto", "qpoint", "onthefly"],
                    help="auto = onthefly where measured faster and "
                         "convergence-safe (see benchmark.resolve_metric)")
    ap.add_argument("--degrees", default="1,2,3,4,5,6,7,8,9,10,11")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    OUT = args.out

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.benchmark import run_one
    from mf_data_locality_tpu.utils import timing
    from mf_data_locality_tpu.models import bp4

    bw = timing.measure_hbm_bandwidth()
    lat0 = timing.round_trip_latency()
    mdt = jnp.bfloat16 if args.metric_dtype == "bf16" else None
    pdt = jnp.bfloat16 if args.prec_dtype == "bf16" else None
    vdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    # stamp: the latency correction and bandwidth this table is computed
    # with (VERDICT r4 weak 4c) — a reader can reject stale comparisons
    log(f"# per-degree roofline table  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency={lat0*1e3:.1f} ms  "
        f"config: dtype={args.dtype} "
        f"precision={args.precision} "
        f"metric={args.metric_dtype} x_skip={args.x_skip} "
        f"prec_dtype={args.prec_dtype} factor=auto")
    log(f"#  p |  s |   n_dofs | time/it us | GDoF/s/it | frac_solve | "
        f"frac_str | time/mv us | mv GDoF/s | frac_mv | itCG")

    solve_roofline = bw / 36.0  # 9 f32 words/DoF/iter

    def stream_bytes_per_it(pb, p):
        """Actual HBM bytes the fused iteration streams (state arrays at
        their dtypes, in-place aliased read+write; Z-plane duplicates; the
        P read; the metric stream) — the frac_str denominator."""
        op = pb.op
        nc = op.n_cells
        wd = pb.b.dtype.itemsize          # d, h, zd, zh storage
        wp = 2 if args.prec_dtype == "bf16" else pb.inv_diag.dtype.itemsize
        n_el = 3 * p ** 3 * nc            # one compact state array
        nz_el = 3 * p ** 2 * nc           # one Z-plane array
        by = 2 * 4 * n_el                 # x r+w (f32 accumulation dtype)
        if args.x_skip:
            by /= 2                       # x untouched every 2nd iteration
        by += 2 * 4 * n_el                # g r+w (f32)
        by += 2 * 2 * wd * n_el           # d, h r+w
        by += 2 * 4 * nz_el               # zg r+w (f32)
        by += 2 * 2 * wd * nz_el          # zd, zh r+w
        by += wp * p ** 3 * nc            # P read (one scalar per node)
        if op.gmetric is not None:
            by += op.gmetric.size * op.gmetric.dtype.itemsize
        else:
            by += op.coeffs.size * op.coeffs.dtype.itemsize  # onthefly
        return by
    for p in [int(x) for x in args.degrees.split(",")]:
        s = LADDER[p]
        try:
            from mf_data_locality_tpu.benchmark import (resolve_cofactor,
                                                        resolve_factor,
                                                        resolve_metric)

            eff_prec = "bf16" if args.dtype == "bf16" else args.precision
            gm = {"auto": "auto", "qpoint": "precomputed",
                  "onthefly": "onthefly"}[args.geometry]
            factor = resolve_factor("auto", p, "pieces",
                                    precision=eff_prec, solver="fused",
                                    metric=gm)
            gm = resolve_metric(gm, "fused", "pieces", factor, p,
                                precision=eff_prec)
            cof = resolve_cofactor("auto", p, factor, gm,
                                   precision=eff_prec)
            pb = bp4.build(s, p, dtype=vdt, backend="pallas",
                           precision=args.precision, windowing="pieces",
                           metric_dtype=mdt, factor=factor, metric=gm,
                           cofactor=cof)
            r = run_one(p, s, solver="fused", dtype=vdt,
                        backend="pallas", precision=args.precision,
                        windowing="pieces", metric_dtype=mdt,
                        factor=factor, metric=gm,
                        x_skip=args.x_skip, prec_dtype=pdt,
                        solve_repeats=2, matvec_repeats=2, matvec_inner=50,
                        problem=pb)
            # matvec model: src read + dst write (+1/p z-plane re-touch) at
            # the stream dtype + the metric stream's actual bytes
            met_bytes = (pb.op.gmetric.size * pb.op.gmetric.dtype.itemsize
                         if pb.op.gmetric is not None
                         else pb.op.coeffs.size * pb.op.coeffs.dtype.itemsize)
            word = 4.0 if args.dtype == "f32" else 2.0
            mv_bytes_per_dof = 2 * word * (1 + 1 / p) + met_bytes / r.n_dofs
            mv_roofline = bw / mv_bytes_per_dof
            gsolve = r.dofs_per_s_per_it
            gmv = r.n_dofs / r.time_per_matvec
            frac_str = (stream_bytes_per_it(pb, p) / bw) / r.time_per_it
            # protocol invariant: a full iteration CONTAINS a matvec, so
            # time/matvec > time/it can only mean a contaminated solve
            # timing (deflated by an inflated latency correction) or a
            # broken matvec protocol — flag the row mechanically instead
            # of relying on the README's idle-host rule
            viol = ("  [VIOLATION: time/matvec > time/it — host load?]"
                    if r.time_per_matvec > r.time_per_it else "")
            log(f"  {p:2d} | {s:2d} | {r.n_dofs:8d} | "
                f"{r.time_per_it*1e6:10.1f} | {gsolve/1e9:9.2f} | "
                f"{gsolve/solve_roofline:10.3f} | {frac_str:8.3f} | "
                f"{r.time_per_matvec*1e6:10.1f} | {gmv/1e9:9.2f} | "
                f"{gmv/mv_roofline:7.3f} | {r.n_iterations}"
                + ("" if r.converged else "  [not converged]") + viol)
        except Exception:
            log(f"  {p:2d} | {s:2d} | FAILED")
            log(traceback.format_exc())
    # post-run latency recheck: reject the WHOLE table if the correction
    # drifted (the contaminated-host failure mode is now mechanical)
    ok, cached, fresh = timing.latency_recheck()
    if ok:
        log(f"# table done  (latency recheck ok: {cached*1e3:.1f} -> "
            f"{fresh*1e3:.1f} ms)")
    else:
        log(f"# TABLE REJECTED: round-trip latency drifted "
            f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms (>20%) — the host was "
            f"not idle; every solve time above is suspect.  Rerun on an "
            f"idle host.")
        sys.exit(3)


if __name__ == "__main__":
    main()
