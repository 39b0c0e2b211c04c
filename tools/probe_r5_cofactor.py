"""Round-5 part E: attack the onthefly invert/assembly chain (VERDICT item 1).

The on-the-fly rebuild's VPU cofactor/determinant/metric-assembly chain is
the binding serial term at every degree (frac_str plateau ~0.45-0.50).
VERDICT r4 item 1 asks: microbench an MXU-resident (or restructured)
cofactor inversion, land it if it wins >= 20%, otherwise commit the
microbench artifact showing the MXU form loses.

Three candidates measured here (implemented inside
``cg_fused_kernel._metric_onthefly`` behind ablate-style flags):

  base    the shipping adjugate-of-J chain (~70 VPU ops/element:
          adj 27 + det 5 + guarded divide + G assembly 36)
  jtj     G = w adj(J^T J) rsqrt(det(J^T J)) — mathematically identical
          (C^{-1} = J^{-1} J^{-T}, det C = det(J)^2), ~62 ops and an
          rsqrt instead of the divide; validated to 1.6e-6 relative vs
          base in f32 interpret
  arecip  base with the divide replaced by pl.reciprocal(approx=True)
          (~2^-8-class G perturbation — convergence-gated)

Part A: interleaved two-chain-slope A/B at the shipping onthefly points
        (split2m p=2/4/6/9, bf16 p=9).
Part B: iteration class at the convergent points p=4 s=7, p=6 s=4
        (split2m): itCG + residual-history deviation vs base.
Part C: the MXU-form feasibility microbench.  A "cofactor as small
        matmuls against constant selector matrices" needs the 18 pairwise
        J-products laid out with the product index on the CONTRACTION
        axis and q^3 B on lanes — i.e. per product one (q^3, B) ->
        (1, q^3 B) sublane->lane flatten inside the kernel.  Part C times
        a standalone kernel doing the current invert chain vs the same
        inputs doing just those 18 flattens (no matmul, no combine): if
        the mandatory relayouts alone cost more than the whole VPU chain,
        the MXU form is dead regardless of its arithmetic.
        (Same relayout family R3_BATCH7 measured 2x slower for the
        fusesplit intermediates.)

Run: setsid python tools/probe_r5_cofactor.py < /dev/null > tools/PROBE_R5_COFACTOR.log 2>&1 &
Artifact: tools/PROBE_R5_COFACTOR.txt
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_R5_COFACTOR.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing
    from mf_data_locality_tpu.benchmark import resolve_factor, resolve_metric
    from tools.probe_r5_dots import make_step

    bw = timing.measure_hbm_bandwidth()
    lat0 = timing.round_trip_latency()
    log(f"# cofactor-chain candidates  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency={lat0*1e3:.1f} ms")

    # ---- part A: slope A/B at shipping onthefly points ---------------------
    pts = [("split2m", 2, 15), ("split2m", 4, 13), ("split2m", 6, 12),
           ("split2m", 9, 10), ("bf16", 9, 10)]
    FORMS = [("base", ()), ("jtj", ("jtj",)), ("arecip", ("arecip",))]
    arms = {}
    for prec, p, s in pts:
        try:
            built = {}
            for fname, abl in FORMS:
                step, st, factor, metric = make_step(p, s, prec, abl)
                built[fname] = (step, st)
            if metric != "onthefly":
                log(f"# point {prec} p={p} s={s}: resolves to {metric}, "
                    f"SKIPPED (candidates only touch the rebuild)")
                continue
            arms[(prec, p, s)] = built
            log(f"# point {prec} p={p} s={s}: factor={factor} "
                f"metric={metric}")
        except Exception:
            log(f"# point {prec} p={p} s={s}: build FAILED")
            log(traceback.format_exc())
    best = {}
    # run1 used inner=25: ~5 ms of chain work vs the ~25 ms tunnel fixed
    # cost per chain made the slope jitter-dominated (base 2.9-418 us/it
    # scatter at one point).  inner=50 doubles the signal (matches
    # probe_r5_dots, whose 8-round table was decision-grade).
    for rnd in range(5):
        for key, built in arms.items():
            prec, p, s = key
            row = []
            for fname, _ in FORMS:
                step, st = built[fname]
                t = timing.time_scan_fetch(step, st, inner=50, repeats=3)
                b = best.setdefault(key, {})
                b[fname] = min(b.get(fname, float("inf")), t)
                row.append(f"{fname} {t*1e6:7.1f}")
            log(f"  round {rnd}  {prec:8s} p={p} s={s}  " + "  ".join(row))
    log("# slope minima:")
    for (prec, p, s), b in best.items():
        base = b["base"]
        log(f"  {prec:8s} p={p} s={s}: " + "  ".join(
            f"{fn} {b[fn]*1e6:7.1f} ({(b[fn]/base-1)*100:+5.1f}%)"
            for fn, _ in FORMS))

    # ---- part B: iteration class at the convergent points ------------------
    for p, s in [(4, 7), (6, 4)]:
        try:
            factor = resolve_factor("auto", p, "pieces", precision="split2m",
                                    solver="fused")
            metric = resolve_metric("auto", "fused", "pieces", factor, p,
                                    precision="split2m")
            pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                           precision="split2m", windowing="pieces",
                           factor=factor, metric=metric)
            lat = pb.layout.n_nodes_axis
            outs = {}
            for fname, abl in FORMS:
                r = jax.jit(
                    lambda abl=abl: cg_fused.fused_merged_cg_solve(
                        pb.op, lat, pb.b.reshape((3,) + lat),
                        pb.inv_diag.reshape((1,) + lat), _ablate=abl))()
                it = int(r.n_iterations)
                outs[fname] = (it, bool(r.converged),
                               np.asarray(r.res_history)[: it + 1])
                log(f"  conv split2m p={p} s={s} {fname}: itCG={it} "
                    f"conv={bool(r.converged)}")
            it0, _, h0 = outs["base"]
            for fname in ("jtj", "arecip"):
                it1, _, h1 = outs[fname]
                n = min(h0.size, h1.size)
                dev = np.abs(h1[:n] - h0[:n]) / np.maximum(h0[:n], 1e-300)
                log(f"  => p={p} s={s} {fname}: itCG {it0} -> {it1}, "
                    f"hist dev max={dev.max():.1e}")
        except Exception:
            log(f"  conv p={p} s={s}: FAILED")
            log(traceback.format_exc())

    # ---- part C: MXU-form relayout feasibility ------------------------------
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        q3, B = 216, 512  # q=6 (p=4 shipping), full-lane tile
        rng = np.random.default_rng(0)
        Jrows = jnp.asarray(rng.standard_normal((9 * q3, B)), jnp.float32)
        w3 = jnp.asarray(rng.standard_normal((q3, 1)) ** 2, jnp.float32)

        def chain_kernel(J_ref, w_ref, x_ref, o_ref):
            Jr = J_ref[:]
            x = x_ref[:]
            (a, b, c_), (d, e, f), (g, h, i) = (
                (Jr[k * 3 * q3 + 0 * q3: k * 3 * q3 + 1 * q3] + x,
                 Jr[k * 3 * q3 + 1 * q3: k * 3 * q3 + 2 * q3],
                 Jr[k * 3 * q3 + 2 * q3: k * 3 * q3 + 3 * q3])
                for k in range(3))
            adj = [[e * i - f * h, c_ * h - b * i, b * f - c_ * e],
                   [f * g - d * i, a * i - c_ * g, c_ * d - a * f],
                   [d * h - e * g, b * g - a * h, a * e - b * d]]
            det = a * adj[0][0] + b * adj[1][0] + c_ * adj[2][0]
            scale = w_ref[:] / jnp.where(det == 0.0, 1.0, det)
            acc = jnp.zeros((q3, B), jnp.float32)
            for e_ in range(3):
                for f_ in range(e_, 3):
                    acc = acc + (adj[e_][0] * adj[f_][0]
                                 + adj[e_][1] * adj[f_][1]
                                 + adj[e_][2] * adj[f_][2]) * scale
            o_ref[:] = acc

        def flatten_kernel(J_ref, w_ref, x_ref, o_ref):
            # ONLY the data movement the MXU form needs: 18 sublane->lane
            # flattens of (q3, B) product tiles into (1, q3*B) rows (the
            # contraction layout), then one dummy combine back
            Jr = J_ref[:]
            x = x_ref[:]
            acc = jnp.zeros((1, q3 * B), jnp.float32)
            for k in range(18):
                tile = (Jr[(k % 9) * q3: (k % 9 + 1) * q3] + x
                        ) * Jr[((k + 3) % 9) * q3: ((k + 3) % 9 + 1) * q3]
                acc = acc + tile.reshape(1, q3 * B)
            o_ref[:] = (acc.reshape(q3, B) * w_ref[:])

        def mk(kern):
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((q3, B), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            return lambda x: f(Jrows, w3, x) * 1e-6

        x0 = jnp.zeros((q3, B), jnp.float32)
        for name, kern in (("vpu-chain", chain_kernel),
                           ("mxu-flattens", flatten_kernel)):
            t = min(timing.time_scan_fetch(mk(kern), x0, inner=50, repeats=1)
                    for _ in range(3))
            log(f"  microbench q3={q3} B={B}: {name:13s} {t*1e6:7.1f} us/call")
    except Exception:
        log("  part C FAILED")
        log(traceback.format_exc())

    ok, cached, fresh = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'REJECTED (host not idle)'} "
        f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms")


if __name__ == "__main__":
    main()
