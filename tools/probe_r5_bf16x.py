"""Round-5 part C: isolate bf16-x-only storage (VERDICT r4 item 3).

R3_BATCH5 rejected bf16 storage for x AND g together (breaks the
iteration class); x enters the iteration only through update4b
(x += c1 d + aob P g) and feeds none of the g/d/h residual recurrences,
so a bf16-x-only rung should keep the residual history bitwise f32-class
while halving x's read+write (2 of the ~9 state words/DoF; on the bf16
rung the x/g/P f32 streams are the residual above the 84 us one-pass
floor, R3_BATCH6).  The rung shipped behind ``--x-dtype bf16``
(cg_fused.fused_merged_cg_solve x_dtype) but was never measured.

Part A — speed, interleaved two-chain-slope A/B (x f32 vs x bf16):
  bf16 rung    p=4 s=13, p=6 s=12, p=9 s=10   (target: p=4 <= ~150 us/it)
  split2m rung p=4 s=13
Part B — iteration class at the convergent points (split2m, auto factor/
metric): p=4 s=7 and p=6 s=4, x f32 vs x bf16 — itCG must match and the
residual histories must be bitwise-equal (x feeds nothing); plus the
delivered-x rounding penalty ||x_bf16 - x_f32|| / ||x_f32|| (expected
~bf16 eps) and the true error vs the f64 CPU reference when available.
bf16 rung checked at its own convergent point p=6 s=4.

Run: setsid python tools/probe_r5_bf16x.py < /dev/null > tools/PROBE_R5_BF16X.log 2>&1 &
Artifact: tools/PROBE_R5_BF16X.txt
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_R5_BF16X.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def make_step(p, s, precision, x_dtype):
    import jax.numpy as jnp

    from mf_data_locality_tpu.benchmark import resolve_factor, resolve_metric
    from tools.smoke_dispatch import make_iteration_step

    factor = resolve_factor("auto", p, "pieces", precision=precision,
                            solver="fused")
    metric = resolve_metric("auto", "fused", "pieces", factor, p,
                            precision=precision)
    step, st = make_iteration_step(p, s, precision,
                                   dict(factor=factor, metric=metric))
    if x_dtype is not None:
        st = (st[0].astype(x_dtype),) + st[1:]
    return step, st, factor, metric


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

    bw = timing.measure_hbm_bandwidth()
    lat0 = timing.round_trip_latency()
    log(f"# bf16-x-only isolate  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency={lat0*1e3:.1f} ms")

    # ---- part A: interleaved slope A/B ------------------------------------
    pts = [("bf16", 4, 13), ("bf16", 6, 12), ("bf16", 9, 10),
           ("split2m", 4, 13)]
    arms = {}
    for prec, p, s in pts:
        try:
            a_step, a_st, factor, metric = make_step(p, s, prec, None)
            b_step, b_st, _, _ = make_step(p, s, prec, jnp.bfloat16)
            arms[(prec, p, s)] = (a_step, a_st, b_step, b_st)
            log(f"# point {prec} p={p} s={s}: factor={factor} metric={metric}")
        except Exception:
            log(f"# point {prec} p={p} s={s}: build FAILED")
            log(traceback.format_exc())
    best = {}
    # inner=50: the inner=25 slope is jitter-dominated on the tunneled
    # backend (see PROBE_R5_COFACTOR run1); 5 rounds for decision grade
    for rnd in range(5):
        for key, (a_step, a_st, b_step, b_st) in arms.items():
            prec, p, s = key
            ta = timing.time_scan_fetch(a_step, a_st, inner=50, repeats=3)
            tb = timing.time_scan_fetch(b_step, b_st, inner=50, repeats=3)
            ba, bb = best.get(key, (float("inf"), float("inf")))
            best[key] = (min(ba, ta), min(bb, tb))
            log(f"  round {rnd}  {prec:8s} p={p} s={s}  "
                f"x-f32 {ta*1e6:7.1f}  x-bf16 {tb*1e6:7.1f} us/it")
    log("# slope minima (x-f32 -> x-bf16):")
    for (prec, p, s), (ba, bb) in best.items():
        log(f"  {prec:8s} p={p} s={s}: {ba*1e6:7.1f} -> {bb*1e6:7.1f} us/it "
            f"({(bb/ba-1)*100:+.1f}%)")

    # ---- part B: iteration class at the convergent points ------------------
    ref = None
    try:
        ref = np.load("/root/repo/tools/CONV_REF.npz")
    except Exception:
        pass
    for prec, p, s in [("split2m", 4, 7), ("split2m", 6, 4), ("bf16", 6, 4)]:
        try:
            dtype = jnp.bfloat16 if prec == "bf16" else jnp.float32
            factor = resolve_factor("auto", p, "pieces", precision=prec,
                                    solver="fused")
            metric = resolve_metric("auto", "fused", "pieces", factor, p,
                                    precision=prec)
            pb = bp4.build(s, p, dtype=dtype, backend="pallas",
                           precision=prec, windowing="pieces",
                           metric_dtype=(jnp.bfloat16 if prec == "bf16"
                                         else None),
                           factor=factor, metric=metric)
            lat = pb.layout.n_nodes_axis
            outs = {}
            for tag, xd in (("x-f32", None), ("x-bf16", jnp.bfloat16)):
                r = jax.jit(
                    lambda xd=xd: cg_fused.fused_merged_cg_solve(
                        pb.op, lat, pb.b.reshape((3,) + lat),
                        pb.inv_diag.reshape((1,) + lat), x_dtype=xd))()
                it = int(r.n_iterations)
                hist = np.asarray(r.res_history)[: it + 1]
                outs[tag] = (it, bool(r.converged), hist,
                             np.asarray(r.x, dtype=np.float64))
                log(f"  conv {prec} p={p} s={s} {tag}: itCG={it} "
                    f"conv={bool(r.converged)}")
            (it_a, _, h_a, x_a), (it_b, _, h_b, x_b) = (outs["x-f32"],
                                                        outs["x-bf16"])
            n = min(h_a.size, h_b.size)
            hdev = np.abs(h_a[:n] - h_b[:n]) / np.maximum(h_a[:n], 1e-300)
            xdev = (np.linalg.norm(x_b - x_a)
                    / max(np.linalg.norm(x_a), 1e-300))
            msg = (f"  => {prec} p={p} s={s}: itCG {it_a} vs {it_b}, "
                   f"hist dev max={hdev.max():.1e}, "
                   f"||x_bf16 - x_f32||/||x_f32||={xdev:.2e}")
            if (ref is not None and f"p{p}_s" in ref.files
                    and int(ref[f"p{p}_s"]) == s):
                h_ref = np.asarray(ref[f"p{p}_hist"])
                m = min(n, h_ref.size)
                dev_r = (np.abs(h_b[:m] - h_ref[:m])
                         / np.maximum(h_ref[:m], 1e-300))
                msg += f", x-bf16 hist dev vs f64 ref={dev_r.max():.1e}"
            log(msg)
        except Exception:
            log(f"  conv {prec} p={p} s={s}: FAILED")
            log(traceback.format_exc())

    ok, cached, fresh = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'REJECTED (host not idle)'} "
        f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms")


if __name__ == "__main__":
    main()
