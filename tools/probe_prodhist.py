"""Production-config convergent ladder + matvec-aliasing recheck (round 4).

VERDICT r3 item 8: extend the PARITY convergence ladder with the on-chip
residual-history deviation of the SHIPPING default — split2m + factor auto
(dense p<=4 / twostage p>=5) + metric onthefly — at the convergent points,
replacing the f32-interpret proxy.  Deviation vs the f64 CPU reference
histories (tools/CONV_REF.npz): max_i |h[i] - ref[i]| / ref[i] over the
first half and the full min-length range (the PARITY.md column definition).

Also re-times the fused-path matvec (piece_vmult) at the configs where the
round-3 protocol showed time/matvec > time/it (VERDICT weak item 3): the
kernel now aliases d->h, zd->zh in place, removing the per-apply carry
copy inside the 50-apply scan.

Run detached with an idle host:
  setsid python tools/probe_prodhist.py < /dev/null \
      > tools/PROBE_PRODHIST.log 2>&1 & echo $! > /tmp/probe_prodhist.pid
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_PRODHIST.txt"


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

    from mf_data_locality_tpu.benchmark import run_one
    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_fused
    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    log(f"# production-config history ladder  backend={jax.default_backend()}"
        f"  bw={bw/1e9:.0f} GB/s  config: split2m, factor=auto, onthefly")

    ref = np.load("/root/repo/tools/CONV_REF.npz")
    hist_out = {}
    conv_pts = [(3, 9), (4, 7), (5, 6), (6, 4)]
    for p, s in conv_pts:
        it_ref = int(ref[f"p{p}_it"]) if f"p{p}_s" in ref.files and \
            int(ref[f"p{p}_s"]) == s else {(6, 4): 75}.get((p, s))
        h_ref = (np.asarray(ref[f"p{p}_hist"])
                 if f"p{p}_s" in ref.files and int(ref[f"p{p}_s"]) == s
                 else None)
        factor = "dense" if p <= 4 else "twostage"
        try:
            pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                           precision="split2m", windowing="pieces",
                           factor=factor, metric="onthefly")
            lat = pb.layout.n_nodes_axis
            r = jax.jit(
                lambda pb=pb, lat=lat: cg_fused.fused_merged_cg_solve(
                    pb.op, lat, pb.b.reshape((3,) + lat),
                    pb.inv_diag.reshape((1,) + lat)))()
            it = int(r.n_iterations)
            hist = np.asarray(r.res_history)[: it + 1]
            hist_out[f"p{p}_s{s}_prod"] = hist
            msg = (f"conv p={p} s={s} split2m+onthefly({factor}): itCG={it} "
                   f"(f64 ref {it_ref}) conv={bool(r.converged)}")
            if h_ref is not None:
                n = min(hist.size, h_ref.size)
                dev = np.abs(hist[:n] - h_ref[:n]) / np.maximum(h_ref[:n],
                                                                1e-300)
                msg += (f"  hist dev half/full = {dev[: n // 2].max():.1e} / "
                        f"{dev.max():.1e}")
            log(msg)
        except Exception:
            log(f"conv p={p} s={s} prod: FAILED")
            log(traceback.format_exc())
        np.savez("/root/repo/tools/CONV_PROD.npz", **hist_out)

    # -- matvec aliasing recheck at the round-3 anomaly configs ------------
    log("# matvec recheck (piece_vmult now aliased in-place)")
    log("#  p |  s | factor   | metric      | time/it us | time/mv us")
    for p, s, factor, metric in ((5, 12, "twostage", "precomputed"),
                                 (9, 10, "twostage", "precomputed"),
                                 (5, 12, "twostage", "onthefly"),
                                 (9, 10, "twostage", "onthefly"),
                                 (4, 13, "dense", "onthefly"),
                                 (6, 12, "twostage", "onthefly"),
                                 # dense-vs-twostage under onthefly at low
                                 # degrees (twostage was only measured to
                                 # win at p>=5 with the PREcomputed metric;
                                 # the onthefly combination may move the
                                 # crossover — headline p=4 candidate)
                                 (2, 14, "twostage", "onthefly"),
                                 (3, 14, "twostage", "onthefly"),
                                 (4, 13, "twostage", "onthefly")):
        try:
            pb = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                           precision="split2m", windowing="pieces",
                           factor=factor, metric=metric)
            r = run_one(p, s, solver="fused", dtype=jnp.float32,
                        backend="pallas", precision="split2m",
                        windowing="pieces", factor=factor, metric=metric,
                        solve_repeats=2, matvec_repeats=2, matvec_inner=50,
                        problem=pb)
            flag = "" if r.time_per_matvec <= r.time_per_it else "  ** mv>it"
            log(f"  {p:2d} | {s:2d} | {factor:8s} | {metric:11s} | "
                f"{r.time_per_it*1e6:10.1f} | {r.time_per_matvec*1e6:10.1f}"
                + flag)
        except Exception:
            log(f"  {p:2d} | {s:2d} | {factor:8s} | {metric:11s} | FAILED")
            log(traceback.format_exc())
    log("# prodhist probe done")


if __name__ == "__main__":
    main()
