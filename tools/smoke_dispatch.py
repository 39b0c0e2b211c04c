"""Dispatch-regression smoke: re-check the measured A/B decisions cheaply.

The auto-dispatch rules (``benchmark.resolve_factor`` / ``resolve_metric``)
encode ~30 on-chip A/B outcomes.  Sessions vary +-10%, configs drift (the
round-4 p=3 row), and a JAX/libtpu bump could silently invalidate any of
them (VERDICT r4 weak 6).  This script re-runs the six decision points that
carry the dispatch, INTERLEAVED (A B x3, min per arm) so session drift
cancels, at small-but-representative sizes, and compares against recorded
bands:

  PASS   the recorded winner still wins (within 5%)
  DRIFT  winner unchanged but the margin moved >25% vs the recorded band
  FAIL   the winner flipped — the dispatch rule is stale; rerun the full
         probe for that point before regenerating tables

Timing is the two-chain slope over chained fused iterations, with the
L/2L chains sampled as ALTERNATING back-to-back pairs and the slope taken
over cross-round chain floors (``timing.scan_chain_pair`` +
``slope_of_floors``): the per-chain fixed cost and the latency correction
cancel in the subtraction, pair-adjacency keeps the tunnel's
non-stationary fixed-cost drift common-mode, and taking minima per chain
length before the one subtraction removes the downward bias of
min-of-per-round-slopes.  Both hazards produced physically impossible
recorded bands (6 and 12 us/it for a ~95 us/it config) before this form.
This smoke is immune to the contaminated-host failure mode by
construction.

Usage (idle host, ~minutes once the kernels are in the compile cache)::

   python tools/smoke_dispatch.py            # compare vs recorded bands
   python tools/smoke_dispatch.py --record   # (re)record the bands

Artifacts: tools/SMOKE_DISPATCH_BANDS.json (recorded bands),
tools/SMOKE_DISPATCH.txt (latest run report).

The reference's analog is the itCG-match invariant between its two
executables (SURVEY §4 item 2) — a self-check that the two paths still
agree — generalized here to the perf decisions the dispatch encodes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANDS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "SMOKE_DISPATCH_BANDS.json")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "SMOKE_DISPATCH.txt")

# the six decision points (name, p, s, rung, arm A = recorded winner, arm B)
# sizes: one-to-two notches below ladder max — big enough that the decision
# regime (VPU/MXU/DMA balance) matches the shipping size, small enough to
# keep the smoke minutes-cheap.  Bands are recorded at THESE sizes; the
# smoke detects drift, it does not re-derive the ladder-max decision.
POINTS = [
    # p=3 carve-out: dense+precomputed must keep beating twostage+onthefly
    # (the one convergence-carved dispatch row, PROBE_PROD/PRODHIST).
    # MUST run at the ladder size s=14: the decision regime shifts with
    # size — at s=12 the winner genuinely flips (twostage+onthefly ~55
    # us/it vs dense+precomputed ~91) and at s=13 it is a coin-flip
    # (114 vs 109, alternating-pair protocol), while at the shipping
    # s=14 the interleaved solve A/B (PROBE_R5_P3AB) has dense+
    # precomputed winning 190.5 vs 222.5 us/it.  The smoke must smoke
    # THE decision, not a half-size proxy of it.
    ("p3_dense-pre_vs_two-otf", 3, 14, "split2m",
     dict(factor="dense", metric="precomputed"),
     dict(factor="twostage", metric="onthefly")),
    # p=4 factor on the f32-class rung (PROBE_P4FACTOR interleaved win)
    ("p4_two_vs_dense_otf", 4, 12, "split2m",
     dict(factor="twostage", metric="onthefly"),
     dict(factor="dense", metric="onthefly")),
    # p=2 geometry (dense, even q): onthefly wins on split rungs
    ("p2_otf_vs_pre", 2, 13, "split2m",
     dict(factor="dense", metric="onthefly"),
     dict(factor="dense", metric="precomputed")),
    # p=9 geometry under twostage
    ("p9_otf_vs_pre_two", 9, 9, "split2m",
     dict(factor="twostage", metric="onthefly"),
     dict(factor="twostage", metric="precomputed")),
    # bf16 rung keeps dense at p=4 (PROBE_DISPATCH2 part G)
    ("p4_bf16_dense_vs_two", 4, 12, "bf16",
     dict(factor="dense", metric="onthefly"),
     dict(factor="twostage", metric="onthefly")),
    # p=1 keeps the precomputed stream on every rung
    ("p1_pre_vs_otf", 1, 14, "split2m",
     dict(factor="dense", metric="precomputed"),
     dict(factor="dense", metric="onthefly")),
    # jtj cofactor chain wins at twostage+onthefly p>=5
    # (PROBE_R5_COFACTOR/PROBE_R5_JTJ2; p=4 keeps adjj)
    ("p6_jtj_vs_adjj", 6, 11, "split2m",
     dict(factor="twostage", metric="onthefly", cofactor="jtj"),
     dict(factor="twostage", metric="onthefly", cofactor="adjj")),
]


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def make_iteration_step(p, s, precision, cfg):
    """Build a chained-fused-iteration step fn + initial state for one
    config (the per-iteration cost proxy the dispatch decisions rank)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk

    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kprec = precision
    pb = bp4.build(s, p, dtype=dtype, backend="pallas", precision=kprec,
                   windowing="pieces",
                   metric_dtype=(jnp.bfloat16 if precision == "bf16"
                                 else None),
                   factor=cfg["factor"], metric=cfg["metric"],
                   cofactor=cfg.get("cofactor", "adjj"))
    op_c = jax.tree.map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, pb.op)
    lat = pb.layout.n_nodes_axis
    acc = jnp.float32
    p2 = p * p
    b_lat = pb.b.reshape((pb.n_components,) + lat)
    prec_lat = pb.inv_diag.reshape((1,) + lat)
    g0 = fk.to_piece_state(-b_lat.astype(acc), p)[:, :, :p2]
    prec_pieces = fk.to_piece_state(prec_lat.astype(acc), p)[:, :, :p2]
    zg0 = fk.zplanes_init(g0, p)
    store = dtype
    state0 = (jnp.zeros_like(g0), g0,
              jnp.zeros(g0.shape, store), jnp.zeros(g0.shape, store),
              zg0, jnp.zeros(zg0.shape, store), jnp.zeros(zg0.shape, store),
              jnp.zeros((8,), acc).at[4].set(1.0))

    def step(st):
        x, g, d, h, zg, zd, zh, scal = st
        return fk.fused_cg_iteration(op_c, lat, x, g, d, h, zg, zd, zh,
                                     scal, prec_pieces, compact=True)

    return step, state0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="(re)record the bands instead of comparing")
    ap.add_argument("--rounds", type=int, default=3,
                    help="interleaved A/B rounds (min per arm)")
    ap.add_argument("--points", default=None,
                    help="comma-separated subset of point names")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mf_data_locality_tpu.utils import timing

    pts = POINTS
    if args.points:
        names = set(args.points.split(","))
        pts = [pt for pt in POINTS if pt[0] in names]

    bands = {}
    if os.path.exists(BANDS):
        with open(BANDS) as f:
            bands = json.load(f)

    log(f"# smoke_dispatch  backend={jax.default_backend()}  "
        f"record={args.record}  rounds={args.rounds}")
    results, status_all = {}, "PASS"
    for name, p, s, rung, cfg_a, cfg_b in pts:
        step_a, st_a = make_iteration_step(p, s, rung, cfg_a)
        step_b, st_b = make_iteration_step(p, s, rung, cfg_b)
        # Floor-of-alternating-pairs protocol: each sample measures the L-
        # and 2L-chains BACK-TO-BACK (the tunnel's per-call fixed cost is
        # non-stationary, drifting several ms on minute timescales — floors
        # sampled in separate blocks absorb that drift into the slope
        # subtraction and fabricated 6-12 us/it bands for 95 us/it configs
        # twice); minima accumulate per chain length across interleaved
        # rounds (min of per-round SLOPES is biased downward — one lucky
        # 2L / unlucky L chain poisons it), and ONE slope is taken from
        # the two floors at the end.  inner=200 keeps the compute signal
        # (tens of ms) well above the residual intra-pair drift.
        inner = 200
        sample_a = timing.scan_chain_pair(step_a, st_a, inner=inner,
                                          repeats=2)
        sample_b = timing.scan_chain_pair(step_b, st_b, inner=inner,
                                          repeats=2)
        t1a = t2a = t1b = t2b = float("inf")
        for _ in range(args.rounds):  # interleaved: session drift cancels
            s1, s2 = sample_a()
            t1a, t2a = min(t1a, s1), min(t2a, s2)
            s1, s2 = sample_b()
            t1b, t2b = min(t1b, s1), min(t2b, s2)
        t_a = timing.slope_of_floors(t1a, t2a, inner)
        t_b = timing.slope_of_floors(t1b, t2b, inner)
        ratio = t_a / t_b
        results[name] = dict(t_a=t_a, t_b=t_b, ratio=ratio)
        if args.record or name not in bands:
            status = "RECORDED"
        elif ratio > 1.05:
            status, status_all = "FAIL (winner flipped)", "FAIL"
        elif abs(ratio - bands[name]["ratio"]) > 0.25 * bands[name]["ratio"]:
            status = "DRIFT (margin moved >25%)"
            if status_all == "PASS":
                status_all = "DRIFT"
        else:
            status = "PASS"
        rec = (f" (recorded {bands[name]['ratio']:.3f})"
               if name in bands and not args.record else "")
        log(f"  {name:28s} A={t_a*1e6:8.1f}us B={t_b*1e6:8.1f}us "
            f"ratio={ratio:.3f}{rec}  {status}")

    if args.record or not bands:
        bands.update(results)  # subset re-records must not clobber the rest
        with open(BANDS, "w") as f:
            json.dump(bands, f, indent=1)
        log(f"# bands recorded -> {BANDS}")
    else:
        log(f"# overall: {status_all}")
        if status_all == "FAIL":
            sys.exit(2)


if __name__ == "__main__":
    main()
