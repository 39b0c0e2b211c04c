"""MXU-resident cofactor microbench (VERDICT r4 item 1).

Question: can the on-the-fly rebuild's per-q-point 3x3 invert/assembly
chain ride the MXU instead of the VPU?  The only layout-viable MXU form
found (plane products are elementwise across the lane axis, so batched
3x3 algebra per q-point cannot be a matmul directly) is the
**C-direct selector matmul**:

    C = J^T J is QUADRATIC in the 24 trilinear cell coefficients, and the
    d-sum makes the quadratic-monomial matrix d-presummable:
        ccc[k*8+k'] = sum_d c24[8d+k] * c24[8d+k']          (64, B) VPU
        C6          = M2 @ ccc                               one MXU matmul
    with the constant selector M2[(ef)*q3p + r, k*8+k'] =
    pds_e[r,k] * pds_f[r,k'] (independent of d).  This replaces BOTH the
    three K=8 J-evaluation matmuls AND the 30-op VPU C computation; the
    remaining VPU chain is adj(C) 18 + det 5 + scale 3 + rows 6 = 32 ops
    vs the jtj chain's ~62 (the reference keeps the whole chain in
    registers, poisson_operator.h:27-63; on TPU the analog question is
    MXU vs VPU placement).

Trade: the selector matmul has K=64 (192 after the split3 hi/lo
K-stacking) against the J-eval's K=8 (24 stacked) and 6 q^3 output rows
against 9 q^3 — i.e. ~3-5x the MXU FLOPs to delete half the VPU chain.
Whether that wins depends on whether the K=8 J-eval is pipeline-overhead-
bound (then the bigger-K matmul is nearly free) or FLOP-bound.

Arms (standalone pallas kernel: stream (24,1,1,B) coefficient blocks over
L layers, rebuild (6 q3p, B), accumulate into the output):
    noop       rebuild ablated (stream floor, common to all arms)
    jeval      J matmul only, invert/assembly ablated
    adjj       production adjugate-of-J chain
    jtj        production adj(J^T J) rsqrt chain (shipping at p>=5 twostage)
    cd3        C-direct, split3 f32-class selector matmul
    cdbf       C-direct, single-pass bf16 selector matmul (class probe:
               geometry at ~2e-3 — only meaningful for the bf16 rung)

Shapes: dense-form (q^3-row) tiles at p=4 and p=9 with L = the layer
count of the headline meshes (s=13 / s=10, B=128) — per-chain work ==
one production iteration's rebuild work, so deltas are directly
comparable to the shipping-shape ablation (tools/PROBE_R5_ABLATE.txt).
p=9 production runs twostage per-qz blocks; the dense-shape row count
here is a proxy for the same VPU/MXU op mix.

Protocol: alternating-pair floors, cross-round minima, one slope
(timing.scan_chain_pair / slope_of_floors), interleaved arms.
Correctness gate: cd3 must match the adjj chain on random bounded-
distortion geometry to split3 class before any timing is reported.

Output -> tools/MICROBENCH_MXU_COFACTOR.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "MICROBENCH_MXU_COFACTOR.txt")


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
    from jax.experimental import pallas as pl

    from mf_data_locality_tpu.ops import lagrange
    from mf_data_locality_tpu.ops.cg_fused_kernel import (_metric_onthefly,
                                                          _pad_row_blocks)
    from mf_data_locality_tpu.ops.laplace_pallas import (
        _mm, _monomial_derivative_matrices)
    from mf_data_locality_tpu.utils import timing

    bw = timing.measure_hbm_bandwidth()
    log(f"# microbench_mxu_cofactor  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency={timing.round_trip_latency()*1e3:.1f} ms")

    B = 128
    ARMS = ("noop", "jeval", "adjj", "jtj", "cd3", "cdbf")
    EF = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]

    def build_static(p, q):
        """(geo (4 q3p, 8), M2 (6 q3p, 64), q3p) as f32 numpy."""
        shape = lagrange.make_shape(p, q)
        q3 = q ** 3
        q3p = -(-q3 // 8) * 8
        pds = np.concatenate(_monomial_derivative_matrices(shape.q_points),
                             axis=0)  # (3 q3, 8) f64
        w = shape.q_weights
        w3 = (w[:, None, None] * w[None, :, None]
              * w[None, None, :]).reshape(-1, 1)
        geo = np.asarray(jnp.concatenate(
            [_pad_row_blocks(jnp.asarray(pds), 3, q3, q3p),
             _pad_row_blocks(jnp.asarray(np.pad(w3, ((0, 0), (0, 7)))),
                             1, q3, q3p)], axis=0), np.float32)
        pe = pds.reshape(3, q3, 8)
        m2 = np.zeros((6 * q3p, 64), np.float64)
        for i, (e, f) in enumerate(EF):
            blk = (pe[e][:, :, None] * pe[f][:, None, :]).reshape(q3, 64)
            m2[i * q3p: i * q3p + q3] = blk
        return geo, m2.astype(np.float32), q3p

    def metric_cdirect(c24, geo, m2, prec):
        """C-direct rebuild: one selector matmul + the reduced VPU chain."""
        q3p = geo.shape[0] // 4
        w3 = geo[3 * q3p:, 0:1]
        # d-presummed quadratic monomials of the coefficients (VPU, on
        # (8, B) tiles: 24 mult + 16 add total -- ~1 op/q-point-equivalent)
        rows = []
        for k in range(8):
            acc = c24[0:8] * c24[k: k + 1]
            acc = acc + c24[8:16] * c24[8 + k: 8 + k + 1]
            acc = acc + c24[16:24] * c24[16 + k: 16 + k + 1]
            rows.append(acc)
        ccc = jnp.concatenate(rows, axis=0)  # (64, B)
        C6 = _mm(m2, ccc, prec)  # (6 q3p, B) -- the ONE MXU matmul
        c00, c01, c02, c11, c12, c22 = (
            C6[i * q3p: (i + 1) * q3p] for i in range(6))
        adjC = [c11 * c22 - c12 * c12, c02 * c12 - c01 * c22,
                c01 * c12 - c02 * c11, c00 * c22 - c02 * c02,
                c01 * c02 - c00 * c12, c00 * c11 - c01 * c01]
        detC = c00 * adjC[0] + c01 * adjC[1] + c02 * adjC[2]
        scale = w3 * jax.lax.rsqrt(jnp.where(detC <= 0.0, 1.0, detC))
        return jnp.concatenate([r * scale for r in adjC], axis=0)

    def make_step(arm, p, q, L, geo, m2, q3p):
        geoc, m2c = jnp.asarray(geo), jnp.asarray(m2)
        ablate = {"noop": ("rebuild",), "jeval": ("invert",),
                  "adjj": (), "jtj": ("jtj",)}.get(arm)

        def kernel(c24_ref, geo_ref, m2_ref, out_ref):
            c24 = c24_ref[:, 0, 0, :]
            if arm == "cd3":
                g6 = metric_cdirect(c24, geo_ref[...], m2_ref[...], "split3")
            elif arm == "cdbf":
                g6 = metric_cdirect(c24, geo_ref[...], m2_ref[...], "bf16")
            else:
                g6 = _metric_onthefly(c24, geo_ref[...], ablate=ablate)
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[...] = g6

            @pl.when(i > 0)
            def _():
                out_ref[...] += g6

        call = pl.pallas_call(
            kernel, grid=(L,),
            in_specs=[
                pl.BlockSpec((24, 1, 1, B), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((4 * q3p, 8), lambda i: (0, 0)),
                pl.BlockSpec((6 * q3p, 64), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((6 * q3p, B), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((6 * q3p, B), jnp.float32),
        )

        def step(x):
            y = call(x, geoc, m2c)
            # data dependence without perturbing the chained state
            # (1 + 1e-30*y == 1 in f32, but not foldable statically)
            return x * (1.0 + 1e-30 * y[0, 0])

        return step

    def random_c24(L, rng):
        """Bounded-distortion trilinear coefficients: identity map + noise
        (det(J) stays positive, like the benchmark's deformed mesh)."""
        c = rng.standard_normal((24, L, 1, B)) * 0.08
        c[1] += 1.0   # dx/du
        c[8 + 2] += 1.0  # dy/dv
        c[16 + 4] += 1.0  # dz/dw
        return jnp.asarray(c, jnp.float32)

    rng = np.random.default_rng(7)

    for p, s_label, L in ((4, "s=13", 64), (9, "s=10", 8)):
        q = p + 2
        geo, m2, q3p = build_static(p, q)
        x0 = random_c24(L, rng)

        # correctness gate: cd3 vs adjj on one layer, split3 class
        ref = jax.jit(lambda c: _metric_onthefly(c[:, 0, 0, :],
                                                 jnp.asarray(geo)))(x0)
        got = jax.jit(lambda c: metric_cdirect(c[:, 0, 0, :],
                                               jnp.asarray(geo),
                                               jnp.asarray(m2),
                                               "split3"))(x0)
        q3 = q ** 3
        live = np.concatenate([np.arange(i * q3p, i * q3p + q3)
                               for i in range(6)])
        r, g_ = np.asarray(ref)[live], np.asarray(got)[live]
        relerr = np.max(np.abs(r - g_)) / np.max(np.abs(r))
        log(f"# p={p} cd3-vs-adjj max rel err {relerr:.2e} "
            f"(gate: < 5e-4, split3 class)")
        if relerr > 5e-4:
            log(f"# p={p} GATE FAILED -- timings skipped")
            continue

        samplers = {}
        for arm in ARMS:
            step = make_step(arm, p, q, L, geo, m2, q3p)
            samplers[arm] = timing.scan_chain_pair(step, x0, inner=50,
                                                   repeats=2)
        floors = {arm: [float("inf")] * 2 for arm in ARMS}
        for rnd in range(4):  # interleaved: session drift cancels
            for arm in ARMS:
                t1, t2 = samplers[arm]()
                floors[arm][0] = min(floors[arm][0], t1)
                floors[arm][1] = min(floors[arm][1], t2)
        per = {arm: timing.slope_of_floors(floors[arm][0], floors[arm][1],
                                           50) for arm in ARMS}
        log(f"# p={p} {s_label} L={L} B={B} q3p={q3p} "
            f"(per-chain work == one iteration's rebuild)")
        for arm in ARMS:
            extra = ""
            if arm not in ("noop",):
                extra = f"  minus-noop={max(per[arm]-per['noop'],0)*1e6:7.1f}us"
            log(f"  p={p} {arm:5s} {per[arm]*1e6:8.1f} us/chain-step{extra}")

    ok, lat0, lat1 = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'DRIFTED'} "
        f"{lat0*1e3:.1f} -> {lat1*1e3:.1f} ms")


if __name__ == "__main__":
    main()
