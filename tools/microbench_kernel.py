"""Kernel-design micro-benchmark (round 2): settle the cost model on TPU.

Questions this answers (results appended to tools/MICROBENCH.txt):

  A. What do MXU passes cost in-kernel?  The main (3q^3, p1^3) @ (p1^3, B)
     matmuls at f32 HIGHEST / HIGH / DEFAULT and a manual bf16 hi/lo
     3-product split (hh + hl + lh, f32 accumulation).
  B. What does the on-the-fly geometry (trilinear Jacobian -> adjugate ->
     metric G) cost on the VPU?  Timed as a standalone "compute G" kernel —
     which doubles as the setup kernel for the precomputed-metric design.
  C. Is a precomputed-G apply kernel faster than the on-the-fly one?
     (Hypothesis: on TPU, 6 extra f32 reads/qpoint at ~920 GB/s beat ~120
     VPU passes/qpoint; the reference's compute-for-bandwidth trade flips.)

Usage:
  python tools/microbench_kernel.py --cpu     # interpret-mode smoke test
  python tools/microbench_kernel.py           # TPU measurement (slow compiles)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P_DEG = 4
Q = P_DEG + 2
Q3 = Q**3
P13 = (P_DEG + 1) ** 3
C = 3
B = 256
NC = 8192


def log(msg: str) -> None:
    print(msg, flush=True)
    with open("/root/repo/tools/MICROBENCH.txt", "a") as f:
        f.write(msg + "\n")


def split_bf16(x, jnp):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mf_data_locality_tpu.ops import lagrange
    from mf_data_locality_tpu.ops.laplace_pallas import (
        _dense_gradient_matrices,
        _monomial_derivative_matrices,
    )
    from mf_data_locality_tpu.utils import timing

    interp = args.cpu
    inner = 2 if args.cpu else 20
    repeats = 1 if args.cpu else 3

    rng = np.random.default_rng(0)
    shape = lagrange.make_shape(P_DEG, Q)
    mats_np = np.concatenate(_dense_gradient_matrices(P_DEG, Q), axis=0)
    pds_np = np.concatenate(_monomial_derivative_matrices(shape.q_points), axis=0)
    w = shape.q_weights
    w3_np = (w[:, None, None] * w[None, :, None] * w[None, None, :]).reshape(-1, 1)
    co_np = rng.normal(0.1, 0.02, (3, 8, NC))
    co_np[0, 1] += 1.0
    co_np[1, 2] += 1.0
    co_np[2, 4] += 1.0
    u_np = rng.standard_normal((C * P13, NC))

    mats = jnp.asarray(mats_np, jnp.float32)
    pds = jnp.asarray(pds_np, jnp.float32)
    w3 = jnp.asarray(w3_np, jnp.float32)
    co = jnp.asarray(co_np, jnp.float32)
    u0 = jnp.asarray(u_np, jnp.float32)

    grid = (NC // B,)
    f32 = jnp.float32

    def mm(a, b_, precision):
        if precision == "split3":
            ah, al = split_bf16(a, jnp)
            bh, bl = split_bf16(b_, jnp)
            d = functools.partial(jnp.dot, preferred_element_type=f32)
            return d(ah, bh) + (d(ah, bl) + d(al, bh))
        if precision == "bf16":
            return jnp.dot(a.astype(jnp.bfloat16), b_.astype(jnp.bfloat16),
                           preferred_element_type=f32)
        return jnp.dot(a, b_, preferred_element_type=f32,
                       precision=getattr(jax.lax.Precision, precision))

    # ---- A: main matmuls only (no geometry) ----------------------------
    def matmul_kernel(precision, mats_ref, u_ref, out_ref):
        m = mats_ref[:]
        for c in range(C):
            u_c = u_ref[c * P13:(c + 1) * P13, :]
            g = mm(m, u_c, precision)  # (3q3, B)
            t = g[:Q3] + g[Q3:2 * Q3] + g[2 * Q3:]
            t3 = jnp.concatenate([t, t, t], axis=0)
            v = jax.lax.dot_general(
                m, t3, (((0,), (0,)), ((), ())),
                preferred_element_type=f32) if precision in ("split3", "bf16") \
                else jax.lax.dot_general(
                    m, t3, (((0,), (0,)), ((), ())), preferred_element_type=f32,
                    precision=getattr(jax.lax.Precision, precision))
            out_ref[c * P13:(c + 1) * P13, :] = v

    def make_matmul_fn(precision):
        def kern(mats_ref, u_ref, out_ref):
            # transpose-side precision handled like forward for split3/bf16
            m = mats_ref[:]
            for c in range(C):
                u_c = u_ref[c * P13:(c + 1) * P13, :]
                g = mm(m, u_c, precision)
                t = g  # (3q3, B) keep all three directions
                dn = (((0,), (0,)), ((), ()))
                if precision == "split3":
                    mh, ml = split_bf16(m, jnp)
                    th, tl = split_bf16(t, jnp)
                    dd = functools.partial(jax.lax.dot_general,
                                           dimension_numbers=dn,
                                           preferred_element_type=f32)
                    v = dd(mh, th) + (dd(mh, tl) + dd(ml, th))
                elif precision == "bf16":
                    v = jax.lax.dot_general(
                        m.astype(jnp.bfloat16), t.astype(jnp.bfloat16), dn,
                        preferred_element_type=f32)
                else:
                    v = jax.lax.dot_general(
                        m, t, dn, preferred_element_type=f32,
                        precision=getattr(jax.lax.Precision, precision))
                out_ref[c * P13:(c + 1) * P13, :] = v

        def apply(u):
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((3 * Q3, P13), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C * P13, B), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C * P13, B), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interp,
            )(mats, u)
        return apply

    # f64 reference for the error column (one block)
    def ref_block(ub):
        m64 = mats_np.astype(np.float64)
        out = np.empty((C * P13, ub.shape[1]))
        for c in range(C):
            g = m64 @ ub[c * P13:(c + 1) * P13]
            out[c * P13:(c + 1) * P13] = m64.T @ g
        return out

    ref0 = ref_block(u_np[:, :B].astype(np.float64))

    # NOTE: Mosaic rejects Precision.HIGH in-kernel (NotImplementedError) —
    # only HIGHEST/DEFAULT lower; manual splits cover the middle ground.
    for prec in ("HIGHEST", "DEFAULT", "split3", "bf16"):
        fn = make_matmul_fn(prec)
        out0 = np.asarray(jax.jit(fn)(u0)[:, :B], np.float64)
        err = np.max(np.abs(out0 - ref0)) / np.max(np.abs(ref0))
        t = timing.time_scan_fetch(fn, u0, inner=inner, repeats=repeats)
        log(f"matmul_{prec:8s}: {t*1e6:9.1f} us/apply   rel_err={err:.2e}")

    # ---- B: compute-G kernel (geometry only) ---------------------------
    def g_kernel(pds_ref, w3_ref, co_ref, out_ref):
        co_ = co_ref[:]
        j_all = [jnp.dot(pds_ref[:], co_[d], preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST).reshape(3, Q3, B)
                 for d in range(3)]
        j = [[j_all[d][e] for e in range(3)] for d in range(3)]
        adj = [[None] * 3 for _ in range(3)]
        adj[0][0] = j[1][1] * j[2][2] - j[1][2] * j[2][1]
        adj[0][1] = j[0][2] * j[2][1] - j[0][1] * j[2][2]
        adj[0][2] = j[0][1] * j[1][2] - j[0][2] * j[1][1]
        adj[1][0] = j[1][2] * j[2][0] - j[1][0] * j[2][2]
        adj[1][1] = j[0][0] * j[2][2] - j[0][2] * j[2][0]
        adj[1][2] = j[0][2] * j[1][0] - j[0][0] * j[1][2]
        adj[2][0] = j[1][0] * j[2][1] - j[1][1] * j[2][0]
        adj[2][1] = j[0][1] * j[2][0] - j[0][0] * j[2][1]
        adj[2][2] = j[0][0] * j[1][1] - j[0][1] * j[1][0]
        det = j[0][0] * adj[0][0] + j[0][1] * adj[1][0] + j[0][2] * adj[2][0]
        scale = w3_ref[:] / det

        def gmat(e, f):
            return scale * (adj[e][0] * adj[f][0] + adj[e][1] * adj[f][1]
                            + adj[e][2] * adj[f][2])

        gs = [gmat(0, 0), gmat(0, 1), gmat(0, 2),
              gmat(1, 1), gmat(1, 2), gmat(2, 2)]
        out_ref[:] = jnp.concatenate(gs, axis=0)

    def compute_g(co_in):
        return pl.pallas_call(
            g_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3 * Q3, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q3, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 8, B), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((6 * Q3, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((6 * Q3, NC), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interp,
        )(pds, w3, co_in)

    gmem = compute_g(co)

    def g_chain(x):
        g = compute_g(co * (1.0 + 0e-7 * x[0, 0, 0]))
        return x + 1e-30 * g[0, 0]

    t = timing.time_scan_fetch(g_chain, co, inner=inner, repeats=repeats)
    log(f"compute_G (setup) : {t*1e6:9.1f} us/call    "
        f"G size={6*Q3*NC*4/1e6:.1f} MB")

    # ---- C: precomputed-G apply kernel ---------------------------------
    def make_apply_g(precision):
        def kern(mats_ref, g6_ref, u_ref, out_ref):
            m = mats_ref[:]
            g6 = g6_ref[:]
            g00, g01, g02 = g6[:Q3], g6[Q3:2*Q3], g6[2*Q3:3*Q3]
            g11, g12, g22 = g6[3*Q3:4*Q3], g6[4*Q3:5*Q3], g6[5*Q3:]
            dn = (((0,), (0,)), ((), ()))
            for c in range(C):
                u_c = u_ref[c * P13:(c + 1) * P13, :]
                gr = mm(m, u_c, precision).reshape(3, Q3, B)
                t0 = g00 * gr[0] + g01 * gr[1] + g02 * gr[2]
                t1 = g01 * gr[0] + g11 * gr[1] + g12 * gr[2]
                t2 = g02 * gr[0] + g12 * gr[1] + g22 * gr[2]
                t_all = jnp.concatenate([t0, t1, t2], axis=0)
                if precision == "split3":
                    mh, ml = split_bf16(m, jnp)
                    th, tl = split_bf16(t_all, jnp)
                    dd = functools.partial(jax.lax.dot_general,
                                           dimension_numbers=dn,
                                           preferred_element_type=f32)
                    v = dd(mh, th) + (dd(mh, tl) + dd(ml, th))
                elif precision == "bf16":
                    v = jax.lax.dot_general(
                        m.astype(jnp.bfloat16), t_all.astype(jnp.bfloat16),
                        dn, preferred_element_type=f32)
                else:
                    v = jax.lax.dot_general(
                        m, t_all, dn, preferred_element_type=f32,
                        precision=getattr(jax.lax.Precision, precision))
                out_ref[c * P13:(c + 1) * P13, :] = v

        def apply(u):
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((3 * Q3, P13), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((6 * Q3, B), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C * P13, B), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C * P13, B), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interp,
            )(mats, gmem, u)
        return apply

    for prec in ("HIGHEST", "split3", "DEFAULT"):
        fn = make_apply_g(prec)
        t = timing.time_scan_fetch(fn, u0, inner=inner, repeats=repeats)
        log(f"applyG_{prec:9s}: {t*1e6:9.1f} us/apply")

    # ---- D: current full kernel for comparison -------------------------
    from mf_data_locality_tpu.ops import laplace_pallas as lp

    class FakeLayoutMesh:
        n_cells = NC
        n_cells_axis = (32, 16, 16)
        cell_vertices = None

    # reuse the library op but with our random coeffs
    op = lp.PallasOperatorData(
        mats=mats, pds=pds, w3=w3, coeffs=co,
        mask=jnp.ones((1, 1, 1, 1), jnp.float32), block=B, n_cells=NC)
    fn = lambda u: lp.apply_local_batched(op, u, interpret=interp)  # noqa: E731
    t = timing.time_scan_fetch(fn, u0, inner=inner, repeats=repeats)
    log(f"full_current      : {t*1e6:9.1f} us/apply  (on-the-fly G, HIGHEST)")


if __name__ == "__main__":
    t0 = time.time()
    log(f"# microbench start {time.strftime('%FT%T')} argv={sys.argv[1:]}")
    main()
    log(f"# done in {time.time()-t0:.0f}s")
