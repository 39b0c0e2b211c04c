"""Can in-kernel windowing beat the XLA reshape wrapper?

Prototype Pallas kernel: grid over z-cell-layers; dual BlockSpecs deliver the
overlapping +1 plane; y/x windowing via small W matmuls; the (ky,cy)x(kx,cx)
entanglement resolved by an in-VMEM transpose.  Output = the exact
(C*p1^3, nc) cell-batch array `_to_cell_batches` produces.

If this runs at ~memory-bound speed, the windowing moves into the main
kernel (mega-matvec); if Mosaic's transposes are slow, the XLA reshape
wrapper stays.

Usage: python tools/microbench_window.py [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P_DEG = 4
S = 13


def log(msg: str) -> None:
    print(msg, flush=True)
    with open("/root/repo/tools/MICROBENCH.txt", "a") as f:
        f.write(msg + "\n")


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

    from mf_data_locality_tpu.mesh.box import BoxMesh
    from mf_data_locality_tpu.mesh.dofs import DofLayout
    from mf_data_locality_tpu.ops import laplace_pallas as lp
    from mf_data_locality_tpu.utils import timing

    interp = args.cpu
    p = P_DEG
    p1 = p + 1
    layout = DofLayout(BoxMesh.from_s(S), p)
    C = 3
    ncz, ncy, ncx = layout.mesh.n_cells_axis
    nz, ny, nx = layout.n_nodes_axis
    nyx = ny * nx
    nc = ncz * ncy * ncx
    B = ncy * ncx  # cells per z-layer

    wy = jnp.asarray(lp._window_matrix(ny, p), jnp.float32)  # (p1*ncy, ny)
    wx = jnp.asarray(lp._window_matrix(nx, p), jnp.float32)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((C, nz, ny, nx)), jnp.float32)
    u_flat = u.reshape(C, nz * nyx)

    hi = jax.lax.Precision.HIGHEST

    def kern(um_ref, up_ref, wy_ref, wx_ref, out_ref):
        um = um_ref[:].reshape(C, p, ny, nx)
        up = up_ref[:].reshape(C, 1, ny, nx)
        slab = jnp.concatenate([um, up], axis=1)  # (C, p1, ny, nx)
        # x windows: contract nx -> (kx, cx) kx-major lanes
        a = jax.lax.dot_general(
            slab.reshape(C * p1 * ny, nx), wx_ref[:],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=hi)  # (C*p1*ny, p1*ncx)
        a = a.reshape(C, p1, ny, p1 * ncx)
        # y windows: contract ny -> (ky, cy) rows
        b = jax.lax.dot_general(
            wy_ref[:], a, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=hi)  # (p1*ncy, C, p1, p1*ncx)
        b = b.transpose(1, 2, 0, 3)  # (C, p1z, (ky,cy), (kx,cx))
        # disentangle: (ky, cy, kx, cx) -> (ky, kx, cy, cx)
        b = b.reshape(C, p1, p1, ncy, p1, ncx)
        b = b.transpose(0, 1, 2, 4, 3, 5)
        out_ref[:] = b.reshape(C * p1**3, B)

    def window(uf):
        return pl.pallas_call(
            kern,
            grid=(ncz,),
            in_specs=[
                pl.BlockSpec((C, p * nyx), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, nyx), lambda i: (0, i * p + p),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p1 * ncy, ny), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p1 * ncx, nx), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C * p1**3, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C * p1**3, nc), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interp,
        )(uf, uf, wy, wx)

    # correctness vs the XLA wrapper
    ref = lp._to_cell_batches(u, p, nc)
    got = jax.jit(window)(u_flat)
    err = float(jnp.max(jnp.abs(ref - got)))
    log(f"window-kernel correctness: max abs diff = {err:.2e}")
    assert err < 1e-5, err

    inner = 2 if args.cpu else 20
    repeats = 1 if args.cpu else 3

    def step(uf):
        # chain a scalar dependency so the scan forces every apply
        return uf + window(uf)[0, 0] * 1e-30

    t = timing.time_scan_fetch(step, u_flat, inner=inner, repeats=repeats)
    log(f"window-kernel fwd   : {t*1e6:9.1f} us/apply   "
        f"(XLA wrapper fwd is ~125 us at p=4 s=13)")


if __name__ == "__main__":
    log(f"# window microbench start {time.strftime('%FT%T')} {sys.argv[1:]}")
    t0 = time.time()
    main()
    log(f"# done in {time.time()-t0:.0f}s")
