"""Full-matvec variant benchmark on TPU: windowing x precision x block.

Times the complete BP4 p=4 s=13 operator apply (lattice -> windowing ->
Pallas kernel -> scatter) for the round-2 design candidates, plus a merged-CG
time/iteration for the leader.  Appends to tools/MATVEC_VARIANTS.txt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, flush=True)
    with open("/root/repo/tools/MATVEC_VARIANTS.txt", "a") as f:
        f.write(msg + "\n")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from mf_data_locality_tpu.mesh.box import BoxMesh
    from mf_data_locality_tpu.mesh.dofs import DofLayout
    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.ops import laplace_pallas as lp
    from mf_data_locality_tpu.utils import timing

    degree, s = 4, 13
    layout = DofLayout(BoxMesh.from_s(s), degree)
    lat = (3,) + layout.n_nodes_axis
    n_dofs = 3 * layout.n_nodes
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(lat), jnp.float32)

    variants = [
        ("reshape", "split3", None, jnp.float32),
        ("reshape", "bf16", None, jnp.float32),
        ("reshape", "split3", 512, jnp.float32),
        ("reshape", "split3", None, jnp.bfloat16),
        ("reshape", "bf16", None, jnp.bfloat16),
    ]
    best = None
    for win, prec, block, dt in variants:
        op = lp.make_pallas_operator(layout, dtype=dt, windowing=win,
                                     precision=prec, block=block)

        def step(u):
            return lp.vmult(op, u, constrained_identity=False)

        u_in = u0.astype(dt)
        t = timing.time_scan_fetch(step, u_in, inner=20, repeats=3)
        gdofs = n_dofs / t / 1e9
        tag = f"{win:8s} {prec:8s} B={block or 'auto'} {np.dtype(dt).name}"
        log(f"matvec {tag}: {t*1e6:8.1f} us  ({gdofs:6.2f} GDoF/s)")
        if best is None or t < best[0]:
            best = (t, win, prec, block, dt)

    # merged-CG time/iteration for the headline (f32/split3) and the
    # reduced-precision (bf16 storage + bf16 matmul) configs
    import mf_data_locality_tpu.solvers.cg_merged as cgm
    from dataclasses import replace

    for win, prec, block, dt in [("reshape", "split3", None, jnp.float32),
                                 ("reshape", "bf16", None, jnp.bfloat16)]:
        prob = bp4.build(s=s, degree=degree, dtype=dt, backend="pallas",
                         precision=prec, windowing=win)

        def solve_scalar(bvec, prob=prob):
            r = cgm.merged_cg_solve(prob.a_apply, bvec, prob.inv_diag,
                                    max_iter=50, rel_tol=0.0)
            return (r.x.ravel()[0].astype(jnp.float32)
                    + r.res_norm.astype(jnp.float32))

        f = jax.jit(solve_scalar)
        t = timing.time_min_fetch(lambda: f(prob.b), repeats=3)
        per_it = t / 50
        gd = n_dofs / per_it / 1e9
        log(f"merged-CG 50-iter ({win}/{prec}/{np.dtype(dt).name}): "
            f"{per_it*1e6:.1f} us/it  ({gd:.2f} GDoF/s/it)")


if __name__ == "__main__":
    t0 = time.time()
    log(f"# matvec variants start {time.strftime('%FT%T')}")
    main()
    log(f"# done in {time.time()-t0:.0f}s")
