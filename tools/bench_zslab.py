"""TPU timing for the zslab (in-kernel z-windowing + mask) matvec."""

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
    from mf_data_locality_tpu.ops import laplace_pallas as lp
    from mf_data_locality_tpu.utils import timing

    degree, s = 4, 13
    layout = DofLayout(BoxMesh.from_s(s), degree)
    n_dofs = 3 * layout.n_nodes
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((3,) + layout.n_nodes_axis),
                     jnp.float32)

    for win in ("pieces", "zslab"):
        for prec in ("split3", "bf16"):
            op = lp.make_pallas_operator(layout, dtype=jnp.float32,
                                         windowing=win, precision=prec)

            def step(u, op=op):
                return lp.vmult(op, u, constrained_identity=False)

            t = timing.time_scan_fetch(step, u0, inner=20, repeats=3)
            log(f"matvec {win:8s} {prec:8s} B=layer float32: {t*1e6:8.1f} us"
                f"  ({n_dofs/t/1e9:6.2f} GDoF/s)")

    # merged-CG iteration cost on the pieces path
    from mf_data_locality_tpu.models import bp4
    import mf_data_locality_tpu.solvers.cg_merged as cgm

    for prec in ("split3", "bf16"):
        prob = bp4.build(s=s, degree=degree, dtype=jnp.float32,
                         backend="pallas", precision=prec, windowing="pieces")

        def solve_scalar(bvec, prob=prob):
            r = cgm.merged_cg_solve(prob.a_apply, bvec, prob.inv_diag,
                                    max_iter=50, rel_tol=0.0)
            return r.x.ravel()[0] + r.res_norm

        f = jax.jit(solve_scalar)
        t = timing.time_min_fetch(lambda: f(prob.b), repeats=3)
        log(f"merged-CG 50-iter (pieces/{prec}/float32): {t/50*1e6:.1f} us/it"
            f"  ({n_dofs/(t/50)/1e9:.2f} GDoF/s/it)")


if __name__ == "__main__":
    log(f"# zslab bench start {time.strftime('%FT%T')}")
    main()
    log(f"# done in 0s")
