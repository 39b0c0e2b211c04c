"""Round-3 TPU batch 4: general-mesh backend scatter A/B.

VERDICT round-2 item 9: the general path (arbitrary hex meshes; gather map
+ scatter accumulate) was ~30x slower than the structured path at p=2,
dominated by the duplicate-index ``.at[].add`` scatter that XLA serializes
on TPU.  A/B the new transposed fixed-degree map (KMAX gathers + sum)
against the old scatter, with the structured path as the yardstick.

Run detached:  setsid python tools/probe_r3_batch4.py < /dev/null \
                 > tools/R3_BATCH4.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/R3_BATCH4.txt"


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

    from mf_data_locality_tpu.mesh.box import BoxMesh
    from mf_data_locality_tpu.mesh.dofs import DofLayout
    from mf_data_locality_tpu.ops import laplace, laplace_structured
    from mf_data_locality_tpu.utils import timing

    log(f"# probe_r3_batch4 backend={jax.default_backend()}")

    for p, s in ((2, 10), (3, 10), (4, 9)):
        try:
            layout = DofLayout(BoxMesh.from_s(s), p)
            op = laplace.make_operator(layout, dtype=jnp.float32)
            op_old = op._replace(scatter_pos=None, scatter_valid=None)
            n = layout.n_nodes
            rng = np.random.default_rng(0)
            u = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)

            new_f = jax.jit(lambda v: laplace.vmult(op, v))
            old_f = jax.jit(lambda v: laplace.vmult(op_old, v))
            sop = laplace_structured.make_structured_operator(layout,
                                                              dtype=jnp.float32)
            lat = (3,) + layout.n_nodes_axis
            st_f = jax.jit(lambda v: laplace_structured.vmult(
                sop, v.reshape(lat)).reshape(v.shape))

            # parity first
            a = np.asarray(new_f(u))
            b = np.asarray(old_f(u))
            np.testing.assert_allclose(a, b, atol=1e-3 * np.abs(b).max())
            for label, fn in (("general-new", new_f), ("general-old", old_f),
                              ("structured", st_f)):
                t = timing.time_scan_fetch(fn, u, inner=30, repeats=2)
                log(f"p={p} s={s} ({3*n} DoF) {label}: {t*1e6:9.1f} us/apply "
                    f"{3*n/t/1e9:6.2f} GDoF/s")
        except Exception:
            log(f"p={p} s={s}: FAILED")
            log(traceback.format_exc())
    log("# batch4 done")


if __name__ == "__main__":
    main()
