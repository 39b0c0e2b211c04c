"""A/B the fused-kernel internals on TPU (p=4 s=13 split3).

Same-session measurements of the full iteration vs ablated variants to
locate the in-kernel overhead (baseline probe: 487 us/it vs ~170 us traffic
floor + ~170 us MXU).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)
    with open("/root/repo/tools/PROBE_FUSED.txt", "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk
    from mf_data_locality_tpu.utils import timing

    problem = bp4.build(13, 4, backend="pallas", precision="split3",
                        windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)
    p = 4
    prec_pieces = fk.to_piece_state(prec_lat, p)
    g0 = fk.to_piece_state(-b_lat, p)
    scal = jnp.asarray([0.3, 0.5, 0.4, 0.1, 1., 0., 0., 0.], jnp.float32)
    z = jnp.zeros_like(g0)

    log("# probe_fused_ablate p=4 s=13 split3 (scan of 30 iterations)")
    for abl in ((), ("consistency",), ("dots",), ("mask",),
                ("consistency", "dots", "mask")):
        @jax.jit
        def run(x, g, d, h):
            zg = fk.zplanes_init(g, p)
            zz = jnp.zeros_like(zg)

            def body(c, _):
                x, g, d, h, zg, zd, zh = c
                x, g, d, h, zg, zd, zh, s = fk.fused_cg_iteration(
                    problem.op, lataxis, x, g, d, h, zg, zd, zh,
                    scal * (1.0 + 0.0 * s0_of(h)), prec_pieces, _ablate=abl)
                return (x, g, d, h, zg, zd, zh), None
            def s0_of(h):
                return h[0, 0, 0, 0]
            out, _ = jax.lax.scan(body, (x, g, d, h, zg, zz, zz), None,
                                  length=30)
            return out[0].ravel()[0]
        t = timing.time_min_fetch(lambda: run(z, g0, z, z), repeats=3) / 30
        log(f"ablate={','.join(abl) or 'none':28s}: {t*1e6:8.1f} us/it")


if __name__ == "__main__":
    main()
