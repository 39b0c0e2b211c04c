"""Why is the pieces/split3 SOLVE 984us/it when its matvec is 346us?

Probes: repeat measurement, scan-based 50-iteration chain (same body as the
while_loop), and a lower VMEM cap.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)
    with open("/root/repo/tools/MATVEC_VARIANTS.txt", "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_merged as cgm
    from mf_data_locality_tpu.utils import timing

    prob = bp4.build(s=13, degree=4, dtype=jnp.float32, backend="pallas",
                     precision="split3", windowing="pieces")
    n_dofs = prob.n_dofs

    # 1) repeat the while_loop-based solve measurement
    def solve_scalar(bvec):
        r = cgm.merged_cg_solve(prob.a_apply, bvec, prob.inv_diag,
                                max_iter=50, rel_tol=0.0)
        return r.x.ravel()[0] + r.res_norm

    f = jax.jit(solve_scalar)
    t = timing.time_min_fetch(lambda: f(prob.b), repeats=3)
    log(f"probe while-solve (pieces/split3): {t/50*1e6:.1f} us/it")

    # 2) scan-based chain of the SAME iteration body (no while_loop)
    a = prob.a_apply
    prec = prob.inv_diag

    def body(carry, _):
        x, g, d, h, alpha, beta = carry
        pg = prec * g
        x = x + alpha * d + 0.001 * pg
        g = g + alpha * h
        d = beta * d - pg
        h = a(d)
        s = jnp.stack([jnp.vdot(d, h), jnp.vdot(h, h), jnp.vdot(g, h),
                       jnp.vdot(g, g), jnp.vdot(g, pg), jnp.vdot(h, pg),
                       jnp.vdot(g, pg)])
        alpha = s[6] / (s[0] + 1e30)
        beta = alpha * (s[4] + alpha * s[5]) / (s[6] + 1e30)
        return (x, g, d, h, alpha, beta), None

    @jax.jit
    def chain(b):
        z = jnp.zeros_like(b)
        init = (z, -b, z, z, jnp.zeros(()), jnp.zeros(()))
        out, _ = jax.lax.scan(body, init, None, length=50)
        return out[0].ravel()[0]

    t = timing.time_min_fetch(lambda: chain(prob.b), repeats=3)
    log(f"probe scan-iteration (pieces/split3): {t/50*1e6:.1f} us/it")


if __name__ == "__main__":
    log(f"# solve probe start {time.strftime('%FT%T')}")
    main()
    log("# probe done")
