"""Decompose the merged-CG iteration: what do the non-matvec sweeps cost?

Times a scan over ONLY the update4b + dots7 arithmetic (no operator apply)
at the p=4 s=13 vector sizes.  Ideal traffic ~8.5 vector r/w ~= 60 us at
measured bandwidth; the solve-minus-matvec delta is ~100-135 us.
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
    import numpy as np

    from mf_data_locality_tpu.utils import timing

    n = 1635075
    rng = np.random.default_rng(0)
    shape = (3, n // 3)
    xs = [jnp.asarray(rng.standard_normal(shape), jnp.float32)
          for _ in range(4)]
    prec = jnp.asarray(rng.standard_normal((1, n // 3)) ** 2 + 0.5,
                       jnp.float32)

    def body(carry, _):
        x, g, d, h, alpha, beta = carry
        pg = prec * g
        x2 = x + (alpha + 0.5) * d + 0.3 * pg
        g2 = g + alpha * h
        d2 = beta * d - prec * g2
        ph = prec * h
        s = jnp.stack([jnp.vdot(d2, h), jnp.vdot(h, h), jnp.vdot(g2, h),
                       jnp.vdot(g2, g2), jnp.vdot(g2, ph), jnp.vdot(h, ph),
                       jnp.vdot(g2, pg)])
        alpha = s[6] / (s[0] + 1e30)
        beta = alpha * (s[4] + alpha * s[5]) / (s[6] + 1e30)
        # rotate h so the carry keeps all four vectors live like the solver
        return (x2, g2, d2, h + 1e-30 * alpha, alpha, beta), None

    @jax.jit
    def chain(x, g, d, h):
        init = (x, g, d, h, jnp.zeros(()), jnp.zeros(()))
        out, _ = jax.lax.scan(body, init, None, length=50)
        return out[0].ravel()[0]

    t = timing.time_min_fetch(lambda: chain(*xs), repeats=3)
    log(f"probe sweeps-only (update4b+dots7, p=4 sizes): {t/50*1e6:.1f} us/it")


if __name__ == "__main__":
    log(f"# sweeps probe start {time.strftime('%FT%T')}")
    main()
    log("# probe done")
