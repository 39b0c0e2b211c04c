"""Decompose the merged-CG iteration cost on TPU (p=4 s=13, split3/pieces).

Round-2 sweep measured solve/it = 592 us vs standalone matvec = 414 us; the
standalone update4b+dots7 scan costs only ~34 us (probe_sweeps.py).  This
probe measures the MARGINAL cost of each iteration component inside one
scanned chain, so we can see where the ~180 us goes:

  V1  matvec only                     (vmult, mask, no identity)
  V2  matvec + dots7                  (marginal dots cost)
  V3  update4b + matvec               (marginal update cost)
  V4  full body, real recurrences     (scan analog of the while_loop body)
  V5  apply_lattice only              (marginal cost of the two mask passes)
  WL  real merged solve / iteration   (while_loop, rel_tol=0 forced 50 its)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)
    with open("/root/repo/tools/PROBE_ITERATION.txt", "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mf_data_locality_tpu.models import bp4
    from mf_data_locality_tpu.solvers import cg_merged
    from mf_data_locality_tpu.ops import laplace_pallas
    from mf_data_locality_tpu.utils import timing

    s, p = 13, 4
    problem = bp4.build(s, p, backend="pallas", precision="split3",
                        windowing="pieces")
    a = problem.a_apply
    lat = (3,) + problem.layout.n_nodes_axis
    op = problem.op
    b = problem.b
    prec = problem.inv_diag
    log(f"# probe_iteration p={p} s={s} split3/pieces "
        f"n_dofs={problem.n_dofs} backend={jax.default_backend()}")

    INNER = 50

    def dots7(g, d, h):
        ph = prec * h
        pg = prec * g
        return jnp.stack([
            jnp.vdot(d, h), jnp.vdot(h, h), jnp.vdot(g, h), jnp.vdot(g, g),
            jnp.vdot(g, ph), jnp.vdot(h, ph), jnp.vdot(g, pg)])

    def update4b(x, g, d, h, alpha, beta, aob):
        pg = prec * g
        x2 = x + (alpha + aob) * d + aob * pg
        g2 = g + alpha * h
        d2 = beta * d - prec * g2
        return x2, g2, d2

    # V1: matvec only
    t1 = timing.time_scan_fetch(a, b, inner=INNER, repeats=3)
    log(f"V1 matvec only        : {t1*1e6:9.1f} us")

    # V5: apply_lattice only (no mask passes)
    def lat_only(u):
        return laplace_pallas.apply_lattice(op, u.reshape(lat)).reshape(u.shape)
    t5 = timing.time_scan_fetch(lat_only, b, inner=INNER, repeats=3)
    log(f"V5 no-mask apply      : {t5*1e6:9.1f} us  (mask passes: {(t1-t5)*1e6:+.1f})")

    # V2: matvec + dots7 (g, d fixed reads; s folded into next d)
    def chain2(carry):
        d, g = carry
        h = a(d)
        sv = dots7(g, d, h)
        return (h * (1.0 + 0.0 * sv[0]), g)
    def scan2(x0):
        @jax.jit
        def f(d, g):
            out, _ = jax.lax.scan(lambda c, _: (chain2(c), None), (d, g),
                                  None, length=INNER)
            return out[0].ravel()[0]
        return f
    f2 = scan2(None)
    t2 = timing.time_min_fetch(lambda: f2(b, b * 0.5), repeats=3) / INNER
    log(f"V2 matvec + dots7     : {t2*1e6:9.1f} us  (dots marginal: {(t2-t1)*1e6:+.1f})")

    # V3: update4b + matvec, fixed scalars
    @jax.jit
    def f3(x, g, d, h):
        def body(c, _):
            x, g, d, h = c
            x, g, d = update4b(x, g, d, h, 0.3, 0.5, 0.1)
            h = a(d)
            return (x, g, d, h), None
        out, _ = jax.lax.scan(body, (x, g, d, h), None, length=INNER)
        return out[0].ravel()[0]
    t3 = timing.time_min_fetch(lambda: f3(b, b, b, b), repeats=3) / INNER
    log(f"V3 update4b + matvec  : {t3*1e6:9.1f} us  (update marginal: {(t3-t1)*1e6:+.1f})")

    # V4: full body with real scalar recurrences (scan, no while cond)
    @jax.jit
    def f4(x, g, d, h):
        def body(c, _):
            x, g, d, h, alpha, beta, aob = c
            x, g, d = update4b(x, g, d, h, alpha, beta, aob)
            h = a(d)
            sv = dots7(g, d, h)
            alpha2 = sv[6] / sv[0]
            beta2 = alpha2 * (sv[4] + alpha2 * sv[5]) / sv[6]
            return (x, g, d, h, alpha2, beta2, alpha / jnp.maximum(beta, 1e-30)), None
        z = jnp.zeros(())
        out, _ = jax.lax.scan(body, (x, g, d, h, z, z, z), None, length=INNER)
        return out[0].ravel()[0]
    t4 = timing.time_min_fetch(lambda: f4(b, -b, b * 0, b * 0), repeats=3) / INNER
    log(f"V4 full body (scan)   : {t4*1e6:9.1f} us")

    # WL: the real while_loop solve forced to 50 iterations
    @jax.jit
    def solve50(op_, pc, bb):
        from functools import partial
        raw = partial(laplace_pallas.vmult, op_, constrained_identity=False)
        aa = lambda u: raw(u.reshape(lat)).reshape(u.shape)
        return cg_merged.merged_cg_solve(aa, bb, pc, max_iter=INNER,
                                         rel_tol=0.0, abs_tol=0.0)
    r = solve50(op, prec, b)
    n_it = int(r.n_iterations)
    twl = timing.time_min_fetch(
        lambda: solve50(op, prec, b).res_norm, repeats=3) / max(n_it, 1)
    log(f"WL while_loop solve   : {twl*1e6:9.1f} us/it (n_it={n_it}; "
        f"while-vs-scan: {(twl-t4)*1e6:+.1f})")


if __name__ == "__main__":
    main()
