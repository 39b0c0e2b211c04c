"""Find convergent-size ladder points per degree (CPU f64 merged CG).

For each p, walk s upward and record itCG of the f64 merged solve (tol
1e-8 rel, cap 100 — the reference protocol, ``benchmark_precond/bench.cc:11``)
until it stops converging.  Saves the f64 residual histories of the largest
convergent point per degree to tools/CONV_REF.npz for the TPU-vs-f64
residual-deviation table (VERDICT round-2 item 6; BASELINE "residual history
matches reference within 1e-10 relative").

Run on CPU: JAX_PLATFORMS=cpu python tools/find_convergent.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mf_data_locality_tpu.models import bp4
from mf_data_locality_tpu.solvers import cg_merged


def main():
    out = {}
    for p in (3, 4, 5, 6):
        best = None
        for s in range(4, 12):
            prob = bp4.build(s, p, dtype=jnp.float64, backend="structured")
            res = cg_merged.merged_cg_solve(
                prob.a_apply_full, prob.b, prob.inv_diag,
                max_iter=100, rel_tol=1e-8)
            it = int(res.n_iterations)
            conv = bool(res.converged)
            ndofs = prob.n_dofs
            print(f"p={p} s={s} n_dofs={ndofs} itCG={it} conv={conv}",
                  flush=True)
            if conv:
                best = (s, it, np.asarray(res.res_history)[: it + 1], ndofs)
            else:
                break
        if best is not None:
            s, it, hist, ndofs = best
            out[f"p{p}_s"] = s
            out[f"p{p}_it"] = it
            out[f"p{p}_ndofs"] = ndofs
            out[f"p{p}_hist"] = hist
            print(f"-> p={p}: largest convergent s={s} (itCG={it}, "
                  f"{ndofs} DoFs)", flush=True)
    np.savez("tools/CONV_REF.npz", **out)
    print("saved tools/CONV_REF.npz")


if __name__ == "__main__":
    main()
