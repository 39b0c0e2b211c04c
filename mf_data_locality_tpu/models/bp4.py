"""CEED benchmark problem BP4: 3-component vector Poisson.

The flagship "model" of the framework — assembles mesh, DoF layout, operator,
node-blocked Jacobi preconditioner and the synthetic right-hand side into one
solvable problem, mirroring the reference harness setup
(``common_code/benchmark.h:50-176``):

* FE_Q(p)^3 on the sine-deformed box with 2**s cells, zero Dirichlet
  boundary values, Gauss(p+2) integration;
* preconditioner from the GLL(p+1) operator diagonal, one scalar per node;
* RHS value ``dof_index % 8`` on unconstrained DoFs (``benchmark.h:170-176``)
  with the node-major, component-interleaved index convention.

BP4 per the CEED definition pairs with BP3's q = p + 2 rule; scalar variants
(BP1/BP3 analogues) are available via ``n_components=1``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mf_data_locality_tpu.mesh.box import BoxMesh
from mf_data_locality_tpu.mesh.dofs import DofLayout
from mf_data_locality_tpu.ops import diagonal, laplace
from mf_data_locality_tpu.solvers import cg, cg_merged


@dataclass(frozen=True)
class BP4Problem:
    layout: DofLayout
    op: laplace.LaplaceOperatorData
    inv_diag: jax.Array  # (n_nodes,)
    b: jax.Array  # (n_nodes, n_components)
    n_components: int

    @property
    def n_dofs(self) -> int:
        return self.layout.n_nodes * self.n_components


def build(s: int, degree: int, dtype=jnp.float32, n_components: int = 3,
          n_q: int | None = None) -> BP4Problem:
    layout = DofLayout(BoxMesh.from_s(s), degree)
    op = laplace.make_operator(layout, n_q=n_q, dtype=dtype)
    inv_diag = diagonal.compute_inverse_diagonal(layout, dtype=dtype)

    # RHS: dof % 8 on unconstrained DoFs, components interleaved per node
    n = layout.n_nodes
    dof_index = (np.arange(n)[:, None] * n_components
                 + np.arange(n_components)[None, :])
    b = (dof_index % 8).astype(np.float64)
    b[layout.boundary_node_mask] = 0.0
    return BP4Problem(
        layout=layout,
        op=op,
        inv_diag=inv_diag,
        b=jnp.asarray(b, dtype=dtype),
        n_components=n_components,
    )


def solve_baseline(problem: BP4Problem, max_iter: int = 100,
                   rel_tol: float = 1e-8) -> cg.SolveResult:
    """Textbook PCG with full vmult (constrained identity), as bench_precond."""
    a = partial(laplace.vmult, problem.op)
    return cg.cg_solve(a, problem.b, problem.inv_diag, max_iter=max_iter,
                       rel_tol=rel_tol)


def solve_merged(problem: BP4Problem, max_iter: int = 100,
                 rel_tol: float = 1e-8) -> cg.SolveResult:
    """Fully-merged CG; operator applied without the constrained-identity
    fixup, exactly like ``vmult_with_merged_sums`` (poisson_operator.h:327-377)."""
    a = partial(laplace.vmult, problem.op, constrained_identity=False)
    return cg_merged.merged_cg_solve(a, problem.b, problem.inv_diag,
                                     max_iter=max_iter, rel_tol=rel_tol)
