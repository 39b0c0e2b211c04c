"""Merged CG driven by the whole-iteration fused Pallas kernel.

Same recurrence as :mod:`cg_merged` (``solver_cg_optimized.h:190-302``), but
each iteration is ONE pallas_call (:mod:`ops.cg_fused_kernel`): vector
updates, operator sweep, piece consistency and the seven partial dots all
happen in a single pass over the piece-resident state — the reference's
single-sweep-per-iteration property realized in VMEM instead of via
pre/post range callbacks.

Entry point :func:`fused_merged_cg_solve` accepts/returns lattice-form
vectors; the piece-state round trips happen once at entry/exit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mf_data_locality_tpu.ops import cg_fused_kernel as fk
from mf_data_locality_tpu.ops.laplace_pallas import PallasOperatorData
from mf_data_locality_tpu.solvers.cg import SolveResult


def fused_merged_cg_solve(
    op: PallasOperatorData,
    n_nodes_axis,
    b: jax.Array,
    prec: jax.Array,
    x0: jax.Array | None = None,
    max_iter: int = 100,
    abs_tol: float = 1e-15,
    rel_tol: float = 1e-8,
    interpret: bool | None = None,
    fold: bool = False,
    alias: bool = True,
    layers_per_step: int = 1,
    compact: bool = True,
    x_skip: bool = False,
    prec_dtype=None,
    x_dtype=None,
    _ablate: tuple = (),
) -> SolveResult:
    """Solve A x = b (lattice vectors (C, Nz, Ny, Nx)) with the fused kernel.

    ``prec``: (C or 1, Nz, Ny, Nx) lattice preconditioner diagonal.
    ``x0``: handled by shifting to the residual equation A dx = b - A x0
    (identical residual history; one extra operator apply at entry).
    ``fold``: lane-fold the component axis so the kernel's MXU contractions
    run at 3x width (:func:`ops.cg_fused_kernel.fold_state`).
    ``compact``: store only the owner mm rows of the piece state (36% less
    state traffic at p=4); duplicated rows are reconstructed in VMEM by
    lane-rolls (:func:`ops.cg_fused_kernel._expand_mm`).
    ``x_skip``: on non-pay iterations of the delayed-x recurrence
    (c1 = aob = 0, every second iteration) run an x-less kernel variant via
    ``lax.cond``, eliding x's HBM read+write — bitwise-identical algebra
    (``solver_cg_optimized.h:132-160``'s deferred-x steady state).
    ``prec_dtype``: storage dtype for the preconditioner stream (e.g.
    bf16 — static data, halves P's read traffic; the kernel upcasts to the
    accumulation dtype, so only P's values round, a ~0.4% relative Jacobi
    perturbation; the reduced-precision storage capability slot,
    ``vector_access_reduced.h:57-283``).
    ``x_dtype``: storage dtype for the SOLUTION vector x only (e.g. bf16 —
    halves x's read+write, 2 of the ~9 state words/DoF).  x enters the
    iteration only through update4b and feeds none of the g/d/h residual
    recurrences, so the iteration path (residual history, iteration
    counts) is unchanged to f32 class; the delivered x is rounded through
    ``x_dtype`` each pay iteration, bounding the final solution accuracy
    at ~its epsilon relative to |x| regardless of the solver tolerance
    (the isolate VERDICT r4 asked for: R3_BATCH5 only ever tested bf16
    x AND g together, which DOES break the iteration class).

    On CG breakdown (d.h = 0 in the scalar recurrence) the residual becomes
    NaN, the while-loop condition ``res > tol`` turns False, and the solve
    exits with ``res = NaN`` and ``converged = False`` — distinguishable
    from plain non-convergence (finite ``res``) by ``isnan`` (the
    reference throws ``ExcDivideByZero`` here,
    ``solver_cg_optimized.h:249``).
    """
    if op.windowing != "pieces":
        raise ValueError(
            "fused_merged_cg_solve requires an operator built with "
            f"windowing='pieces' (got {op.windowing!r}); other windowing "
            "modes store the gradient matrices un-permuted and would "
            "silently produce wrong results")
    if op.mask_mode != "iota":
        raise ValueError(
            "fused_merged_cg_solve is the single-device entry and requires "
            f"mask_mode='iota' (got {op.mask_mode!r}); slab-surgered "
            "operators must go through parallel.dist_fused")
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    dtype = b.dtype
    acc = jnp.float32 if dtype == jnp.bfloat16 else dtype

    b_eff = b
    if x0 is not None:
        if op.gmetric is None:
            # metric='onthefly' has no lattice-form pieces matvec; apply
            # the operator through the piece-resident kernel instead
            x0p = fk.to_piece_state((x0 * op.mask).astype(acc), p)
            h0p, _ = fk.piece_vmult(op, n_nodes_axis, x0p,
                                    fk.zplanes_init(x0p, p),
                                    interpret=interpret)
            ax0 = fk.from_piece_state(h0p, p, n_nodes_axis)
        else:
            from mf_data_locality_tpu.ops import laplace_pallas as lp

            ax0 = lp.vmult(op, x0.astype(dtype),
                           constrained_identity=False,
                           interpret=interpret)
        b_eff = b - ax0.astype(dtype)
    # enforce the boundary-zero RHS invariant the piece-state kernel relies
    # on (Dirichlet rows never re-masked in-loop); one setup-time pass
    b_eff = b_eff * op.mask.astype(b_eff.dtype)

    # blocked-diagonal preconditioner: one scalar per node shared across
    # components (diagonal_matrix_blocked.h:8-36) -> (1, Nz, Ny, Nx)
    prec_pieces = fk.to_piece_state(prec[:1].astype(acc), p)

    n_comp = b.shape[0]
    n_rep = n_comp if fold else 1
    p2 = p * p
    g0 = fk.to_piece_state(-b_eff.astype(acc), p)
    if compact:
        prec_pieces = prec_pieces[:, :, :p2]
        g0 = g0[:, :, :p2]
    if prec_dtype is not None:
        prec_pieces = prec_pieces.astype(prec_dtype)
    if fold:
        g0 = fk.fold_state(g0)
    # ||g0||^2 over owner rows (each global DoF exactly once; boundary rows
    # are zero by construction)
    res0 = jnp.sqrt(jnp.sum(g0[:, :, :p2].astype(acc) ** 2))
    tol = jnp.maximum(jnp.asarray(abs_tol, acc), rel_tol * res0)
    history = jnp.full((max_iter + 1,), jnp.nan, dtype=acc).at[0].set(res0)

    x_st = jnp.zeros(g0.shape, x_dtype if x_dtype is not None else acc)
    d_st = jnp.zeros(g0.shape, dtype)
    h_st = jnp.zeros(g0.shape, dtype)
    zg0 = fk.zplanes_init(g0, p)
    zd0 = jnp.zeros(zg0.shape, dtype)
    zh0 = jnp.zeros(zg0.shape, dtype)

    def cond(state):
        it, res = state[8], state[9]
        return (res > tol) & (it < max_iter)

    def iterate(x, g, d, h, zg, zd, zh, scal, with_x=True, seed=0):
        return fk.fused_cg_iteration(
            op, n_nodes_axis, x, g, d, h, zg, zd, zh, scal, prec_pieces,
            interpret=interpret, n_rep=n_rep, alias=alias,
            layers_per_step=layers_per_step, compact=compact,
            with_x=with_x, seed=seed, _ablate=_ablate)

    def body(state):
        x, g, d, h, zg, zd, zh, scal, it, _, hist = state
        it = it + 1
        # the whole per-iteration scalar recurrence runs inside the kernel;
        # scal' = (alpha, beta, c1, aob, parity, res2, alpha_old, beta_old)
        if x_skip:
            # non-pay iterations (c1 = aob = 0) leave x untouched: run the
            # x-less kernel variant and pass x around the call
            pay = (scal[2] != 0) | (scal[3] != 0)

            def pay_fn(args):
                return iterate(*args[:-1], seed=args[-1])

            def skip_fn(args):
                x_, g_, d_, h_, zg_, zd_, zh_, scal_, it_ = args
                g_, d_, h_, zg_, zd_, zh_, scal_ = iterate(
                    x_, g_, d_, h_, zg_, zd_, zh_, scal_, with_x=False,
                    seed=it_)
                return x_, g_, d_, h_, zg_, zd_, zh_, scal_

            x, g, d, h, zg, zd, zh, scal = jax.lax.cond(
                pay, pay_fn, skip_fn, (x, g, d, h, zg, zd, zh, scal, it))
        else:
            x, g, d, h, zg, zd, zh, scal = iterate(x, g, d, h, zg, zd, zh,
                                                   scal, seed=it)
        res = jnp.sqrt(jnp.maximum(scal[5], 0.0))
        return (x, g, d, h, zg, zd, zh, scal, it, res, hist.at[it].set(res))

    # initial scal: alpha = beta = c1 = aob = 0, parity(it=1) = 1
    scal0 = jnp.zeros((8,), acc).at[4].set(1.0)
    state = (x_st, g0, d_st, h_st, zg0, zd0, zh0, scal0,
             jnp.asarray(0, jnp.int32), res0, history)
    x, g, d, h, zg, zd, zh, scal, it, res, history = (
        jax.lax.while_loop(cond, body, state))
    if fold:
        x = fk.unfold_state(x, n_comp)
        g = fk.unfold_state(g, n_comp)
        d = fk.unfold_state(d, n_comp)

    x = fk.delayed_x_fixup(x.astype(acc), g, d, prec_pieces, scal, it)

    if compact:
        # reconstruct the duplicated rows (consistent, boundary-zero state)
        ncx = (n_nodes_axis[2] - 1) // p
        x = fk._expand_mm(x, p, ncx)
    x_lat = fk.from_piece_state(x, p, n_nodes_axis)
    if x0 is not None:
        x_lat = x_lat + x0.astype(acc)
    return SolveResult(x_lat, it, res, history, res <= tol)
