"""Distributed whole-iteration fused CG over a z-slab device mesh.

The multi-device form of :mod:`solvers.cg_fused` and the closest structural
analog of the reference's merged solver in MPI operation
(``solver_cg_optimized.h:190-302`` + ``poisson_operator.h:327-377``):

* Each device keeps the CG state x, g, d, h **permanently in corner-piece
  form** for its own z-cell layers.  Unlike the lattice slab vectors of
  :mod:`parallel.distributed`, piece-state planes partition z uniquely
  (no replicated shared plane), so local dot products need no ownership
  weights.
* Per iteration, communication is exactly:

  1. one downward ppermute of the neighbor's pre-update plane-0 state
     (g, d, h — the ghost exchange of ``MatrixFree::cell_loop``),
  2. one upward ppermute of the z-carry plane (the compress add-back),
  3. ONE psum of the 7 fused partial sums (the reference's single
     ``MPI_Allreduce`` of 7 doubles, ``poisson_operator.h:373-375``).

  Everything else — update4b, the operator sweep, piece consistency, the
  partial dots — runs inside the one fused Pallas kernel per device.
* The carry plane arrives after the local dots were accumulated, so the
  five h-dependent sums are corrected exactly with single-plane terms
  (delta algebra below) before the psum; the scalar recurrence
  (:func:`ops.cg_fused_kernel.scalar_recurrence`) then runs at XLA level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mf_data_locality_tpu.ops import cg_fused_kernel as fk
from mf_data_locality_tpu.parallel import distributed as dist
from mf_data_locality_tpu.solvers.cg import SolveResult

AXIS = dist.AXIS
AXIS_Y = dist.AXIS_Y
AXIS_X = dist.AXIS_X
AXIS_DCN = "dcn"  # outer (slice) axis of 2-level slice-of-slices meshes


def build_dist_fused(s: int, degree: int, n_devices: int | None = None,
                     dtype=jnp.float32, precision: str = "highest",
                     devices=None, box=None, metric: str = "precomputed"):
    """Build the z-slab problem for the fused solver (pieces windowing)."""
    return dist.build_distributed(
        s, degree, n_devices=n_devices, dtype=dtype, backend="pallas",
        precision=precision, windowing="pieces", devices=devices, box=box,
        metric=metric)


def build_dist_fused_2level(s: int, degree: int,
                            mesh_shape: tuple[int, int],
                            dtype=jnp.float32, precision: str = "highest",
                            devices=None, box=None,
                            metric: str = "precomputed"):
    """z-slab problem over a 2-level (slice x chip) = (DCN, ICI) mesh.

    Same decomposition as :func:`build_dist_fused` over
    ``n_slices * chips_per_slice`` devices, but the returned
    ``jax.sharding.Mesh`` has TWO named axes ``(AXIS_DCN, AXIS)`` laid out
    row-major, so slab k sits on slice k // chips_per_slice.  Run it with
    ``solve_fused(dp, mesh, axis=(AXIS_DCN, AXIS))``: interior slab halos
    ride ICI, the halos between slab chips_per_slice-1 and
    chips_per_slice cross the slice (DCN) boundary, and the single
    7-scalar psum per iteration reduces over both axes — the TPU analog
    of the reference's MPI ranks spanning multiple nodes
    (``common_code/benchmark.h:79``; SURVEY §5 "ICI within a slice, DCN
    across slices").  On real hardware the outer axis maps to a
    multi-slice ``jax.make_mesh`` axis over DCN; here any device list
    (including virtual CPU devices) exercises the identical program.
    """
    import numpy as np

    n_slices, chips = mesh_shape
    dp, mesh1 = build_dist_fused(s, degree, n_devices=n_slices * chips,
                                 dtype=dtype, precision=precision,
                                 devices=devices, box=box, metric=metric)
    devs = np.asarray(mesh1.devices).reshape(mesh_shape)
    return dp, Mesh(devs, (AXIS_DCN, AXIS))


def solve_fused(dp: dist.DistributedBP4, mesh: Mesh,
                x0: jax.Array | None = None,
                max_iter: int = 100, abs_tol: float = 1e-15,
                rel_tol: float = 1e-8, fold: bool = False,
                compact: bool = True, overlap: bool = False,
                interpret: bool | None = None,
                axis=AXIS) -> SolveResult:
    """Distributed fused-kernel merged-CG solve.

    ``x0``: optional (D, C, Pp+1, Ny, Nx) sharded start vector — handled by
    shifting to the residual equation (one distributed operator apply at
    entry, same residual history as the reference's ``g = Ax - b`` path).
    Returns ``x`` as (D, C, Pp+1, Ny, Nx) lattice slabs compatible with
    :func:`parallel.distributed.gather_global`.

    ``overlap=True`` splits each iteration's kernel into an interior call
    (z-layers 0..n-2, no halo dependency) and a boundary call (top layer,
    consumes the halo), so the downward halo ``ppermute`` is data-independent
    of the interior call and an async-collective backend can hide the ICI
    transfer behind it — the fused-kernel realization of the reference's
    pre/post-ghost range partitioning (``poisson_operator.h:339-364``).
    Bitwise-identical iteration algebra (same layer order, same carry
    chain); requires >= 2 local z-cell layers (falls back otherwise).

    ``axis``: the mesh axis (or TUPLE of axes, flattened row-major) the
    z slabs are sharded over.  A 2-level ``(AXIS_DCN, AXIS)`` tuple runs
    the same decomposition over a slice-of-slices mesh — slab neighbors
    that straddle a slice boundary exchange halos across the DCN axis and
    the 7-scalar psum spans both axes (the reference's arbitrary MPI rank
    counts across nodes, ``benchmark.h:79``; SURVEY §5 "ICI within a
    slice, DCN across slices").
    """
    n_dev = dp.n_devices

    ncz_g = dp.ncz_global

    def body(op_stack, inv_diag, b, x0_):
        op = dist._index0(op_stack)
        b_loc = b[0]
        if x0_ is not None:
            ax0 = dist.dist_vmult(op, x0_[0], n_dev=n_dev,
                                  backend="pallas",
                                  constrained_identity=False)
            b_loc = b_loc - ax0
        out = _solve_local(op, inv_diag[0], b_loc, n_dev, ncz_g,
                           max_iter=max_iter, abs_tol=abs_tol,
                           rel_tol=rel_tol, fold=fold, compact=compact,
                           overlap=overlap, interpret=interpret, axis=axis)
        if x0_ is not None:
            out = (out[0] + x0_,) + out[1:]
        return out

    if x0 is not None and axis != AXIS:
        # dist_vmult's halo exchange is wired to the 1-level AXIS name
        raise ValueError("x0 starts are not supported on a multi-level "
                         "axis; shift to the residual equation externally")
    if x0 is None:
        fn = jax.shard_map(lambda o, i, b: body(o, i, b, None), mesh=mesh,
                           in_specs=(P(axis),) * 3,
                           out_specs=(P(axis), P(), P(), P(), P()),
                           check_vma=False)
        args = (dp.op_stack, dp.inv_diag, dp.b)
    else:
        fn = jax.shard_map(body, mesh=mesh, in_specs=(P(axis),) * 4,
                           out_specs=(P(axis), P(), P(), P(), P()),
                           check_vma=False)
        args = (dp.op_stack, dp.inv_diag, dp.b, x0)
    x, it, res_norm, hist, conv = jax.jit(fn)(*args)
    return SolveResult(x, it, res_norm, hist, conv)


def _solve_local(op, inv_diag, b, n_dev, ncz_g, max_iter, abs_tol, rel_tol,
                 fold, compact, interpret, overlap=False, axis=AXIS):
    """Per-device solve body (inside shard_map).

    ``inv_diag``: (1, Pp+1, Ny, Nx); ``b``: (C, Pp+1, Ny, Nx) lattice slabs
    with replicated shared planes (only planes 0..Pp-1 are owned here —
    to_piece_state drops the top plane).  ``ncz_g``: REAL global z-layer
    count — slab layers at or past it are dummy padding, masked entirely.
    """
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    p2 = p * p
    n_comp = b.shape[0]
    n_rep = n_comp if fold else 1
    slab_axis = b.shape[1:]  # (Pp+1, Ny, Nx)
    ncz_loc = (slab_axis[0] - 1) // p
    dtype = b.dtype
    acc = jnp.float32 if dtype == jnp.bfloat16 else dtype

    didx = jax.lax.axis_index(axis) if n_dev > 1 else 0
    z0 = didx * ncz_loc

    down = [(d, d - 1) for d in range(1, n_dev)]  # receive from d+1
    up = [(d, d + 1) for d in range(n_dev - 1)]   # receive from d-1

    def recv_next(a):
        """Neighbor-above's plane 0 (zeros on the last device)."""
        if n_dev == 1:
            return jnp.zeros_like(a[:, :1])
        return jax.lax.ppermute(a[:, :1], axis, down)

    prec_pieces = fk.to_piece_state(inv_diag[:1].astype(acc), p)
    g0 = fk.to_piece_state(-b.astype(acc), p)
    if compact:
        prec_pieces = prec_pieces[:, :, :p2]
        g0 = g0[:, :, :p2]
    p_h = recv_next(prec_pieces)
    if fold:
        g0 = fk.fold_state(g0)
    res0 = jnp.sqrt(jax.lax.psum(
        jnp.sum(g0[:, :, :p2].astype(acc) ** 2), axis))
    tol = jnp.maximum(jnp.asarray(abs_tol, acc), rel_tol * res0)
    history = jnp.full((max_iter + 1,), jnp.nan, dtype=acc).at[0].set(res0)

    x_st = jnp.zeros_like(g0)
    d_st = jnp.zeros(g0.shape, dtype)
    h_st = jnp.zeros(g0.shape, dtype)
    zg0 = fk.zplanes_init(g0, p)
    zd0 = jnp.zeros(zg0.shape, dtype)
    zh0 = jnp.zeros(zg0.shape, dtype)

    P0 = prec_pieces[:, :1, :p2]
    if fold:
        P0 = jnp.concatenate([P0] * n_rep, axis=-1)

    def cond(state):
        it, res = state[8], state[9]
        return (res > tol) & (it < max_iter)

    do_overlap = overlap and ncz_loc >= 2

    def body(state):
        x, g, d, h, zg, zd, zh, scal, it, _, hist = state
        it = it + 1
        halo = (recv_next(g), recv_next(d), recv_next(h), p_h)
        if do_overlap:
            # interior z-layers first — no data dependency on the halo
            # ppermute above, so the ICI transfer can ride behind this
            # call (the reference's ghost-overlap slot,
            # poisson_operator.h:339-364); then the boundary layer
            # consumes the halo + the interior carry
            x, g, d, h, zg, zd, zh, s_i, carry_i = fk.fused_cg_iteration(
                op, slab_axis, x, g, d, h, zg, zd, zh, scal, prec_pieces,
                interpret=interpret, n_rep=n_rep, halo=None,
                z0=z0, ncz_global=ncz_g, recurrence=False, want_carry=True, seed=it,
                compact=compact, step_range=(0, ncz_loc - 1))
            x, g, d, h, zg, zd, zh, s_b, carry = fk.fused_cg_iteration(
                op, slab_axis, x, g, d, h, zg, zd, zh, scal, prec_pieces,
                interpret=interpret, n_rep=n_rep, halo=halo,
                z0=z0, ncz_global=ncz_g, recurrence=False, want_carry=True, seed=it,
                compact=compact, step_range=(ncz_loc - 1, ncz_loc),
                carry0=carry_i)
            s = s_i + s_b
        else:
            x, g, d, h, zg, zd, zh, s, carry = fk.fused_cg_iteration(
                op, slab_axis, x, g, d, h, zg, zd, zh, scal, prec_pieces,
                interpret=interpret, n_rep=n_rep, halo=halo,
                z0=z0, ncz_global=ncz_g, recurrence=False, want_carry=True, seed=it,
                compact=compact)
        # z-carry add-back (the compress ppermute) + exact dot corrections:
        # only the five h-dependent sums change, by single-plane deltas
        carry_in = (jnp.zeros_like(carry) if n_dev == 1
                    else jax.lax.ppermute(carry, axis, up))
        h0_old = h[:, :1].astype(acc)
        h0_new = (h0_old + carry_in).astype(dtype)
        h = jnp.concatenate([h0_new, h[:, 1:]], axis=1)
        delta = h0_new.astype(acc)[:, :, :p2] - h0_old[:, :, :p2]
        hsum = h0_new.astype(acc)[:, :, :p2] + h0_old[:, :, :p2]
        dm0 = d[:, :1, :p2].astype(acc)
        gm0 = g[:, :1, :p2]
        s = s.at[0].add(jnp.sum(dm0 * delta))          # d.h
        s = s.at[1].add(jnp.sum(hsum * delta))         # h.h
        s = s.at[2].add(jnp.sum(gm0 * delta))          # g.h
        s = s.at[4].add(jnp.sum(gm0 * (P0 * delta)))   # g.Ph
        s = s.at[5].add(jnp.sum(P0 * hsum * delta))    # h.Ph
        # the ONE allreduce per iteration (7 fused scalars)
        s = jax.lax.psum(s, axis)
        scal = jnp.stack(fk.scalar_recurrence(s, scal[0], scal[1], scal[4]))
        res = jnp.sqrt(jnp.maximum(scal[5], 0.0))
        return (x, g, d, h, zg, zd, zh, scal, it, res,
                hist.at[it].set(res))

    scal0 = jnp.zeros((8,), acc).at[4].set(1.0)
    state = (x_st, g0, d_st, h_st, zg0, zd0, zh0, scal0,
             jnp.asarray(0, jnp.int32), res0, history)
    x, g, d, h, zg, zd, zh, scal, it, res, history = (
        jax.lax.while_loop(cond, body, state))
    if fold:
        x = fk.unfold_state(x, n_comp)
        g = fk.unfold_state(g, n_comp)
        d = fk.unfold_state(d, n_comp)

    x = fk.delayed_x_fixup(x, g, d, prec_pieces, scal, it)

    if compact:
        ncx = (slab_axis[2] - 1) // p
        x = fk._expand_mm(x, p, ncx)
    x_lat = fk.from_piece_state(x, p, slab_axis)
    # restore the replicated-shared-plane slab convention (top plane =
    # neighbor-above's plane 0; zero on the last device = global top) so
    # the result is gather_global / dist_vmult compatible
    top = (jnp.zeros_like(x_lat[:, :1]) if n_dev == 1
           else jax.lax.ppermute(x_lat[:, :1], axis, down))
    x_lat = jnp.concatenate([x_lat[:, :-1], top], axis=1)
    return (x_lat[None], it, res, history, res <= tol)


# ---------------------------------------------------------------------------
# 2D (z, y) decomposition — the fused-solver analog of the reference's p4est
# partitioning of the full 3D domain (benchmark.h:79).  z stays the kernel's
# sweep/carry axis; y is split across the lane axis, with the duplicated
# rows of the NON-compact piece state acting as the y input halo and the
# kernel emitting local partial sums on the y-boundary copies
# (cg_fused_kernel._make_consistent y_split) that two lane-slice ppermutes
# complete after the kernel, with exact dot corrections.
# ---------------------------------------------------------------------------


def build_dist_fused_2d(s: int, degree: int, mesh_shape: tuple[int, int],
                        dtype=jnp.float32, precision: str = "highest",
                        devices=None, box=None,
                        metric: str = "precomputed"):
    """Build the 2D (z, y) problem for the fused solver."""
    return dist.build_distributed_2d(
        s, degree, mesh_shape, dtype=dtype, backend="pallas",
        precision=precision, windowing="pieces", devices=devices, box=box,
        metric=metric)


def solve_fused_2d(dp: dist.DistributedBP4_2D, mesh: Mesh,
                   max_iter: int = 100, abs_tol: float = 1e-15,
                   rel_tol: float = 1e-8,
                   interpret: bool | None = None) -> SolveResult:
    """Distributed fused-kernel merged-CG solve over a 2D (z, y) mesh.

    Per iteration the communication is: one downward z-halo ppermute
    (plane-0 g, d, h), one upward z-carry ppermute, TWO y lane-slice
    ppermutes (boundary-copy partial sums, both directions), and ONE
    7-scalar psum over both mesh axes — the reference's single allreduce
    (``poisson_operator.h:373-375``) with dimension-split ghost exchange.
    Uses the non-compact piece state (duplicated rows = y halo).
    """
    ncz_g, ncy_g = dp.nc_global[:2]

    def body(op_stack, inv_diag, b):
        op = jax.tree.map(lambda x_: x_[0, 0], op_stack)
        out = _solve_local_2d(op, inv_diag[0, 0], b[0, 0], dp.mesh_shape,
                              ncz_g, ncy_g, max_iter=max_iter,
                              abs_tol=abs_tol, rel_tol=rel_tol,
                              interpret=interpret)
        return out

    fn = jax.shard_map(body, mesh=mesh, in_specs=(P(AXIS, AXIS_Y),) * 3,
                       out_specs=(P(AXIS, AXIS_Y), P(), P(), P(), P()),
                       check_vma=False)
    x, it, res_norm, hist, conv = jax.jit(fn)(dp.op_stack, dp.inv_diag, dp.b)
    return SolveResult(x, it, res_norm, hist, conv)


def _solve_local_2d(op, inv_diag, b, mesh_shape, ncz_g, ncy_g,
                    max_iter, abs_tol, rel_tol, interpret):
    """Per-device 2D solve body (inside shard_map).

    ``inv_diag``: (1, Pz+1, Py+1, Nx); ``b``: (C, Pz+1, Py+1, Nx) with
    replicated shared z/y planes.  ``ncz_g`` / ``ncy_g``: REAL global cell
    counts (slab layers / rows past them are dummy padding, masked).
    """
    Dz, Dy = mesh_shape
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    p2 = p * p
    n_comp = b.shape[0]
    slab_axis = b.shape[1:]
    ncz_loc = (slab_axis[0] - 1) // p
    ncy_loc = (slab_axis[1] - 1) // p
    ncx = (slab_axis[2] - 1) // p
    B = ncy_loc * ncx
    dtype = b.dtype
    acc = jnp.float32 if dtype == jnp.bfloat16 else dtype
    y_split = Dy > 1

    zi = jax.lax.axis_index(AXIS) if Dz > 1 else 0
    yi = jax.lax.axis_index(AXIS_Y) if Dy > 1 else 0
    z0 = zi * ncz_loc
    y0 = yi * ncy_loc

    down_z = [(d, d - 1) for d in range(1, Dz)]
    up_z = [(d, d + 1) for d in range(Dz - 1)]
    down_y = [(d, d - 1) for d in range(1, Dy)]
    up_y = [(d, d + 1) for d in range(Dy - 1)]

    def recv_next_z(a):
        if Dz == 1:
            return jnp.zeros_like(a[:, :1])
        return jax.lax.ppermute(a[:, :1], AXIS, down_z)

    prec_pieces = fk.to_piece_state(inv_diag[:1].astype(acc), p)
    g0 = fk.to_piece_state(-b.astype(acc), p)
    p_h = recv_next_z(prec_pieces)

    res0 = jnp.sqrt(jax.lax.psum(
        jnp.sum(g0[:, :, :p2].astype(acc) ** 2), (AXIS, AXIS_Y)))
    tol = jnp.maximum(jnp.asarray(abs_tol, acc), rel_tol * res0)
    history = jnp.full((max_iter + 1,), jnp.nan, dtype=acc).at[0].set(res0)

    x_st = jnp.zeros_like(g0)
    d_st = jnp.zeros(g0.shape, dtype)
    h_st = jnp.zeros(g0.shape, dtype)
    zg0 = fk.zplanes_init(g0, p)
    zd0 = jnp.zeros(zg0.shape, dtype)
    zh0 = jnp.zeros(zg0.shape, dtype)

    P0 = prec_pieces[:, :1, :p2]
    # y-boundary copy row sets (cg_fused_kernel._consistency_rows y phase):
    # y0 = first-cell-row copies (mm ky=0 rows + the mp corner row), read at
    # lanes [:ncx]; yp = last-cell-row copies (pm rows + pp), lanes [-ncx:]
    y0_rows = jnp.asarray(list(range(p)) + [p2], jnp.int32)
    yp_rows = jnp.asarray([p2 + p + kx for kx in range(p)] + [p2 + 2 * p],
                          jnp.int32)

    def cond(state):
        it, res = state[8], state[9]
        return (res > tol) & (it < max_iter)

    def body(state):
        x, g, d, h, zg, zd, zh, scal, it, _, hist = state
        it = it + 1
        halo = (recv_next_z(g), recv_next_z(d), recv_next_z(h), p_h)
        x, g, d, h, zg, zd, zh, s, carry = fk.fused_cg_iteration(
            op, slab_axis, x, g, d, h, zg, zd, zh, scal, prec_pieces,
            interpret=interpret, halo=halo,
            z0=z0, ncz_global=ncz_g, y0=y0, ncy_global=ncy_g,
            y_split=y_split, recurrence=False, want_carry=True,
            seed=it, compact=False)

        # -- z-carry add-back + exact dot corrections (as the 1D path) ----
        carry_in = (jnp.zeros_like(carry) if Dz == 1
                    else jax.lax.ppermute(carry, AXIS, up_z))
        h0_old = h[:, :1].astype(acc)
        h0_new = (h0_old + carry_in).astype(dtype)
        h = jnp.concatenate([h0_new, h[:, 1:]], axis=1)
        delta = h0_new.astype(acc)[:, :, :p2] - h0_old[:, :, :p2]
        hsum = h0_new.astype(acc)[:, :, :p2] + h0_old[:, :, :p2]
        dm0 = d[:, :1, :p2].astype(acc)
        gm0 = g[:, :1, :p2]
        s = s.at[0].add(jnp.sum(dm0 * delta))
        s = s.at[1].add(jnp.sum(hsum * delta))
        s = s.at[2].add(jnp.sum(gm0 * delta))
        s = s.at[4].add(jnp.sum(gm0 * (P0 * delta)))
        s = s.at[5].add(jnp.sum(P0 * hsum * delta))

        # -- y boundary-copy completion (two lane-slice ppermutes) --------
        if y_split:
            send_down = h[:, :, y0_rows, :ncx]      # own y0 partials
            send_up = h[:, :, yp_rows, B - ncx:]    # own yp partials
            recv_above = jax.lax.ppermute(send_down, AXIS_Y, down_y)
            recv_below = jax.lax.ppermute(send_up, AXIS_Y, up_y)
            # complete the yp copies (no dot impact: pm/pp rows are not
            # owner rows)
            updp = (h[:, :, yp_rows, B - ncx:].astype(acc)
                    + recv_above.astype(acc)).astype(dtype)
            h = h.at[:, :, yp_rows, B - ncx:].set(updp)
            zh = zh.at[:, :, yp_rows, B - ncx:].set(updp[:, ::p])
            # complete the y0 copies; rows 0..p-1 are owner (mm) rows that
            # entered the kernel's dots as partials -> exact corrections
            old0 = h[:, :, y0_rows, :ncx].astype(acc)
            upd0 = (old0 + recv_below.astype(acc)).astype(dtype)
            h = h.at[:, :, y0_rows, :ncx].set(upd0)
            zh = zh.at[:, :, y0_rows, :ncx].set(upd0[:, ::p])
            delta_y = upd0.astype(acc)[:, :, :p] - old0[:, :, :p]
            hsum_y = upd0.astype(acc)[:, :, :p] + old0[:, :, :p]
            dmy = d[:, :, :p, :ncx].astype(acc)
            gmy = g[:, :, :p, :ncx]
            Pmy = prec_pieces[:, :, :p, :ncx]
            s = s.at[0].add(jnp.sum(dmy * delta_y))
            s = s.at[1].add(jnp.sum(hsum_y * delta_y))
            s = s.at[2].add(jnp.sum(gmy * delta_y))
            s = s.at[4].add(jnp.sum(gmy * (Pmy * delta_y)))
            s = s.at[5].add(jnp.sum(Pmy * hsum_y * delta_y))

        # the ONE allreduce per iteration (7 fused scalars, both axes)
        s = jax.lax.psum(s, (AXIS, AXIS_Y))
        scal = jnp.stack(fk.scalar_recurrence(s, scal[0], scal[1], scal[4]))
        res = jnp.sqrt(jnp.maximum(scal[5], 0.0))
        return (x, g, d, h, zg, zd, zh, scal, it, res,
                hist.at[it].set(res))

    scal0 = jnp.zeros((8,), acc).at[4].set(1.0)
    state = (x_st, g0, d_st, h_st, zg0, zd0, zh0, scal0,
             jnp.asarray(0, jnp.int32), res0, history)
    x, g, d, h, zg, zd, zh, scal, it, res, history = (
        jax.lax.while_loop(cond, body, state))

    x = fk.delayed_x_fixup(x, g, d, prec_pieces, scal, it)
    x_lat = fk.from_piece_state(x, p, slab_axis)
    # restore the replicated-shared-plane slab convention: the z top plane
    # comes from the z-neighbor above (zero at the global top).  The y/x
    # maxima rows are already correct: x's piece duplicates stay consistent
    # (x updates use only consistent inputs), so from_piece_state's pm/pp
    # assembly of the shared y row matches the neighbor's own row
    top = (jnp.zeros_like(x_lat[:, :1]) if Dz == 1
           else jax.lax.ppermute(x_lat[:, :1], AXIS, down_z))
    x_lat = jnp.concatenate([x_lat[:, :-1], top], axis=1)
    return (x_lat[None, None], it, res, history, res <= tol)


# ---------------------------------------------------------------------------
# 3D (z, y, x) decomposition — the fused solver over a full 3D device mesh
# (reference: p4est partitions the whole domain, benchmark.h:79; the merged
# solver's solve_3d has the lattice-slab analog).  z stays the kernel's
# sweep/carry axis; y splits lane ROW blocks (as the 2D path); x splits
# WITHIN each lane row: the kernel keeps x-boundary-copy partials
# (cg_fused_kernel._make_consistent x_split) and two STRIDED lane-slice
# ppermutes complete them after the kernel.  Completion order per iteration
# is z-carry, then x, then y — each exchange operates on the previous one's
# completed values, so 2-device edge and 4-/8-device corner node sums
# compose exactly by linearity (the fused-path analog of dimension-split
# halo exchanges).  Communication per iteration: one z-halo ppermute, one
# z-carry ppermute, two x lane-slice ppermutes, two y lane-slice ppermutes,
# and ONE 7-scalar psum over all three mesh axes.
# ---------------------------------------------------------------------------


def build_dist_fused_3d(s: int, degree: int,
                        mesh_shape: tuple[int, int, int],
                        dtype=jnp.float32, precision: str = "highest",
                        devices=None, box=None,
                        metric: str = "precomputed"):
    """Build the 3D (z, y, x) problem for the fused solver."""
    return dist.build_distributed_3d(
        s, degree, mesh_shape, dtype=dtype, backend="pallas",
        precision=precision, windowing="pieces", devices=devices, box=box,
        metric=metric)


def solve_fused_3d(dp: dist.DistributedBP4_3D, mesh: Mesh,
                   max_iter: int = 100, abs_tol: float = 1e-15,
                   rel_tol: float = 1e-8,
                   interpret: bool | None = None) -> SolveResult:
    """Distributed fused-kernel merged-CG solve over a 3D device mesh."""
    ncz_g, ncy_g, ncx_g = dp.nc_global

    def body(op_stack, inv_diag, b):
        op = jax.tree.map(lambda x_: x_[0, 0, 0], op_stack)
        out = _solve_local_3d(op, inv_diag[0, 0, 0], b[0, 0, 0],
                              dp.mesh_shape, ncz_g, ncy_g, ncx_g,
                              max_iter=max_iter, abs_tol=abs_tol,
                              rel_tol=rel_tol, interpret=interpret)
        return out

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(AXIS, AXIS_Y, AXIS_X),) * 3,
                       out_specs=(P(AXIS, AXIS_Y, AXIS_X),
                                  P(), P(), P(), P()),
                       check_vma=False)
    x, it, res_norm, hist, conv = jax.jit(fn)(dp.op_stack, dp.inv_diag, dp.b)
    return SolveResult(x, it, res_norm, hist, conv)


def _solve_local_3d(op, inv_diag, b, mesh_shape, ncz_g, ncy_g, ncx_g,
                    max_iter, abs_tol, rel_tol, interpret):
    """Per-device 3D solve body (inside shard_map).

    ``inv_diag``: (1, Pz+1, Py+1, Px+1); ``b``: (C, Pz+1, Py+1, Px+1) with
    replicated shared z/y/x planes.  Global cell counts ``nc*_g`` mark the
    Dirichlet faces and mask dummy padding cells.
    """
    Dz, Dy, Dx = mesh_shape
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    p2 = p * p
    slab_axis = b.shape[1:]
    ncz_loc = (slab_axis[0] - 1) // p
    ncy_loc = (slab_axis[1] - 1) // p
    ncx = (slab_axis[2] - 1) // p  # LOCAL x cell count (lane row width)
    B = ncy_loc * ncx
    dtype = b.dtype
    acc = jnp.float32 if dtype == jnp.bfloat16 else dtype
    y_split = Dy > 1
    x_split = Dx > 1

    zi = jax.lax.axis_index(AXIS) if Dz > 1 else 0
    yi = jax.lax.axis_index(AXIS_Y) if Dy > 1 else 0
    xi = jax.lax.axis_index(AXIS_X) if Dx > 1 else 0
    z0 = zi * ncz_loc
    y0 = yi * ncy_loc
    x0 = xi * ncx

    down_z = [(d, d - 1) for d in range(1, Dz)]
    up_z = [(d, d + 1) for d in range(Dz - 1)]
    down_y = [(d, d - 1) for d in range(1, Dy)]
    up_y = [(d, d + 1) for d in range(Dy - 1)]
    down_x = [(d, d - 1) for d in range(1, Dx)]
    up_x = [(d, d + 1) for d in range(Dx - 1)]

    def recv_next_z(a):
        if Dz == 1:
            return jnp.zeros_like(a[:, :1])
        return jax.lax.ppermute(a[:, :1], AXIS, down_z)

    prec_pieces = fk.to_piece_state(inv_diag[:1].astype(acc), p)
    g0 = fk.to_piece_state(-b.astype(acc), p)
    p_h = recv_next_z(prec_pieces)

    res0 = jnp.sqrt(jax.lax.psum(
        jnp.sum(g0[:, :, :p2].astype(acc) ** 2), (AXIS, AXIS_Y, AXIS_X)))
    tol = jnp.maximum(jnp.asarray(abs_tol, acc), rel_tol * res0)
    history = jnp.full((max_iter + 1,), jnp.nan, dtype=acc).at[0].set(res0)

    x_st = jnp.zeros_like(g0)
    d_st = jnp.zeros(g0.shape, dtype)
    h_st = jnp.zeros(g0.shape, dtype)
    zg0 = fk.zplanes_init(g0, p)
    zd0 = jnp.zeros(zg0.shape, dtype)
    zh0 = jnp.zeros(zg0.shape, dtype)

    P0 = prec_pieces[:, :1, :p2]
    # y boundary-copy row sets (as the 2D path)
    y0_rows = jnp.asarray(list(range(p)) + [p2], jnp.int32)
    yp_rows = jnp.asarray([p2 + p + kx for kx in range(p)] + [p2 + 2 * p],
                          jnp.int32)
    # x boundary-copy row sets (cg_fused_kernel._consistency_rows x phase):
    # x0 = first-column copies (mm kx=0 rows + the pm kx=0 row), lanes
    # cx == 0 (stride ncx); xp = last-column copies (mp rows + pp), lanes
    # cx == ncx-1.  Row k of each set holds a copy of the same boundary
    # node (ky = k), so the ppermuted partials pair positionally.
    x0_rows = jnp.asarray([ky * p for ky in range(p)] + [p2 + p], jnp.int32)
    xp_rows = jnp.asarray([p2 + ky for ky in range(p)] + [p2 + 2 * p],
                          jnp.int32)

    def cond(state):
        it, res = state[8], state[9]
        return (res > tol) & (it < max_iter)

    def body(state):
        x, g, d, h, zg, zd, zh, scal, it, _, hist = state
        it = it + 1
        halo = (recv_next_z(g), recv_next_z(d), recv_next_z(h), p_h)
        x, g, d, h, zg, zd, zh, s, carry = fk.fused_cg_iteration(
            op, slab_axis, x, g, d, h, zg, zd, zh, scal, prec_pieces,
            interpret=interpret, halo=halo,
            z0=z0, ncz_global=ncz_g, y0=y0, ncy_global=ncy_g,
            y_split=y_split, x0=x0, ncx_global=ncx_g, x_split=x_split,
            recurrence=False, want_carry=True, seed=it, compact=False)

        # -- z-carry add-back + exact dot corrections (as the 1D path) ----
        carry_in = (jnp.zeros_like(carry) if Dz == 1
                    else jax.lax.ppermute(carry, AXIS, up_z))
        h0_old = h[:, :1].astype(acc)
        h0_new = (h0_old + carry_in).astype(dtype)
        h = jnp.concatenate([h0_new, h[:, 1:]], axis=1)
        delta = h0_new.astype(acc)[:, :, :p2] - h0_old[:, :, :p2]
        hsum = h0_new.astype(acc)[:, :, :p2] + h0_old[:, :, :p2]
        dm0 = d[:, :1, :p2].astype(acc)
        gm0 = g[:, :1, :p2]
        s = s.at[0].add(jnp.sum(dm0 * delta))
        s = s.at[1].add(jnp.sum(hsum * delta))
        s = s.at[2].add(jnp.sum(gm0 * delta))
        s = s.at[4].add(jnp.sum(gm0 * (P0 * delta)))
        s = s.at[5].add(jnp.sum(P0 * hsum * delta))

        # -- x boundary-copy completion (two strided lane-slice ppermutes,
        #    BEFORE y so the y exchange sends x-complete values) ----------
        if x_split:
            send_left = h[:, :, x0_rows, 0::ncx]        # own x0 partials
            send_right = h[:, :, xp_rows, ncx - 1::ncx]  # own xp partials
            recv_right = jax.lax.ppermute(send_left, AXIS_X, down_x)
            recv_left = jax.lax.ppermute(send_right, AXIS_X, up_x)
            # complete the xp copies (mp/pp rows — not owner rows, no dot
            # impact)
            updp = (h[:, :, xp_rows, ncx - 1::ncx].astype(acc)
                    + recv_right.astype(acc)).astype(dtype)
            h = h.at[:, :, xp_rows, ncx - 1::ncx].set(updp)
            zh = zh.at[:, :, xp_rows, ncx - 1::ncx].set(updp[:, ::p])
            # complete the x0 copies; rows ky*p are owner (mm) rows whose
            # kernel dots used partials -> exact delta corrections
            old0 = h[:, :, x0_rows, 0::ncx].astype(acc)
            upd0 = (old0 + recv_left.astype(acc)).astype(dtype)
            h = h.at[:, :, x0_rows, 0::ncx].set(upd0)
            zh = zh.at[:, :, x0_rows, 0::ncx].set(upd0[:, ::p])
            delta_x = upd0.astype(acc)[:, :, :p] - old0[:, :, :p]
            hsum_x = upd0.astype(acc)[:, :, :p] + old0[:, :, :p]
            mm_x0 = x0_rows[:p]
            dmx = d[:, :, mm_x0, 0::ncx].astype(acc)
            gmx = g[:, :, mm_x0, 0::ncx]
            Pmx = prec_pieces[:, :, mm_x0, 0::ncx]
            s = s.at[0].add(jnp.sum(dmx * delta_x))
            s = s.at[1].add(jnp.sum(hsum_x * delta_x))
            s = s.at[2].add(jnp.sum(gmx * delta_x))
            s = s.at[4].add(jnp.sum(gmx * (Pmx * delta_x)))
            s = s.at[5].add(jnp.sum(Pmx * hsum_x * delta_x))

        # -- y boundary-copy completion (as the 2D path) ------------------
        if y_split:
            send_down = h[:, :, y0_rows, :ncx]
            send_up = h[:, :, yp_rows, B - ncx:]
            recv_above = jax.lax.ppermute(send_down, AXIS_Y, down_y)
            recv_below = jax.lax.ppermute(send_up, AXIS_Y, up_y)
            updp = (h[:, :, yp_rows, B - ncx:].astype(acc)
                    + recv_above.astype(acc)).astype(dtype)
            h = h.at[:, :, yp_rows, B - ncx:].set(updp)
            zh = zh.at[:, :, yp_rows, B - ncx:].set(updp[:, ::p])
            old0 = h[:, :, y0_rows, :ncx].astype(acc)
            upd0 = (old0 + recv_below.astype(acc)).astype(dtype)
            h = h.at[:, :, y0_rows, :ncx].set(upd0)
            zh = zh.at[:, :, y0_rows, :ncx].set(upd0[:, ::p])
            delta_y = upd0.astype(acc)[:, :, :p] - old0[:, :, :p]
            hsum_y = upd0.astype(acc)[:, :, :p] + old0[:, :, :p]
            dmy = d[:, :, :p, :ncx].astype(acc)
            gmy = g[:, :, :p, :ncx]
            Pmy = prec_pieces[:, :, :p, :ncx]
            s = s.at[0].add(jnp.sum(dmy * delta_y))
            s = s.at[1].add(jnp.sum(hsum_y * delta_y))
            s = s.at[2].add(jnp.sum(gmy * delta_y))
            s = s.at[4].add(jnp.sum(gmy * (Pmy * delta_y)))
            s = s.at[5].add(jnp.sum(Pmy * hsum_y * delta_y))

        # the ONE allreduce per iteration (7 fused scalars, all three axes)
        s = jax.lax.psum(s, (AXIS, AXIS_Y, AXIS_X))
        scal = jnp.stack(fk.scalar_recurrence(s, scal[0], scal[1], scal[4]))
        res = jnp.sqrt(jnp.maximum(scal[5], 0.0))
        return (x, g, d, h, zg, zd, zh, scal, it, res,
                hist.at[it].set(res))

    scal0 = jnp.zeros((8,), acc).at[4].set(1.0)
    state = (x_st, g0, d_st, h_st, zg0, zd0, zh0, scal0,
             jnp.asarray(0, jnp.int32), res0, history)
    x, g, d, h, zg, zd, zh, scal, it, res, history = (
        jax.lax.while_loop(cond, body, state))

    x = fk.delayed_x_fixup(x, g, d, prec_pieces, scal, it)
    x_lat = fk.from_piece_state(x, p, slab_axis)
    # z top plane from the neighbor above (zero at the global top); the
    # y/x maxima rows are already correct (x's piece duplicates stay
    # consistent, as in the 2D path)
    top = (jnp.zeros_like(x_lat[:, :1]) if Dz == 1
           else jax.lax.ppermute(x_lat[:, :1], AXIS, down_z))
    x_lat = jnp.concatenate([x_lat[:, :-1], top], axis=1)
    return (x_lat[None, None, None], it, res, history, res <= tol)
