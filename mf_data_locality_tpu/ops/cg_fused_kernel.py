"""Whole-iteration fused CG Pallas kernel with piece-resident state.

This is the TPU-native analog of the reference's single-sweep merged CG
iteration: the reference threads the vector updates (``do_cg_update4b``) and
the seven fused dot products (``do_cg_update3b``) through the matrix-free
operator's cell loop as pre/post range callbacks
(``poisson_operator.h:327-377``, ``solver_cg_optimized.h:65-161``), so every
solution vector is touched exactly once per iteration.  Here the same
single-pass property is achieved by keeping the CG state vectors x, g, d, h
**permanently in corner-piece form** — the operator's native windowed layout
(see :func:`laplace_pallas._to_piece_forms`) — and running one z-sweeping
Pallas kernel per iteration that performs, per cell layer:

  1. ``update4b``: x' = x + c1 d + aob P g;  g' = g + alpha h;
     d' = beta d - P g'   (the delayed-x form, predicated via c1/aob);
  2. the BP4 operator apply on d' (dense MXU contractions + precomputed
     metric), with the Dirichlet mask computed from iota;
  3. in-VMEM y/x piece-consistency (lane rolls) and the z carry-plane
     overlap-add, so the output h is a *consistent* piece-form vector;
  4. the seven partial dot products of ``update3b``, accumulated in a VMEM
     scratch across layers.

Why no multiplicity weights for the dots: every non-boundary lattice node
has exactly one representation among the mm-piece rows (r < p^2) — nodes
with y or x a multiple of p appear there with ky = 0 / kx = 0 — so reducing
over mm rows counts each global DoF exactly once.  Boundary nodes are
masked to zero and contribute nothing.

Why state vectors need no top-plane storage: the global top z-plane
(z = Nz-1) is entirely Dirichlet-constrained, so x, g, d, h vanish there
for the whole solve; the kernel substitutes zeros for the +1 plane of the
last layer and the final lattice assembly appends a zero plane.

Per-iteration HBM traffic: read x, g, d, h, P (+ (p+1)/p re-read of the
overlap plane) + geometry; write x', g', d', h — ~9 piece-words/DoF +
geometry, the reference's single-sweep traffic model (BASELINE.md), with
zero windowing-wrapper traffic.  Geometry comes in two kernel-level
modes (``laplace_pallas.make_pallas_operator(metric=...)``): the streamed
precomputed 6 q^3-word metric, or the reference's own on-the-fly rebuild
from 24 trilinear coefficients/cell (:func:`_metric_onthefly` — measured
FASTER on even-q degrees and 27-54x lighter in memory,
tools/PROBE_ONTHEFLY.txt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mf_data_locality_tpu.ops.laplace_pallas import (
    PallasOperatorData,
    _dirichlet_mask_pieces,
    _mm,
    _to_piece_forms,
    _from_piece_forms,
    _z_matrices,
    gmetric_twostage,
)


def _prestack(m: jax.Array, precision: str, split_rows=None):
    """Precision-prestacked matrix operands: (m_fwd, m_bwd, nsplit).

    The split3/split2m/bf16 rungs decompose each MXU product into bf16
    passes.  Rounding + K-stacking the STATIC matrices inside the kernel
    repeats that conversion/concat on every grid step for every component
    (~96 calls/iteration at p=4 — pure VPU/register traffic).  Stacking
    once OUTSIDE the pallas_call (XLA hoists it as loop-invariant; the
    benchmark passes host-constant operators anyway) leaves only the
    per-apply STREAM split in-kernel.

    ``m_fwd``: K-stacked along axis 1 for the forward contraction
    (pairs with stream parts [bh, bh, bl] for split3 / [bh, bl] for
    split2m — the exact product set and accumulation order of
    :func:`laplace_pallas._mm`).  ``m_bwd``: stacked along axis 0 for the
    transpose contraction (``dims=((0,),(0,))``).  ``split_rows``: row
    boundaries (e.g. the twostage xy/z split) replicated per K-segment in
    ``m_bwd`` so the kernel can row-slice each segment.
    ``nsplit = 0`` means no prestacking (highest/f64 fallback to _mm).
    """
    if precision in ("bf16", "bf16sr"):
        mh = m.astype(jnp.bfloat16)
        return mh, mh, 1
    if precision == "split2m":
        mh = m.astype(jnp.bfloat16)
        segs = [mh, mh]
    elif precision == "split3":
        mh = m.astype(jnp.bfloat16)
        ml = (m - mh.astype(m.dtype)).astype(jnp.bfloat16)
        segs = [mh, ml, mh]
    else:
        return m, m, 0
    return (jnp.concatenate(segs, axis=1),
            jnp.concatenate(segs, axis=0), len(segs))


def _factor_setup(op: PallasOperatorData, p: int, q: int, ncz: int, B: int):
    """Per-factorization kernel operands:
    (m_fwd, m_bwd, nsplit, gmetric4d, zmats).

    dense: the (3q^3, p1^3) matrices + (6q^3, ncz, 1, B) metric — or, for
    an operator built with ``metric='onthefly'`` (``gmetric is None``),
    the (24, ncz, 1, B) trilinear-coefficient rows from which the kernel
    rebuilds the metric per q-point (:func:`_metric_onthefly`).
    twostage: the (3q^2, p1^2) 2D matrices + (6q^2, ncz, 1, q*B) metric
    (qz in lanes) + the z factors as nested float lists (compile-time
    scalars for the VPU plane recurrences).  Matrices arrive
    precision-prestacked (see :func:`_prestack`).
    """
    if op.factor == "twostage":
        if op.mats2d is None:
            raise ValueError(
                "factor='twostage' requires an operator built with "
                "windowing='pieces' (mats2d missing)")
        Sz, Dz = _z_matrices(p, q)
        zmats = ([[float(x) for x in row] for row in Sz],
                 [[float(x) for x in row] for row in Dz])
        if op.gmetric is None:
            # metric='onthefly', twostage layout: pad the 2D-stage q^2 row
            # blocks to a sublane multiple and ship per-qz Jacobian-eval
            # blocks [P_du; P_dv; P_dw; w3]_{qz} (each q^2-block padded) —
            # the kernel rebuilds each qz lane group and concatenates to
            # the (q2p, q*B) twostage metric layout.
            q2, q2p = q * q, -(-q * q // 8) * 8
            mf, mb, ns = _prestack(_pad_row_blocks(op.mats2d, 3, q2, q2p),
                                   op.precision)
            pdsz = op.pds.reshape(3, q, q2, 8)
            w3z = op.w3.reshape(q, q2, 1)
            blocks = []
            for qz in range(q):
                blk = jnp.concatenate(
                    [pdsz[0, qz], pdsz[1, qz], pdsz[2, qz],
                     jnp.pad(w3z[qz], ((0, 0), (0, 7)))], axis=0)
                blocks.append(_pad_row_blocks(blk, 4, q2, q2p))
            geo = jnp.concatenate(blocks, axis=0)  # (q * 4 * q2p, 8)
            return (mf, mb, ns, op.coeffs.reshape(24, ncz, 1, B), zmats,
                    geo)
        mf, mb, ns = _prestack(op.mats2d, op.precision)
        return (mf, mb, ns, gmetric_twostage(op.gmetric, q, ncz, B), zmats,
                None)
    if op.gmetric is None:
        # metric='onthefly': ship the 24 coefficient rows per cell plus one
        # static (4 q3p, 8) operand [P_du; P_dv; P_dw; w3-in-col-0] for the
        # in-kernel Jacobian rebuild (:func:`_metric_onthefly`).  Odd q:
        # every q^3 row block (matrices included) is padded to a sublane
        # multiple with exact no-op rows — misaligned (q^3, B)
        # intermediates measured 2x slower at p=3.
        q3, q3p = q ** 3, -(-q ** 3 // 8) * 8
        mf, mb, ns = _prestack(_pad_row_blocks(op.mats, 3, q3, q3p),
                               op.precision)
        geo = jnp.concatenate(
            [_pad_row_blocks(op.pds, 3, q3, q3p),
             _pad_row_blocks(jnp.pad(op.w3, ((0, 0), (0, 7))), 1, q3, q3p)],
            axis=0)
        return mf, mb, ns, op.coeffs.reshape(24, ncz, 1, B), None, geo
    mf, mb, ns = _prestack(op.mats, op.precision)
    return (mf, mb, ns, op.gmetric.reshape(6 * q ** 3, ncz, 1, B), None,
            None)


def _pad_row_blocks(m, nblocks: int, rows: int, rows_p: int):
    """Pad each of ``nblocks`` consecutive ``rows``-row blocks of ``m`` to
    ``rows_p`` rows with zeros (exact no-op q-points: zero forward rows,
    zero backward K-rows, zero metric entries via the guarded w3/det)."""
    if rows_p == rows:
        return m
    parts = m.reshape(nblocks, rows, m.shape[-1])
    z = jnp.zeros((nblocks, rows_p - rows, m.shape[-1]), m.dtype)
    return jnp.concatenate([parts, z], axis=1).reshape(
        nblocks * rows_p, m.shape[-1])


def _metric_onthefly(c24, geo, ablate=()):
    """Rebuild the 6 metric entries from the 24 trilinear coefficients.

    ``c24``: (24, Bc) geometry rows of one z-cell layer (row d * 8 + k =
    monomial coefficient k of coordinate d — ``op.coeffs`` kernel layout).
    ``geo``: (4 q^3, 8) static rows [P_du; P_dv; P_dw; w3] — the monomial
    derivative matrices (``op.pds``) with the tensor quadrature weights
    packed in column 0 of the last block.  Returns (6 q^3, Bc) in the
    precomputed ``gmetric`` stream's entry-major row order (00, 01, 02,
    11, 12, 22), so the caller's contraction code is unchanged.

    This is the in-kernel realization of the reference's on-the-fly
    geometry (``poisson_operator.h:470-520``: per-cell mapping
    coefficients -> Jacobian -> ``do_invert`` per q-point in registers,
    built from ``cell_quadratic_coefficients``, ``poisson_operator.h:
    108-180``): HBM geometry traffic drops from 6 q^3 to 24 words/cell
    (54x at p=4) for an MXU Jacobian evaluation (K = 8) plus ~70 VPU ops
    per q-point-lane (invert + metric assembly).  The Jacobian matmul
    runs at f32 class (explicit hi/lo split — Mosaic would otherwise
    round the geometry to one bf16 pass) except in f64 interpret mode,
    which keeps exact accumulation.
    """
    q3 = geo.shape[0] // 4
    pds, w3 = geo[: 3 * q3], geo[3 * q3:, 0:1]
    if "rebuild" in ablate:
        # timing ablation (wrong values, same operand streams): elide the
        # WHOLE rebuild — J matmul + cofactor/det + assembly — keeping the
        # 24-row coefficient stream live
        row = jnp.broadcast_to(c24[:1], (q3, c24.shape[-1])) + 0.0
        return jnp.concatenate([row] * 6, axis=0)
    jprec = "highest" if c24.dtype == jnp.float64 else "split3"
    # J[d][e] = dx_d/d(uvw)_e at rows [e q^3:(e+1) q^3] (geometry.jacobian)
    J = [_mm(pds, c24[8 * d: 8 * (d + 1)], jprec) for d in range(3)]
    if "invert" in ablate:
        # timing ablation: keep the MXU Jacobian evaluation, elide the VPU
        # cofactor/determinant/metric-assembly chain (6 rows read straight
        # from J entries) — isolates the invert+assembly cost from the
        # J-eval cost
        return jnp.concatenate(
            [J[0][:q3], J[0][q3:2 * q3], J[0][2 * q3:],
             J[1][:q3], J[1][q3:2 * q3], J[1][2 * q3:]], axis=0) * w3[0, 0]
    if "jtj" in ablate:
        # candidate form (VERDICT r5 item 1 microbench): G = w adj(C)
        # / sqrt(det C) with C = J^T J symmetric — mathematically identical
        # (J^{-1} J^{-T} = C^{-1}, det C = det(J)^2 with det(J) > 0 for an
        # orientation-preserving map), ~12% fewer VPU ops than the
        # adjugate-of-J chain (C 30 + adj(C) 18 + det 5 + scale 3 + rows 6
        # = 62 vs 27 + 5 + 2 + 36 = 70) and an rsqrt instead of a divide
        Je = [(Jd[:q3], Jd[q3: 2 * q3], Jd[2 * q3:]) for Jd in J]
        C = {}
        for e_ in range(3):
            for f_ in range(e_, 3):
                C[(e_, f_)] = (Je[0][e_] * Je[0][f_] + Je[1][e_] * Je[1][f_]
                               + Je[2][e_] * Je[2][f_])
        c00, c01, c02 = C[(0, 0)], C[(0, 1)], C[(0, 2)]
        c11, c12, c22 = C[(1, 1)], C[(1, 2)], C[(2, 2)]
        adjC = [c11 * c22 - c12 * c12, c02 * c12 - c01 * c22,
                c01 * c12 - c02 * c11, c00 * c22 - c02 * c02,
                c01 * c02 - c00 * c12, c00 * c11 - c01 * c01]
        detC = c00 * adjC[0] + c01 * adjC[1] + c02 * adjC[2]
        # padding rows carry detC = 0, w3 = 0 and must come out exactly 0
        scale = w3.astype(detC.dtype) * jax.lax.rsqrt(
            jnp.where(detC <= 0.0, 1.0, detC))
        return jnp.concatenate([r * scale for r in adjC], axis=0)
    (a, b, c_), (d, e, f), (g, h, i) = (
        (Jd[:q3], Jd[q3: 2 * q3], Jd[2 * q3:]) for Jd in J)
    # adj = det * J^{-1}, cofactor layout of geometry.invert_3x3
    adj = [[e * i - f * h, c_ * h - b * i, b * f - c_ * e],
           [f * g - d * i, a * i - c_ * g, c_ * d - a * f],
           [d * h - e * g, b * g - a * h, a * e - b * d]]
    det = a * adj[0][0] + b * adj[1][0] + c_ * adj[2][0]
    # G[e,f] = det w (J^{-1} J^{-T})[e,f] = (w / det) sum_d adj_ed adj_fd
    # (division guarded: odd-q row padding carries det = 0, w3 = 0 rows
    # that must come out as exactly 0, not NaN)
    if "arecip" in ablate:
        # candidate form: approximate-reciprocal scale (the divide is the
        # only multi-op scalar in the chain); ~2^-8-class perturbation of
        # G — needs a convergence-class check before any promotion
        scale = w3.astype(det.dtype) * pl.reciprocal(
            jnp.where(det == 0.0, 1.0, det), approx=True)
    else:
        scale = w3.astype(det.dtype) / jnp.where(det == 0.0, 1.0, det)
    rows = []
    for e_ in range(3):
        for f_ in range(e_, 3):
            rows.append((adj[e_][0] * adj[f_][0] + adj[e_][1] * adj[f_][1]
                         + adj[e_][2] * adj[f_][2]) * scale)
    return jnp.concatenate(rows, axis=0)


def _effective_ablate(op, ablate):
    """Fold the operator's cofactor-form choice into the kernel arm set.

    ``op.cofactor == "jtj"`` selects the adj(J^T J) rsqrt(det) rebuild
    chain (mathematically identical to the adjugate-of-J form; measured
    faster at the mid/high twostage degrees — tools/PROBE_R5_COFACTOR.txt,
    PROBE_R5_JTJ2.txt).  An explicit cofactor/rebuild arm already in
    ``ablate`` wins (probe scripts force "adjj" via the empty base arm by
    building the operator with cofactor="adjj")."""
    if (getattr(op, "cofactor", "adjj") == "jtj"
            and not ({"jtj", "arecip", "invert", "rebuild"} & set(ablate))):
        return tuple(ablate) + ("jtj",)
    return tuple(ablate)


def _stream_parts(b: jax.Array, nsplit: int):
    """Per-apply stream split matching :func:`_prestack`'s segment order.

    Returns (b_stacked, n_segments_used) — fewer segments when the stream
    is already bf16 (the documented degraded combinations)."""
    bf = jnp.bfloat16
    if nsplit == 1:
        return b.astype(bf), 1
    if b.dtype == bf:
        # degraded: split2m -> one product; split3 -> mh.b + ml.b
        if nsplit == 2:
            return b, 1
        return jnp.concatenate([b, b], axis=0), 2
    bh = b.astype(bf)
    if nsplit == 2:
        bl = (b - bh.astype(b.dtype)).astype(bf)
        return jnp.concatenate([bh, bl], axis=0), 2
    bl = (b - bh.astype(b.dtype)).astype(bf)
    return jnp.concatenate([bh, bh, bl], axis=0), 3


_DN_F = (((1,), (0,)), ((), ()))
_DN_T = (((0,), (0,)), ((), ()))


def _sr_bf16(x):
    """Stochastically round an f32 stream to bf16 (in-kernel only).

    The ``bf16sr`` rung's stream cast: zero-mean per-apply rounding noise
    instead of round-to-nearest bias, so the single-pass perturbed
    operator behaves like an unbiased inexact matvec inside CG.  The PRNG
    must have been seeded once by the kernel (see ``_fused_cg_kernel``).

    Measured on-chip (tools/R3_BATCH8.txt): SR is speed-identical to RTN
    (~226 us/it at p=4 s=13) and convergence-identical too — the 1e-5
    attainable-residual stall of single-pass bf16 streams is set by the
    4e-3 noise AMPLITUDE, not its bias.  Kept as a documented variant;
    the production f32-class rung remains split2m.
    """
    if x.dtype == jnp.bfloat16:
        return x
    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    return pltpu.stochastic_round(x, bits, target_dtype=jnp.bfloat16)


def _mm_pre(m_f, m_b, nsplit, precision, b, back=False, rows=None):
    """One logical matmul of the (optionally row-sliced) matrix with the
    stream ``b``, using prestacked operands when ``nsplit > 0``.

    ``rows=(r0, r1)``: contract only matrix rows r0:r1 (the twostage xy/z
    split); for the backward form the slice is applied per K-segment of
    ``m_bwd``.  Falls back to :func:`laplace_pallas._mm` for the
    highest-precision rung (nsplit == 0).
    """
    if nsplit == 0:
        m = m_f if rows is None else m_f[rows[0]:rows[1]]
        return _mm(m, b, precision, dims=_DN_T if back else None)
    k = b.shape[0]
    b2, used = _stream_parts(b, nsplit)
    if not back:
        m = m_f if rows is None else m_f[rows[0]:rows[1]]
        if used < nsplit:
            m = m[:, : used * m.shape[1] // nsplit]
        return jax.lax.dot_general(m, b2, _DN_F,
                                   preferred_element_type=jnp.float32)
    # backward: m_bwd is [seg_0; seg_1; ...] along axis 0; row-slice each
    # used segment, then stack to pair with the stream segments
    rtot = m_b.shape[0] // nsplit
    r0, r1 = rows if rows is not None else (0, rtot)
    segs = [m_b[i * rtot + r0: i * rtot + r1] for i in range(used)]
    m = segs[0] if used == 1 else jnp.concatenate(segs, axis=0)
    return jax.lax.dot_general(m, b2, _DN_T,
                               preferred_element_type=jnp.float32)


def to_piece_state(u: jax.Array, p: int) -> jax.Array:
    """(C, Nz, Ny, Nx) lattice -> (C, ncz*p, p1^2, B) piece-state.

    Concatenates the four corner pieces along the row axis in the kernel's
    row order (mm, mp, pm, pp; see ``_piece_perm``) and drops the global top
    z-plane (all Dirichlet -> zero by invariant).
    """
    mm, mp_, pm, pp = _to_piece_forms(u, p)
    full = jnp.concatenate([mm, mp_, pm, pp], axis=2)  # (C, Nz, R, B)
    nz = full.shape[1]
    return full[:, : nz - 1]


def from_piece_state(v: jax.Array, p: int, n_nodes_axis) -> jax.Array:
    """(C, ncz*p, p1^2, B) consistent piece-state -> (C, Nz, Ny, Nx) lattice.

    The piece-state is consistent (duplicate copies equal), so assembly
    reads the owner copies instead of overlap-adding: the mm rows cover all
    nodes except the y/x maxima, which are taken from the mp/pm/pp rows of
    the last cell row/column; the top z-plane is zero by invariant.
    """
    nz, ny, nx = n_nodes_axis
    ncy, ncx = (ny - 1) // p, (nx - 1) // p
    c = v.shape[0]
    nzm = v.shape[1]
    p2 = p * p
    # mm rows -> nodes (cy*p+ky, cx*p+kx), ky, kx < p
    mm = v[:, :, :p2].reshape(c, nzm, p, p, ncy, ncx)
    mm = mm.transpose(0, 1, 4, 2, 5, 3).reshape(c, nzm, ncy * p, ncx * p)
    # mp rows, last cell column -> nodes (cy*p+ky, ncx*p)
    mp_ = v[:, :, p2:p2 + p].reshape(c, nzm, p, ncy, ncx)[..., ncx - 1]
    mp_ = mp_.transpose(0, 1, 3, 2).reshape(c, nzm, ncy * p, 1)
    top_rows = jnp.concatenate([mm, mp_], axis=3)  # (C, nzm, ncy*p, Nx)
    # pm rows, last cell row -> nodes (ncy*p, cx*p+kx)
    pm = v[:, :, p2 + p:p2 + 2 * p].reshape(c, nzm, p, ncy, ncx)[:, :, :, ncy - 1]
    pm = pm.transpose(0, 1, 3, 2).reshape(c, nzm, 1, ncx * p)
    pp = v[:, :, p2 + 2 * p:].reshape(c, nzm, ncy, ncx)[:, :, ncy - 1:, ncx - 1:]
    bot = jnp.concatenate([pm, pp], axis=3)  # (C, nzm, 1, Nx)
    lat = jnp.concatenate([top_rows, bot], axis=2)  # (C, nzm, Ny, Nx)
    topz = jnp.zeros((c, 1, ny, nx), lat.dtype)
    return jnp.concatenate([lat, topz], axis=1)


def assemble_from_partial(vm: jax.Array, p: int, n_nodes_axis) -> jax.Array:
    """Overlap-add assembly of a NON-consistent piece-state (testing aid)."""
    nz, _, _ = n_nodes_axis
    p2 = p * p
    c = vm.shape[0]
    B = vm.shape[3]
    parts = (vm[:, :, :p2], vm[:, :, p2:p2 + p],
             vm[:, :, p2 + p:p2 + 2 * p], vm[:, :, p2 + 2 * p:])
    vtop = jnp.zeros((c, 1, (p + 1) * (p + 1), B), vm.dtype)
    return _from_piece_forms(parts, vtop, p, n_nodes_axis)


def fold_state(v: jax.Array) -> jax.Array:
    """(C, nzm, R, B) piece-state -> (1, nzm, R, C*B) lane-folded state.

    Folding the component axis into the lane axis lets the kernel issue ONE
    wide MXU contraction of N = C*B columns instead of C narrow ones.  Lane
    order is component-major: column c*B + (cy*ncx + cx).
    """
    c, nzm, r, b = v.shape
    return v.transpose(1, 2, 0, 3).reshape(1, nzm, r, c * b)


def unfold_state(v: jax.Array, n_comp: int) -> jax.Array:
    """Inverse of :func:`fold_state`."""
    _, nzm, r, cb = v.shape
    b = cb // n_comp
    return v.reshape(nzm, r, n_comp, b).transpose(2, 0, 1, 3)


def _consistency_rows(p: int):
    """Static row-index lists for the y/x piece-consistency phases."""
    p2 = p * p
    x0 = [ky * p for ky in range(p)] + [p2 + p]          # kx = 0 copies
    xp = [p2 + ky for ky in range(p)] + [p2 + 2 * p]     # kx = p copies
    y0 = [kx for kx in range(p)] + [p2]                  # ky = 0 copies
    yp = [p2 + p + kx for kx in range(p)] + [p2 + 2 * p]  # ky = p copies
    return x0, xp, y0, yp


def _make_consistent(v: jax.Array, p: int, ncx: int,
                     y_split: bool = False,
                     x_split: bool = False) -> jax.Array:
    """Sum duplicate piece copies of shared y/x nodes and redistribute.

    v: (C, P1z, R, B) masked partial output.  The kx = p copy of cell
    (cy, cx) and the kx = 0 copy of cell (cy, cx+1) describe the same node
    x = (cx+1)p; lane-rolling by 1 aligns them (columns are cy*ncx + cx).
    Roll wraparound crosses cell rows only at global box faces, where the
    Dirichlet mask has zeroed both copies — so no edge handling is needed.
    The y phase is identical with roll distance ncx, run on the x-consistent
    values so 4-way corner copies receive the full sum (dimension splitting,
    like a 2D halo exchange).

    ``y_split``: the local cell block is a y-slab of the global box (2D
    (z, y) decomposition), so the y-phase roll wraparound crosses a DEVICE
    boundary instead of the masked global face.  The cross-boundary pairing
    is deferred to the solver (a lane-slice ppermute after the kernel): the
    last cell row's yp copies keep their LOCAL partial sum (the wrapped
    import is masked off) and the first cell row's y0 copies keep their own
    partial (instead of the wrapped redistribute) — the fused-path analog
    of the ghost-face compress in ``MatrixFree::cell_loop``.

    ``x_split``: the block is additionally an x-slab (3D decomposition),
    so the x-phase roll's row-crossing lanes (lane % ncx == ncx-1 / == 0,
    which for a full box pair masked global-face copies) now sit at
    DEVICE x-boundaries: last-column xp copies and first-column x0 copies
    keep their local partials, completed by the solver's strided
    lane-slice ppermutes (``dist_fused._solve_local_3d``).
    """
    R = v.shape[2]
    B = v.shape[3]
    x0, xp, y0, yp = _consistency_rows(p)
    rows = [v[:, :, r:r + 1, :] for r in range(R)]

    for src0, srcp, dist in ((x0, xp, 1), (y0, yp, ncx)):
        r0 = jnp.concatenate([rows[r] for r in src0], axis=2)
        rp = jnp.concatenate([rows[r] for r in srcp], axis=2)
        rolled = jnp.roll(r0, -dist, axis=3)
        if y_split and dist == ncx:
            lan = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 3)
            rolled = jnp.where(lan >= B - ncx, 0.0, rolled)
        if x_split and dist == 1:
            lan = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 3)
            rolled = jnp.where(lan % ncx == ncx - 1, 0.0, rolled)
        s = rp + rolled
        s0 = jnp.roll(s, dist, axis=3)
        if y_split and dist == ncx:
            lan0 = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 3)
            s0 = jnp.where(lan0 < ncx, r0, s0)
        if x_split and dist == 1:
            lan0 = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 3)
            s0 = jnp.where(lan0 % ncx == 0, r0, s0)
        for k, r in enumerate(srcp):
            rows[r] = s[:, :, k:k + 1, :]
        for k, r in enumerate(src0):
            rows[r] = s0[:, :, k:k + 1, :]
    return jnp.concatenate(rows, axis=2)


def _idx_mm(ky: int, kx: int, p: int) -> int:
    """Row index of node (ky, kx), ky, kx < p, in the mm piece."""
    return ky * p + kx


def _expand_mm(u: jax.Array, p: int, ncx: int) -> jax.Array:
    """(…, p^2, B) mm-only piece values -> (…, p1^2, B) full piece rows.

    The duplicated rows are reconstructed by lane-rolls: the kx = p copy
    of cell (cy, cx) equals the kx = 0 copy of cell (cy, cx+1) (roll -1),
    etc.  No masking is needed: every roll wraparound imports the value of
    an x=0 / y=0 node into an x=max / y=max copy, and BOTH are zero by the
    solver state's Dirichlet-zero invariant.
    """
    p2 = p * p
    mm = u[..., :p2, :]
    mp_ = jnp.concatenate(
        [jnp.roll(mm[..., _idx_mm(ky, 0, p):_idx_mm(ky, 0, p) + 1, :],
                  -1, axis=-1) for ky in range(p)], axis=-2)
    pm = jnp.roll(mm[..., :p, :], -ncx, axis=-1)  # rows (0, kx), kx < p
    pp = jnp.roll(mm[..., :1, :], -(ncx + 1), axis=-1)
    return jnp.concatenate([mm, mp_, pm, pp], axis=-2)


def _reduce_mm(v: jax.Array, p: int, ncx: int) -> jax.Array:
    """Masked partial piece output (…, p1^2, B) -> consistent mm rows.

    The adjoint gather of :func:`_expand_mm`: each mm row accumulates the
    duplicate copies held by the neighboring cells' mp/pm/pp rows.
    Wraparound contributions are zero because ``v`` is Dirichlet-masked.
    """
    p2 = p * p
    mm = v[..., :p2, :]
    rows = [mm[..., r:r + 1, :] for r in range(p2)]
    for ky in range(p):  # mp copy of (cy, cx-1) -> node (ky, 0)
        r = _idx_mm(ky, 0, p)
        rows[r] = rows[r] + jnp.roll(v[..., p2 + ky:p2 + ky + 1, :],
                                     1, axis=-1)
    for kx in range(p):  # pm copy of (cy-1, cx) -> node (0, kx)
        rows[kx] = rows[kx] + jnp.roll(
            v[..., p2 + p + kx:p2 + p + kx + 1, :], ncx, axis=-1)
    rows[0] = rows[0] + jnp.roll(v[..., p2 + 2 * p:, :], ncx + 1, axis=-1)
    return jnp.concatenate(rows, axis=-2)


def _operator_block(precision, n_comp, p, ncx, ablate, m_f, m_b, nsplit,
                    g6, rep, u4,
                    mask, compact=False, factor="dense", zmats=None,
                    y_split=False, x_split=False, geo=None):
    """The BP4 operator on one z-cell layer of piece-form values.

    ``factor="dense"``: ``m_f``/``m_b`` are the (3q^3, p1^3) stacked
    gradient matrices (precision-prestacked, :func:`_prestack`) and ``g6``
    the (6q^3, Bc) metric entries of this layer — one MXU contraction pair
    with K = p1^3.

    ``factor="twostage"``: the matrices are the stacked 2D pair
    [Dx2d; Dy2d; S2d] (3q^2, p1^2) and ``g6`` the (6q^2, q*B) two-stage
    metric layout (qz in lanes); ``zmats = (Sz, Dz)`` nested float lists
    (q x p1).  The z direction is contracted on the VPU (unrolled plane
    recurrences with compile-time scalar coefficients), the 2D stage runs
    on the MXU with K = p1^2 — (p+1)x fewer contraction FLOPs than dense.

    ``u4``: (C, p1, p1^2, B) input values; ``mask``: Dirichlet mask.
    Returns the masked, y/x-consistent output — full piece rows, or only
    the owner mm rows when ``compact`` — shared by the whole-iteration CG
    kernel and the piece-resident matvec kernel.
    """
    p1 = p + 1
    B = u4.shape[3]
    if "operator" in ablate:
        # timing ablation: elide the MXU contractions + metric apply while
        # keeping every operand stream and VPU phase (isolates the DMA +
        # update/consistency/dots cost; g6 is charged with one use so its
        # stream is not dead-code-eliminated)
        v = u4 * mask[None] + g6[0, 0]
        if "consistency" in ablate:
            return v[..., :p * p, :] if compact else v
        if compact:
            return _reduce_mm(v, p, ncx)
        return _make_consistent(v, p, ncx, y_split=y_split,
                                x_split=x_split)
    if factor == "twostage":
        q2 = m_f.shape[0] // 3  # q^2, padded to a sublane multiple if
        Sz, Dz = zmats          # onthefly with odd q
        q = len(Sz)
        sr2 = precision == "bf16sr"
        if g6.shape[0] == 24:  # metric='onthefly': rebuild per qz group
            per = geo.shape[0] // q  # 4 * q2p rows per qz block
            parts = [_metric_onthefly(g6, geo[qz * per:(qz + 1) * per],
                                      ablate=ablate)
                     for qz in range(q)]  # (6 q2p, B) each
            ge = [jnp.concatenate([parts[qz][e * q2:(e + 1) * q2]
                                   for qz in range(q)], axis=-1)
                  for e in range(6)]      # (q2p, q*B) each
        else:
            ge = [g6[e * q2:(e + 1) * q2] for e in range(6)]  # (q^2, qB)
        vs = []
        for c in range(n_comp):
            uc = u4[c]  # (p1, p1^2, B)
            uS_blocks, uD_blocks = [], []
            for qz in range(q):
                s = uc[0] * Sz[qz][0]
                d = uc[0] * Dz[qz][0]
                for kz in range(1, p1):
                    s = s + uc[kz] * Sz[qz][kz]
                    d = d + uc[kz] * Dz[qz][kz]
                uS_blocks.append(s)
                uD_blocks.append(d)
            uS = jnp.concatenate(uS_blocks, axis=-1)  # (p1^2, qB)
            uD = jnp.concatenate(uD_blocks, axis=-1)
            if sr2:
                uS, uD = _sr_bf16(uS), _sr_bf16(uD)
            elif "split1" in ablate or "fsplit1" in ablate:
                # timing ablation: pre-round the forward stream to bf16 so
                # _stream_parts degrades to a single MXU pass
                uS = uS.astype(jnp.bfloat16)
                uD = uD.astype(jnp.bfloat16)
            gxy = _mm_pre(m_f, m_b, nsplit, precision, uS,
                          rows=(0, 2 * q2))           # (2q^2, qB)
            gz = _mm_pre(m_f, m_b, nsplit, precision, uD,
                         rows=(2 * q2, 3 * q2))       # (q^2, qB)
            gx, gy = gxy[:q2], gxy[q2:]
            if "metric" in ablate:
                # timing ablation: elide the 9-FMA metric application
                # (wrong values; ge charged with one use)
                t0 = gx + ge[0][0, 0]
                t1, t2 = gy, gz
            else:
                t0 = ge[0] * gx + ge[1] * gy + ge[2] * gz
                t1 = ge[1] * gx + ge[3] * gy + ge[4] * gz
                t2 = ge[2] * gx + ge[4] * gy + ge[5] * gz
            t01 = jnp.concatenate([t0, t1], axis=0)
            if sr2:
                t01, t2 = _sr_bf16(t01), _sr_bf16(t2)
            elif "split1" in ablate or "bsplit1" in ablate:
                t01 = t01.astype(jnp.bfloat16)
                t2 = t2.astype(jnp.bfloat16)
            w1 = _mm_pre(m_f, m_b, nsplit, precision, t01,
                         back=True, rows=(0, 2 * q2))  # (p1^2, qB)
            w2 = _mm_pre(m_f, m_b, nsplit, precision, t2,
                         back=True, rows=(2 * q2, 3 * q2))
            planes = []
            for kz in range(p1):
                a = (w1[:, :B] * Sz[0][kz] + w2[:, :B] * Dz[0][kz])
                for qz in range(1, q):
                    sl = slice(qz * B, (qz + 1) * B)
                    a = a + w1[:, sl] * Sz[qz][kz] + w2[:, sl] * Dz[qz][kz]
                planes.append(a)
            vs.append(jnp.stack(planes, axis=0))  # (p1, p1^2, B)
        v = jnp.stack(vs, axis=0)
    else:
        p13 = p1 * p1 * p1
        q3 = m_f.shape[0] // 3
        u = u4.reshape(n_comp * p13, B)
        if g6.shape[0] == 24:  # metric='onthefly': 24 coefficient rows
            g6 = _metric_onthefly(g6, geo, ablate=ablate)
        g00, g01, g02 = (rep(g6[:q3]), rep(g6[q3:2 * q3]),
                         rep(g6[2 * q3:3 * q3]))
        g11, g12, g22 = (rep(g6[3 * q3:4 * q3]), rep(g6[4 * q3:5 * q3]),
                         rep(g6[5 * q3:]))
        # timing-ablation variants (wrong values, identical operand
        # streams): "metric" elides the 9-FMA metric contraction;
        # "split1"/"fsplit1"/"bsplit1" pre-round the fwd/bwd stream to
        # bf16 so _stream_parts degrades to a single MXU pass (isolating
        # the hi/lo-split VPU work + the extra pass); "fwd"/"bwd" elide
        # one MXU contraction.  (Batch-7 dead ends, removed: "fusesplit"
        # hi/lo rounding at the metric outputs — 2x SLOWER, bf16 (q^3, B)
        # intermediates are sublane-misaligned relayouts; "reorder"
        # stage-major instruction order — neutral, Mosaic's scheduler is
        # order-insensitive; "metricbf16" all-bf16 metric arithmetic —
        # 2.3x slower, the VPU has no bf16 rate advantage and pays
        # conversion relayouts.  tools/R3_BATCH7.txt.)
        f1 = "split1" in ablate or "fsplit1" in ablate
        b1 = "split1" in ablate or "bsplit1" in ablate
        bf = jnp.bfloat16
        sr = precision == "bf16sr"
        vs = []
        for c in range(n_comp):
            u_c = u[c * p13:(c + 1) * p13, :]
            if "fwd" in ablate:
                gr = jnp.broadcast_to(u_c[:1, :], (3, q3, B)) + 0.0
            else:
                uf = u_c.astype(bf) if f1 else (
                    _sr_bf16(u_c) if sr else u_c)
                gr = _mm_pre(m_f, m_b, nsplit, precision,
                             uf).reshape(3, q3, B)
            if "metric" in ablate:
                t0 = gr[0] + g00[0, 0]
                t1, t2 = gr[1], gr[2]
            else:
                t0 = g00 * gr[0] + g01 * gr[1] + g02 * gr[2]
                t1 = g01 * gr[0] + g11 * gr[1] + g12 * gr[2]
                t2 = g02 * gr[0] + g12 * gr[1] + g22 * gr[2]
            if "bwd" in ablate:
                vs.append(t0[:p13, :] + 0.0)
                continue
            tb = jnp.concatenate([t0, t1, t2], axis=0)
            if b1:
                tb = tb.astype(bf)
            elif sr:
                tb = _sr_bf16(tb)
            vs.append(_mm_pre(m_f, m_b, nsplit, precision, tb, back=True))
        v = jnp.stack(vs, axis=0).reshape(n_comp, p1, p1 * p1, B)
    v = v * mask[None]
    if "consistency" in ablate:
        # timing ablation: skip the consistency rolls (wrong values);
        # compact mode must still narrow to the stored mm rows
        return v[..., :p * p, :] if compact else v
    if compact:
        return _reduce_mm(v, p, ncx)  # (C, p1, p^2, B) consistent mm rows
    return _make_consistent(v, p, ncx, y_split=y_split,
                            x_split=x_split)


def _fused_cg_kernel(precision, n_comp, p, dims, acc, store, ablate, n_rep,
                     ncz_g, recurrence, compact, factor, zmats, ioff,
                     ncy_g, y_split, ncx_g, x_split, nsplit,
                     matsf_ref, matsb_ref, g6_ref, scal_ref, zoff_ref,
                     pm_ref, pp_ref,
                     x_ref, g_ref, gp_ref, d_ref, dp_ref, h_ref, hp_ref,
                     gh_ref, dh_ref, hh_ref, ph_ref,
                     x2_ref, g2_ref, d2_ref, h2_ref,
                     zg2_ref, zd2_ref, zh2_ref,
                     dots_ref, carry_out_ref,
                     carry_ref, dacc_ref, carry0_ref=None, geo_ref=None):
    """One grid step (L z-cell layers) of the fused CG iteration.

    See the module docstring for the iteration structure; L is derived
    from the block shape (``layers_per_step``), sublayers run unrolled
    with the z-carry threading through registers.

    ``n_rep > 1`` is the lane-folded form: the state refs carry n_rep
    components concatenated along the lane axis (n_comp == 1 then), while
    the preconditioner/metric refs keep the per-cell lane width and are
    tiled in VMEM.  The y/x consistency lane-rolls remain valid across
    component boundaries because every wrapped column pairs piece copies at
    a global box face, which the Dirichlet mask has zeroed.

    Distributed (z-slab) form: ``zoff_ref`` (SMEM, per-device dynamic) and
    static ``ncz_g`` place this device's layers in the global mesh
    (Dirichlet z-faces and dummy layers past the top are derived from
    GLOBAL layer indices); the ``*h_ref``
    halo refs supply the +1 plane of the last layer (the neighboring
    device's pre-update plane 0; zeros on the last device) instead of the
    single-device zero substitute; ``recurrence=False`` writes the raw
    7 partial sums to ``dots_ref`` (for the cross-device psum — the
    reference's single allreduce, ``poisson_operator.h:373-375``) instead
    of running the scalar recurrence in-kernel; and the z carry plane is
    emitted through ``carry_out_ref`` for the upward neighbor.

    Split-grid (comm/compute-overlap) form: ``ioff`` places this call's
    grid steps at offset ``ioff`` of the conceptual full sweep (the
    per-grid-step BlockSpec index maps carry the same offset), and
    ``carry0_ref`` supplies the z-carry entering the first executed step
    (the preceding call's ``carry_out``).  Scratch accumulators (carry,
    dot partials) reset on the first *executed* step, so a split call
    emits only its own steps' partial sums.
    """
    ncz, ncy, ncx = dims
    z0 = zoff_ref[0]
    y0 = zoff_ref[1]
    x0c = zoff_ref[3]
    p1 = p + 1
    p2 = p * p
    B = g_ref.shape[3]
    Bc = B // n_rep  # per-cell lane width of the prec/metric refs
    Lp = g_ref.shape[1]
    L = Lp // p  # z-cell layers per grid step
    nsteps = ncz // L  # steps of the FULL sweep (this call may run fewer)
    prog = pl.program_id(0)
    i = prog + ioff  # step index within the full sweep
    last = i == nsteps - 1

    del ncy  # geometry comes via the mask helper

    def rep(a):
        # tile the per-cell lane axis to the folded state width
        return a if n_rep == 1 else jnp.concatenate([a] * n_rep, axis=-1)

    alpha = scal_ref[0]
    beta = scal_ref[1]
    c1 = scal_ref[2]
    aob = scal_ref[3]
    if precision == "bf16sr":
        # one seed per (iteration, grid step): the solver threads its
        # iteration counter through zoff_ref[2] (SMEM scalar), so the
        # stream-rounding noise decorrelates across iterations; the FULL
        # sweep step index i (not prog: split-grid overlap calls restart
        # prog at 0) decorrelates across grid steps
        pltpu.prng_seed(zoff_ref[2], i)

    m_f = matsf_ref[:]
    m_b = matsb_ref[:]
    # upcast before reshape/slice: bf16 sublane-collapsing shape casts are
    # expensive (or unsupported) Mosaic relayouts; the metric multiplies
    # into f32 MXU results anyway.  Row/lane counts are layout-generic:
    # dense (6q^3, L, Bc) vs twostage (6q^2, L, q*Bc) vs onthefly (24,
    # L, Bc) coefficient rows
    g6_all = g6_ref[:].astype(acc).reshape(
        g6_ref.shape[0], L, g6_ref.shape[-1])
    geo = geo_ref[:].astype(acc) if geo_ref is not None else None

    def layer(j, carry_in):
        """One z-cell layer (sublayer j of this grid step).

        Returns (part, carry_plane) — the per-lane dot partials and the
        z-carry plane owed to layer j+1.
        """
        l_ = i * L + j  # this layer's index within the device slab
        sl = slice(j * p, (j + 1) * p)

        mask = rep(_dirichlet_mask_pieces(p, dims, Bc, l_, z0=z0,
                                          ncz_global=ncz_g, y0=y0,
                                          ncy_global=ncy_g, x0c=x0c,
                                          ncx_global=ncx_g)).astype(acc)
        if "mask" in ablate:
            mask = jnp.ones_like(mask)

        def full(main_ref, z_ref, halo_ref):
            if j < L - 1:
                # the +1 plane is the next sublayer's first plane,
                # already resident in this step's main block (pre-update)
                plus = main_ref[:, (j + 1) * p:(j + 1) * p + 1].astype(acc)
            else:
                plus = jnp.where(last, halo_ref[:].astype(acc),
                                 z_ref[:].astype(acc))
            return jnp.concatenate([main_ref[:, sl].astype(acc), plus],
                                   axis=1)

        g_f = full(g_ref, gp_ref, gh_ref)        # (C, p1, R, B)
        d_f = full(d_ref, dp_ref, dh_ref)
        h_f = full(h_ref, hp_ref, hh_ref)
        P_f = rep(full(pm_ref, pp_ref, ph_ref))  # (1, p1, R, B)

        # -- update4b (pre-sweep callback): delayed-x + g,d recurrences ----
        # x_ref is None in the x-skip variant: on non-pay iterations of the
        # delayed-x recurrence c1 = aob = 0, so x is untouched and its
        # read/write traffic is elided entirely (lax.cond in the solver)
        g2 = g_f + alpha * h_f
        d2 = beta * d_f - P_f * g2
        if x_ref is not None:
            x2 = (x_ref[:, sl].astype(acc) + c1 * d_f[:, :p]
                  + aob * (P_f[:, :p] * g_f[:, :p]))
            x2_ref[:, sl] = x2.astype(x2_ref.dtype)
        g2_ref[:, sl] = g2[:, :p].astype(g2_ref.dtype)
        # the Z-plane duplicates (planes at z-cell boundaries, read as the
        # next iteration's +1 planes) — kept in separate arrays so every
        # state array is a SINGLE pallas operand and can alias its output
        # buffer (XLA would otherwise copy all four state arrays back into
        # the while-loop slots every iteration: measured 118 us/it)
        zg2_ref[:, j:j + 1] = g2[:, :1].astype(zg2_ref.dtype)
        # reduced-precision storage: round d through the storage dtype but
        # keep the working copy at acc — bf16 4D reshapes/slices are
        # unsupported Mosaic relayouts; _mm re-rounds at the matmuls
        d2s = d2 if store == acc else d2.astype(store).astype(acc)
        d2_ref[:, sl] = d2s[:, :p].astype(d2_ref.dtype)
        zd2_ref[:, j:j + 1] = d2s[:, :1].astype(zd2_ref.dtype)

        # -- operator apply on d' ------------------------------------------
        # compact state stores only the owner mm rows; the duplicated
        # mp/pm/pp rows of the operator input are reconstructed by
        # lane-rolls (zero-cost correctness: see _expand_mm)
        d2f = _expand_mm(d2s, p, ncx) if compact else d2s
        v = _operator_block(precision, n_comp, p, ncx, ablate,
                            m_f, m_b, nsplit, g6_all[:, j], rep, d2f, mask,
                            compact=compact, factor=factor, zmats=zmats,
                            y_split=y_split, x_split=x_split, geo=geo)
        first = v[:, :1] + carry_in
        vmain = (first if p == 1
                 else jnp.concatenate([first, v[:, 1:p]], axis=1))
        h2_ref[:, sl] = vmain.astype(h2_ref.dtype)
        zh2_ref[:, j:j + 1] = vmain[:, :1].astype(zh2_ref.dtype)

        # -- update3b partial dots over the owner (mm) rows -----------------
        # stored-precision values (rounded through `store`), held at acc
        hs = vmain if store == acc else vmain.astype(store).astype(acc)
        hm = hs[:, :, :p2]
        gm = g2[:, :p, :p2]
        dm = d2s[:, :p, :p2]
        Pm = P_f[:, :p, :p2]
        ph = Pm * hm
        pg = Pm * gm

        def red(a, b_):
            return jnp.sum(a * b_, axis=(0, 1, 2))   # (B,)

        if "dots" in ablate:
            part = jnp.zeros((8, B), acc) + hm[0, 0, 0]
        else:
            part = jnp.stack([
                red(dm, hm), red(hm, hm), red(gm, hm), red(gm, gm),
                red(gm, ph), red(hm, ph), red(gm, pg),
                jnp.zeros((B,), acc),
            ])
        return part, v[:, p]

    c0 = carry0_ref[:][:, 0] if carry0_ref is not None else 0.0
    carry_in = jnp.where(prog > 0, carry_ref[:], c0)[:, None]
    total = jnp.where(prog > 0, dacc_ref[:], 0.0)
    for j in range(L):
        part, carry_plane = layer(j, carry_in)
        total = total + part
        carry_in = carry_plane[:, None]
    carry_ref[:] = carry_plane
    # the executed grid may be a step_range slice of the full sweep, so
    # "last executed step" is the grid bound, not nsteps
    last_exec = prog == pl.num_programs(0) - 1
    if carry_out_ref is not None:
        # the z-overlap contribution owed to the upward neighbor device is
        # the final executed step's carry plane; the earlier writes were
        # dead (constant-index output block, last write wins)
        @pl.when(last_exec)
        def _write_carry():
            carry_out_ref[:] = carry_plane[:, None]
    dacc_ref[:] = total

    # -- in-kernel scalar recurrence (solver_cg_optimized.h:249-295) --------
    # Computing alpha/beta/c1/aob/res^2 here lets iterations chain
    # pallas -> pallas with no intermediate XLA kernels — the single-chip
    # analog of hiding the allreduce turnaround.  Only the final executed
    # step's values survive (constant-index output block), so in principle
    # the (8, B) cross-lane reduction + recurrence could run lazily under
    # pl.when(last_exec).  MEASURED (tools/PROBE_R5_DOTS.txt, 8 interleaved
    # rounds x 5 points): the lazy form is +10-12% SLOWER at the slope
    # minima for p=1/4/9 and never faster — the every-step log-tree hides
    # under the DMA/MXU pipeline, while the conditional constant-index
    # write perturbs Mosaic's schedule.  The eager (every-step) emission is
    # therefore the default; "lazydots"/"zerodots" remain as ablation arms.
    if "lazydots" in ablate or "zerodots" in ablate:
        @pl.when(last_exec)
        def _emit_dots():
            s = jnp.sum(total, axis=1)  # (8,) cross-lane
            if not recurrence:
                for k in range(8):
                    dots_ref[k] = s[k]
            else:
                sc = scalar_recurrence(s, alpha, beta, scal_ref[4])
                for k in range(8):
                    dots_ref[k] = sc[k]

        if "zerodots" in ablate:
            # keeps the block unconditionally written (dead zeros on
            # non-last steps) while still skipping the log-tree reduce
            @pl.when(jnp.logical_not(last_exec))
            def _zero_dots():
                for k in range(8):
                    dots_ref[k] = jnp.zeros((), dots_ref.dtype)
        return

    # default: eager every-step emission (round-1..4 behavior, re-validated)
    s = jnp.sum(total, axis=1)  # (8,) cross-lane
    if not recurrence:
        # distributed path: emit the raw local partial sums; the scalar
        # recurrence runs at XLA level after the one 7-scalar psum
        for k in range(8):
            dots_ref[k] = s[k]
        return
    sc = scalar_recurrence(s, alpha, beta, scal_ref[4])
    for k in range(8):
        dots_ref[k] = sc[k]


def scalar_recurrence(s, alpha, beta, parity):
    """The merged-CG per-iteration scalar update from the 7 fused sums.

    ``s``: (8,) sums (d.h, h.h, g.h, g.g, g.Ph, h.Ph, g.Pg, 0); ``alpha``,
    ``beta``: previous iteration's coefficients; ``parity``: delayed-x
    phase.  Returns the next scal vector (alpha, beta, c1, aob, parity,
    res2, alpha_old, beta_old) — exactly ``solver_cg_optimized.h:249-295``.
    Shared by the in-kernel (single-chip) and XLA-level (distributed, after
    the psum) recurrence paths.

    CG breakdown (s[0] = d.h = 0, where the reference asserts
    ``ExcDivideByZero``) deliberately propagates NaN through alpha and the
    residual estimate: ``res > tol`` then turns False, so the solver exits
    with ``res = NaN``, ``converged = False`` — breakdown is
    distinguishable from plain non-convergence by ``isnan(res)``.
    """
    alpha_n = s[6] / s[0]
    beta_n = alpha_n * (s[4] + alpha_n * s[5]) / s[6]
    res2 = s[3] + 2.0 * alpha_n * s[2] + alpha_n * alpha_n * s[1]
    parity_next = 1.0 - parity
    is_pay = (parity_next > 0.5) & (alpha != 0)
    safe_b = jnp.where(beta == 0, 1.0, beta)
    aob_n = jnp.where(is_pay, alpha / safe_b, 0.0)
    c1_n = jnp.where(is_pay, alpha_n + aob_n, 0.0)
    return (alpha_n, beta_n, c1_n, aob_n, parity_next, res2, alpha, beta)


def _matvec_kernel(precision, n_comp, p, dims, acc, ablate, n_rep, ncz_g,
                   compact, factor, zmats, nsplit,
                   matsf_ref, matsb_ref, g6_ref, zoff_ref,
                   d_ref, zd_ref, dh_ref, geo_ref,
                   h2_ref, zh2_ref,
                   carry_ref):
    """Piece-resident operator apply (the fused kernel minus CG updates).

    The operator's native matvec: input and output stay in piece-state +
    Z-plane form, so 50 back-to-back applies (the reference's matvec
    timing protocol, ``benchmark.h:204-215``) run with zero windowing
    round trips — like the reference's vmult on its native vector layout.

    NOTE: the per-sublayer scaffolding (mask build, +1-plane selection,
    carry chain) intentionally mirrors ``_fused_cg_kernel.layer``; any
    change to the halo/Z clamping or mask offsets there must be mirrored
    here so the timed matvec stays the solver's exact operator (the
    heavy shared math already lives in ``_operator_block``).
    """
    ncz, ncy, ncx = dims
    z0 = zoff_ref[0]
    B = d_ref.shape[3]
    Bc = B // n_rep
    Lp = d_ref.shape[1]
    L = Lp // p
    nsteps = ncz // L
    i = pl.program_id(0)
    last = i == nsteps - 1
    del ncy

    def rep(a):
        return a if n_rep == 1 else jnp.concatenate([a] * n_rep, axis=-1)

    m_f = matsf_ref[:]
    m_b = matsb_ref[:]
    g6_all = g6_ref[:].astype(acc).reshape(
        g6_ref.shape[0], L, g6_ref.shape[-1])
    geo = geo_ref[:].astype(acc) if geo_ref is not None else None
    if precision == "bf16sr":
        # standalone-apply seed: per grid step only (no iteration state)
        pltpu.prng_seed(i)

    carry_in = jnp.where(i > 0, carry_ref[:], 0.0)[:, None]
    for j in range(L):
        l_ = i * L + j
        sl = slice(j * p, (j + 1) * p)
        mask = rep(_dirichlet_mask_pieces(p, dims, Bc, l_, z0=z0,
                                          ncz_global=ncz_g)).astype(acc)
        if j < L - 1:
            plus = d_ref[:, (j + 1) * p:(j + 1) * p + 1].astype(acc)
        else:
            plus = jnp.where(last, dh_ref[:].astype(acc),
                             zd_ref[:].astype(acc))
        d_f = jnp.concatenate([d_ref[:, sl].astype(acc), plus], axis=1)
        if compact:
            d_f = _expand_mm(d_f, p, ncx)
        v = _operator_block(precision, n_comp, p, ncx, ablate,
                            m_f, m_b, nsplit, g6_all[:, j], rep, d_f, mask,
                            compact=compact, factor=factor, zmats=zmats,
                            geo=geo)
        first = v[:, :1] + carry_in
        vmain = (first if p == 1
                 else jnp.concatenate([first, v[:, 1:p]], axis=1))
        h2_ref[:, sl] = vmain.astype(h2_ref.dtype)
        zh2_ref[:, j:j + 1] = vmain[:, :1].astype(zh2_ref.dtype)
        carry_in = v[:, p][:, None]
    carry_ref[:] = v[:, p]


def piece_vmult(op: PallasOperatorData, n_nodes_axis, d, zd,
                halo: jax.Array | None = None,
                z0: int = 0, ncz_global: int | None = None,
                interpret: bool | None = None,
                layers_per_step: int = 1,
                compact: bool = False):
    """Operator apply on piece-state vectors: (d, zd) -> (h, zh).

    ``d``: (C, ncz*p, p1^2, B) piece-state input (boundary-zero invariant
    assumed, as for all solver state); ``zd``: its Z-plane duplicates.
    ``halo``: the +1 plane past the last layer for distributed slabs
    (zeros substituted when omitted).  The output pair feeds straight back
    in, so repeated applies never leave the operator's native layout.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    nz, ny, nx = n_nodes_axis
    ncz, ncy, ncx = (nz - 1) // p, (ny - 1) // p, (nx - 1) // p
    B = ncy * ncx
    R = p1 * p1
    Rs = p * p if compact else R
    q3 = op.w3.shape[0]
    n_comp = d.shape[0]
    store = d.dtype
    acc = jnp.float32 if store == jnp.bfloat16 else store
    nzm = ncz * p
    L = layers_per_step
    if L > 1 and ncz % L:
        raise ValueError(
            f"layers_per_step={L} does not divide the z-layer count {ncz}")
    L = max(L, 1)
    nsteps = ncz // L

    if halo is None:
        halo = jnp.zeros((n_comp, 1, Rs, B), store)

    q = round(q3 ** (1 / 3))
    mf_op, mb_op, nsplit, gm_op, zmats, geo_op = _factor_setup(
        op, p, q, ncz, B)
    # the Pallas interpreter has no prng_seed/stochastic_round lowering:
    # bf16sr degrades to round-to-nearest there (same bf16 stream class)
    prec = "bf16" if (interpret and op.precision == "bf16sr") \
        else op.precision

    kfn = functools.partial(_matvec_kernel, prec, n_comp, p,
                            (ncz, ncy, ncx), acc, _effective_ablate(op, ()), 1,
                            ncz_global if ncz_global is not None else ncz,
                            compact, op.factor, zmats, nsplit)
    if geo_op is None:
        def kern(*refs):
            return kfn(*refs[:7], None, *refs[7:])
    else:
        kern = kfn

    outs = pl.pallas_call(
        kern,
        grid=(nsteps,),
        # in-place d->h, zd->zh (same shapes/dtypes): under a chained-apply
        # scan the carry is dead after each step, so XLA reuses the buffers
        # instead of allocating fresh outputs and copying the carry — an
        # extra full-state read+write per apply that made time/matvec exceed
        # time/it at several degrees (VERDICT r3 weak item 3).  Callers that
        # still need d afterward are safe: XLA inserts a defensive copy when
        # the operand is live (standard donation semantics).
        input_output_aliases={4: 0, 5: 1},
        in_specs=[
            pl.BlockSpec(mf_op.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mb_op.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gm_op.shape[0], L, 1, gm_op.shape[3]),
                         lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_comp, L * p, Rs, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, 1, Rs, B),
                         lambda i: (0, jnp.minimum(i * L + L, ncz - 1),
                                    0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, 1, Rs, B), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *([pl.BlockSpec(geo_op.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)]
              if geo_op is not None else []),
        ],
        out_specs=[
            pl.BlockSpec((n_comp, L * p, Rs, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, L, Rs, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_comp, nzm, Rs, B), store),
            jax.ShapeDtypeStruct((n_comp, ncz, Rs, B), store),
        ],
        scratch_shapes=[pltpu.VMEM((n_comp, Rs, B), acc)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mf_op, mb_op, gm_op,
      jnp.asarray(z0, jnp.int32).reshape(1), d, zd, halo,
      *([geo_op] if geo_op is not None else []))
    return outs  # (h, zh)


def delayed_x_fixup(x, g, d, prec_pieces, scal, it):
    """Delayed-x exit fixup (``solver_cg_optimized.h:254-289``).

    The merged recurrence defers the x update to every second iteration;
    on exit the pending contribution is applied with the parity-dependent
    combined coefficient.  Shared by the single-device and distributed
    fused solvers so the two cannot drift.
    """
    acc = x.dtype
    alpha, alpha_old, beta_old = scal[0], scal[6], scal[7]
    safe_beta_old = jnp.where(beta_old == 0, 1.0, beta_old)
    da = d.astype(acc)
    x_odd = x + alpha * da
    x_even = (x + (alpha + alpha_old / safe_beta_old) * da
              + (alpha_old / safe_beta_old) * (prec_pieces * g))
    return jnp.where(it == 0, x, jnp.where(it % 2 == 1, x_odd, x_even))


def zplanes_init(v: jax.Array, p: int) -> jax.Array:
    """Initial Z-plane duplicates for a piece-state array: planes at
    z-cell-boundary indices 0, p, 2p, ... — (C, ncz, R, B)."""
    return v[:, ::p]


def fused_cg_iteration(op: PallasOperatorData, n_nodes_axis,
                       x, g, d, h, zg, zd, zh, scal,
                       prec_pieces: jax.Array,
                       interpret: bool | None = None,
                       n_rep: int = 1,
                       halo: tuple | None = None,
                       z0: int = 0,
                       ncz_global: int | None = None,
                       y0=0,
                       ncy_global: int | None = None,
                       y_split: bool = False,
                       x0=0,
                       ncx_global: int | None = None,
                       x_split: bool = False,
                       recurrence: bool = True,
                       want_carry: bool = False,
                       alias: bool = True,
                       layers_per_step: int = 1,
                       compact: bool = False,
                       step_range: tuple[int, int] | None = None,
                       carry0: jax.Array | None = None,
                       with_x: bool = True,
                       seed=0,
                       _ablate: tuple = ()):
    """Run one fused CG iteration;
    returns (x', g', d', h', zg', zd', zh', scal'[, carry]).

    ``x, g, d, h``: piece-state arrays (C, ncz*p, p1^2, B); x, g at the
    accumulation dtype, d, h at the storage dtype.  ``zg, zd, zh``:
    Z-plane duplicate arrays (C, ncz, p1^2, B) holding planes 0, p, 2p, …
    of the corresponding state (:func:`zplanes_init`) — the kernel reads
    layer i's +1 plane from Z[i+1] and writes Z'[i] alongside the main
    block, so every state array appears as exactly ONE pallas operand and
    aliases its output buffer (in-place while-loop state, no XLA copies).
    ``scal``: (8,) array (alpha, beta, c1, aob, parity, res2, alpha_old,
    beta_old); the whole scalar recurrence runs in-kernel so iterations
    chain without intermediate XLA kernels.
    ``prec_pieces``: (1, ncz*p, p1^2, B).

    ``n_rep > 1``: lane-folded form (:func:`fold_state`) — the state arrays
    are (1, ncz*p, p1^2, n_rep*B) with components concatenated along the
    lane axis, turning the per-component MXU contractions into single calls
    of n_rep-fold width; ``prec_pieces`` keeps lane width B.

    Distributed z-slab options (see :mod:`parallel.dist_fused`):
    ``halo = (g_h, d_h, h_h, p_h)`` — the upward neighbor's pre-update
    plane-0 state ((C, 1, R, Bs) x3 + (1, 1, R, B)) used as the last
    layer's +1 plane; ``z0`` / ``ncz_global`` — this slab's global z-layer
    offset and the global layer count (drives Dirichlet faces and dummy
    layers); ``recurrence=False`` — return raw local partial sums instead
    of running the scalar recurrence; ``want_carry=True`` — additionally
    return the (C, 1, R, Bs) z-carry plane owed to the upward neighbor.

    ``step_range=(i0, i1)`` runs only grid steps i0..i1-1 of the full
    z sweep over the SAME full-size (aliased, in-place) state buffers —
    blocks outside the range keep their input values.  Used by the
    comm/compute-overlap distributed path (the fused-kernel analog of
    ``cell_loop``'s pre/post-ghost cell partitioning,
    ``poisson_operator.h:339-364``): an interior call [0, nsteps-1) with
    no halo dependency runs while the halo ``ppermute`` is in flight, and
    a boundary call [nsteps-1, nsteps) consumes the halo plus the interior
    call's carry via ``carry0``.  The per-call dot partials cover only the
    executed steps (sum them across calls before the psum).

    2D (z, y) decomposition (``y_split=True``, non-compact state only):
    ``y0`` / ``ncy_global`` place this device's y cell rows in the global
    mesh (the local dims come from ``n_nodes_axis``); the kernel's y-phase
    consistency keeps boundary-row copies as LOCAL partial sums (see
    :func:`_make_consistent`), which the solver completes with lane-slice
    ppermutes + exact dot corrections after the kernel
    (:mod:`parallel.dist_fused`).  The duplicated piece rows of the
    non-compact state act as the y input halo, so no pre-kernel exchange
    is needed.

    ``with_x=False`` elides the x operand and output entirely: on non-pay
    iterations of the delayed-x recurrence c1 = aob = 0 leaves x untouched,
    so its HBM read/write (2 of the ~9 state words per DoF) can be skipped
    — pass x unchanged around the call (``solver_cg_optimized.h:132-160``'s
    steady-state case where the x update is deferred).  Returns one fewer
    array (no x').
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    nz, ny, nx = n_nodes_axis
    ncz, ncy, ncx = (nz - 1) // p, (ny - 1) // p, (nx - 1) // p
    B = ncy * ncx
    Bs = n_rep * B  # state lane width
    R = p1 * p1
    Rs = p * p if compact else R  # stored rows per state plane
    q3 = op.w3.shape[0]
    n_comp = x.shape[0]
    # accumulation dtype from g (NOT x: the bf16-x-only rung stores x in
    # bf16 while the recurrences accumulate in f32)
    acc = g.dtype
    store = d.dtype
    nzm = ncz * p
    L = layers_per_step
    if L > 1 and ncz % L:
        raise ValueError(
            f"layers_per_step={L} does not divide the z-layer count {ncz}")
    L = max(L, 1)
    nsteps = ncz // L
    i0, i1 = step_range if step_range is not None else (0, nsteps)
    if not (0 <= i0 < i1 <= nsteps):
        raise ValueError(f"step_range {step_range} outside [0, {nsteps}]")
    if step_range is not None and not alias:
        # partial sweeps only write the executed grid steps; without
        # aliased in-place state the untouched output blocks are
        # uninitialized pallas buffers, not the input values
        raise ValueError("step_range requires alias=True (partial-sweep "
                         "results are only meaningful with in-place "
                         "aliased state)")

    def main_spec(c, lanes=Bs):
        return pl.BlockSpec((c, L * p, Rs, lanes),
                            lambda i: (0, i + i0, 0, 0),
                            memory_space=pltpu.VMEM)

    def plus_spec(c, lanes=Bs):
        # the +1 plane of the main state (used only for the preconditioner,
        # which is read-only — no aliasing conflict); clamped at the last
        # step (the kernel substitutes the halo plane there)
        return pl.BlockSpec(
            (c, 1, Rs, lanes),
            lambda i: (0, jnp.minimum((i + i0) * (L * p) + L * p, nzm - 1),
                       0, 0),
            memory_space=pltpu.VMEM)

    def zplus_spec(c, lanes=Bs):
        # the last sublayer's +1 plane from the Z-plane array: Z[(i+1)*L]
        # (clamped; the last step substitutes the halo plane in-kernel)
        return pl.BlockSpec(
            (c, 1, Rs, lanes),
            lambda i: (0, jnp.minimum((i + i0) * L + L, ncz - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def zout_spec(c, lanes=Bs):
        return pl.BlockSpec((c, L, Rs, lanes), lambda i: (0, i + i0, 0, 0),
                            memory_space=pltpu.VMEM)

    def halo_spec(c, lanes=Bs):
        return pl.BlockSpec((c, 1, Rs, lanes), lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    if halo is None:
        g_h = jnp.zeros((n_comp, 1, Rs, Bs), acc)
        d_h = jnp.zeros((n_comp, 1, Rs, Bs), store)
        h_h = jnp.zeros((n_comp, 1, Rs, Bs), store)
        p_h = jnp.zeros((1, 1, Rs, B), prec_pieces.dtype)
    else:
        g_h, d_h, h_h, p_h = halo

    out_specs = [
        *([main_spec(n_comp)] if with_x else []),   # x'
        main_spec(n_comp),                 # g'
        main_spec(n_comp),                 # d'
        main_spec(n_comp),                 # h'
        zout_spec(n_comp),                 # zg'
        zout_spec(n_comp),                 # zd'
        zout_spec(n_comp),                 # zh'
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        # x' keeps x's own storage dtype: the bf16-x-only rung stores x in
        # bf16 (x enters only through update4b and does not feed the
        # g/d/h residual recurrences, so the ITERATION PATH stays f32-
        # exact; the delivered solution is bf16-rounded — VERDICT r5
        # item 3 / ROADMAP candidate 2)
        *([jax.ShapeDtypeStruct((n_comp, nzm, Rs, Bs), x.dtype)]
          if with_x else []),
        jax.ShapeDtypeStruct((n_comp, nzm, Rs, Bs), acc),
        jax.ShapeDtypeStruct((n_comp, nzm, Rs, Bs), store),
        jax.ShapeDtypeStruct((n_comp, nzm, Rs, Bs), store),
        jax.ShapeDtypeStruct((n_comp, ncz, Rs, Bs), acc),
        jax.ShapeDtypeStruct((n_comp, ncz, Rs, Bs), store),
        jax.ShapeDtypeStruct((n_comp, ncz, Rs, Bs), store),
        jax.ShapeDtypeStruct((8,), acc),
    ]
    if want_carry:
        out_specs.append(halo_spec(n_comp))
        out_shape.append(jax.ShapeDtypeStruct((n_comp, 1, Rs, Bs), acc))

    if op.factor == "twostage" and n_rep != 1:
        raise ValueError("factor='twostage' does not support lane folding")
    if (y_split or x_split) and compact:
        raise ValueError(
            "y_split/x_split require the non-compact piece state (the "
            "duplicated rows are the y/x input halo); pass compact=False")
    q = round(q3 ** (1 / 3))
    mf_op, mb_op, nsplit, gm_op, zmats, geo_op = _factor_setup(
        op, p, q, ncz, B)
    # the Pallas interpreter has no prng_seed/stochastic_round lowering:
    # bf16sr degrades to round-to-nearest there (same bf16 stream class)
    prec = "bf16" if (interpret and op.precision == "bf16sr") \
        else op.precision

    base = functools.partial(
        _fused_cg_kernel, prec, n_comp, p,
        (ncz, ncy, ncx), acc, store, _effective_ablate(op, _ablate), n_rep,
        ncz_global if ncz_global is not None else ncz, recurrence, compact,
        op.factor, zmats, i0,
        ncy_global if ncy_global is not None else ncy, y_split,
        ncx_global if ncx_global is not None else ncx, x_split, nsplit)

    n_in = 18 if with_x else 17

    def kern(*refs):
        refs = list(refs)
        # optional trailing inputs (after the fixed ones, geo last so the
        # state-aliasing indices below never shift): carry0, then geo
        n_opt = n_in + (1 if carry0 is not None else 0)
        geo_ref = refs.pop(n_opt) if geo_op is not None else None
        c0_ref = refs.pop(n_in) if carry0 is not None else None
        if not with_x:
            refs.insert(7, None)    # x_ref slot
            refs.insert(18, None)   # x2_ref slot (after the 18 inputs)
        if want_carry:
            *head, dots_ref, carry_out_ref, carry_ref, dacc_ref = refs
        else:
            *head, dots_ref, carry_ref, dacc_ref = refs
            carry_out_ref = None
        return base(*head, dots_ref, carry_out_ref, carry_ref, dacc_ref,
                    c0_ref, geo_ref)

    # Alias every state operand to its output so the while-loop carried
    # buffers update in place — XLA otherwise copies all four state arrays
    # back into the loop slots every iteration (measured 118 us/it at
    # p=4 s=13, 25% of the iteration).  This is why the +1 planes live in
    # the separate Z arrays: a buffer passed twice (main + plus view)
    # cannot be donated without a defensive copy (measured: aliasing the
    # doubly-passed form ADDED 35 us/it of copies).  Safe in-place: the
    # grid sweeps z ascending; each Z[i+1] block is fetched before step
    # i+1 overwrites... (step i reads Z[i+1], step i+1 writes Z'[i+1] only
    # after its own inputs were fetched).  Operand order: matsf, matsb,
    # g6, scal, zoff, pm, pp, [x,] g, zg, d, zd, h, zh, gh, dh, hh, ph.
    if with_x:
        aliases = {7: 0, 8: 1, 9: 4, 10: 2, 11: 5, 12: 3, 13: 6}
    else:
        aliases = {7: 0, 8: 3, 9: 1, 10: 4, 11: 2, 12: 5}
    if not alias:
        aliases = {}

    in_specs = [
        pl.BlockSpec(mf_op.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(mb_op.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        # metric (rows, ncz, lanes): lane-dim block equals the array dim
        # (Mosaic divisible-or-full constraint; B < 128 for s < 10).
        # dense rows 6q^3 lanes B; twostage rows 6q^2 lanes q*B
        pl.BlockSpec((gm_op.shape[0], L, 1, gm_op.shape[3]),
                     lambda i: (0, i + i0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        main_spec(1, B), plus_spec(1, B),
        *([main_spec(n_comp)] if with_x else []),  # x (no plus plane)
        main_spec(n_comp), zplus_spec(n_comp),  # g
        main_spec(n_comp), zplus_spec(n_comp),  # d
        main_spec(n_comp), zplus_spec(n_comp),  # h
        halo_spec(n_comp), halo_spec(n_comp), halo_spec(n_comp),
        halo_spec(1, B),
    ]
    operands = [mf_op, mb_op, gm_op, scal,
                # [2]: per-iteration PRNG seed for the bf16sr stream
                # rounding (the solver threads its iteration counter
                # here); [3]: x cell-column offset (3D decomposition)
                jnp.stack([jnp.asarray(z0, jnp.int32),
                           jnp.asarray(y0, jnp.int32),
                           jnp.asarray(seed).astype(jnp.int32),
                           jnp.asarray(x0, jnp.int32)]),
                prec_pieces, prec_pieces,
                *([x] if with_x else []), g, zg, d, zd, h, zh,
                g_h, d_h, h_h, p_h]
    if carry0 is not None:
        in_specs.append(halo_spec(n_comp))
        operands.append(carry0)
    if geo_op is not None:  # metric='onthefly' static Jacobian-eval rows
        in_specs.append(pl.BlockSpec(geo_op.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(geo_op)

    outs = pl.pallas_call(
        kern,
        grid=(i1 - i0,),
        input_output_aliases=aliases,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_comp, Rs, Bs), acc),
            pltpu.VMEM((8, Bs), acc),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return outs  # ([x',] g', d', h', zg', zd', zh', scal'[, carry])
