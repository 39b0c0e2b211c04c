"""Fused Pallas TPU kernel for the BP4 cell-local apply.

The performance-critical realization of the reference hot loop
(``poisson_operator.h:429-685``), designed for the TPU memory hierarchy
rather than translated:

* **Cells are vector lanes.** The reference packs 4-8 cells into CPU SIMD
  lanes; here a block of 128-2048 cells forms the minor axis of every VMEM
  array, so the VPU's (8, 128) lanes and the MXU's 128-wide tiles are always
  full.
* **One VMEM-resident kernel.** The pure-XLA path materializes every
  quadrature-lattice intermediate in HBM (~50x the useful traffic); here the
  whole chain gradients -> metric -> transpose lives in VMEM.  HBM sees only
  the per-cell input/output values and 24 geometry floats per cell.
* **Dense tensor-product matrices on the MXU.** The classic sum factorization
  minimizes *FLOPs* — a CPU-scalar objective.  On the MXU, contraction
  matmuls with K = p+1 (2..7) waste >99% of the systolic array, while the
  dense per-direction gradient matrices ``M_e = (S (x) S (x) D S)`` of shape
  (q^3, (p+1)^3) give K = 27..343 and run at real MXU rates: ~4x the FLOPs
  at ~30x the throughput.
* **Geometry stays 24 floats/cell.**  The Jacobian at all q-points is
  rebuilt in VMEM as nine (q^3, B) arrays via tiny monomial-derivative
  matmuls, then inverted in scalarized adjugate form — the same
  compute-for-bandwidth trade as the reference (SURVEY.md §3.6), executed on
  the VPU.

The kernel computes per cell block: ``v_loc = sum_e M_e^T (G_ef (M_f u_loc))``
with ``G = det(J) w J^{-1} J^{-T}``.  Gather/scatter of ``u_loc`` stays
outside in XLA (structured meshes: reshapes + one transpose — see
``laplace_structured``), so the kernel itself is mesh-agnostic: any hex mesh
that can produce ``(p+1)^3``-node cell batches can use it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mf_data_locality_tpu.mesh.dofs import DofLayout
from mf_data_locality_tpu.ops import geometry, lagrange
from mf_data_locality_tpu.ops.laplace_structured import (
    cellify_t,
    overlap_add_t,
)



def _dense_gradient_matrices(p: int, q: int) -> tuple[np.ndarray, ...]:
    """M_x, M_y, M_z of shape (q^3, (p+1)^3); rows/cols lex with x fastest."""
    shape = lagrange.make_shape(p, q)
    S, Sg = shape.values, shape.grads
    return (_tensor3(S, S, Sg), _tensor3(S, Sg, S), _tensor3(Sg, S, S))


def _tensor3(az: np.ndarray, ay: np.ndarray, ax: np.ndarray) -> np.ndarray:
    """Rows (qz,qy,qx) lex (x fastest), cols (k,j,i) lex (i fastest)."""
    q, p1 = ax.shape
    out = np.einsum("ck,bj,ai->cbakji", az, ay, ax)
    return np.ascontiguousarray(out.reshape(q**3, p1**3))


def _dense_gradient_matrices_2d(p: int, q: int) -> np.ndarray:
    """[Dx2d; Dy2d; S2d] stacked (3*q^2, (p+1)^2) for the two-stage form.

    The dense 3D gradient matrices factor as M_x = S_z (x) Dx2d,
    M_y = S_z (x) Dy2d, M_z = D_z (x) S2d — the two-stage apply contracts
    the z direction first (a (p+1)-term plane recurrence on the VPU) and
    runs only the 2D stage on the MXU, cutting the contraction FLOPs by
    (p+1)x at the cost of a smaller K = (p+1)^2 (VERDICT round-2 item 1:
    the FLOP-reducing factorization of the reference's sum-factorized hot
    loop, ``poisson_operator.h:534-666``, measured against the dense form).
    Rows are (qy, qx) lex (x fastest), columns (ky, kx) lex.
    """
    shape = lagrange.make_shape(p, q)
    S, Sg = shape.values, shape.grads

    def t2(ay, ax):
        out = np.einsum("bj,ai->baji", ay, ax)
        return np.ascontiguousarray(out.reshape(q * q, (p + 1) * (p + 1)))

    return np.concatenate([t2(S, Sg), t2(Sg, S), t2(S, S)], axis=0)


def _z_matrices(p: int, q: int) -> tuple[np.ndarray, np.ndarray]:
    """(S_z, D_z) of shape (q, p+1): the 1D z-direction factors, applied as
    unrolled VPU plane recurrences in the two-stage kernels (host constants
    baked into the kernel closure)."""
    shape = lagrange.make_shape(p, q)
    return np.asarray(shape.values), np.asarray(shape.grads)


def _piece_perm2d(p: int) -> np.ndarray:
    """2D analog of :func:`_piece_perm`: one kz-plane's (ky, kx) node order
    rearranged to (mm, mp, pm, pp) piece rows."""
    p1 = p + 1
    idx = [ky * p1 + kx for ky in range(p) for kx in range(p)]
    idx += [ky * p1 + p for ky in range(p)]
    idx += [p * p1 + kx for kx in range(p)]
    idx.append(p * p1 + p)
    return np.asarray(idx)


def gmetric_twostage(gm, q: int, ncz: int, B: int):
    """(6*q^3, nc) metric -> (6*q^2, ncz, 1, q*B) two-stage layout.

    The two-stage 2D stage works on (qy, qx)-row x (qz*B + cell)-lane
    arrays, so the metric stream must carry qz in the lane axis.  Pure
    permutation (trace-time; constant-folded when the operator is captured
    as a jit constant).  Works for numpy and jax arrays.
    """
    t = gm.reshape(6, q, q * q, ncz, B)
    t = t.transpose(0, 2, 3, 1, 4)
    return t.reshape(6 * q * q, ncz, 1, q * B)


def _monomial_derivative_matrices(q_points: np.ndarray) -> tuple[np.ndarray, ...]:
    """P_du, P_dv, P_dw of shape (q^3, 8): derivative of the trilinear
    monomials [1,u,v,uv,w,uw,vw,uvw] at every tensor quadrature point."""
    qp = q_points
    n = qp.size
    w, v, u = np.meshgrid(qp, qp, qp, indexing="ij")  # (qz, qy, qx)
    u, v, w = u.reshape(-1), v.reshape(-1), w.reshape(-1)
    zero = np.zeros(n**3)
    one = np.ones(n**3)
    pdu = np.stack([zero, one, zero, v, zero, w, zero, v * w], axis=1)
    pdv = np.stack([zero, zero, one, u, zero, zero, w, u * w], axis=1)
    pdw = np.stack([zero, zero, zero, zero, one, u, v, u * v], axis=1)
    return pdu, pdv, pdw


def _block_size(p: int) -> int:
    """Cells per kernel block: multiples of 128 (Mosaic lane constraint).

    Values are measured optima per degree (see BENCH_SWEEP.txt history); the
    VMEM working set must stay within the raised 64 MB scoped budget."""
    return {1: 2048, 2: 2048, 3: 1024, 4: 256, 5: 256, 6: 128}.get(p, 128)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PallasOperatorData:
    """Pytree for the Pallas-kernel operator; block/n_cells are static."""

    mats: jax.Array  # (3*q^3, (p+1)^3) stacked dense gradient matrices
    pds: jax.Array  # (3*q^3, 8) stacked monomial derivative matrices
    w3: jax.Array  # (q^3, 1) tensor quadrature weights
    coeffs: jax.Array  # (3, 8, nc_pad) trilinear coefficients, cell-minor
    mask: jax.Array  # (1, Nz, Ny, Nx)
    gmetric: jax.Array | None = None  # (6*q^3, nc_pad) precomputed metric
    wmats: tuple | None = None  # (Wz, Wy, Wx) windowing matrices
    mask_w: jax.Array | None = None  # (1, Nz, p1^2, ncyx) windowed mask (zslab)
    block: int = field(metadata=dict(static=True), default=128)
    n_cells: int = field(metadata=dict(static=True), default=0)
    precision: str = field(metadata=dict(static=True), default="highest")
    windowing: str = field(metadata=dict(static=True), default="reshape")
    # "iota": the kernel computes the full-box Dirichlet mask from grid
    # indices and applies it to both operands in VMEM — two whole-lattice
    # HBM mask passes deleted per apply.  Only valid when the local lattice
    # IS the global box (single device); the distributed slab surgery resets
    # it to "none" and keeps external masking (slab z-extremes are halo, not
    # Dirichlet).
    mask_mode: str = field(metadata=dict(static=True), default="none")
    # two-stage factorization (pieces windowing only): [Dx2d; Dy2d; S2d]
    # stacked (3*q^2, (p+1)^2), columns piece-permuted; the z factors are
    # rebuilt from (p, q) at kernel-launch time (static constants)
    mats2d: jax.Array | None = None
    # "dense": one (3q^3, p1^3) MXU contraction pair per layer (max MXU
    # utilization, (p+1)x the FLOPs); "twostage": z on the VPU + 2D MXU
    # stage (minimal FLOPs, K = (p+1)^2) — measured per (p, precision)
    factor: str = field(metadata=dict(static=True), default="dense")
    # on-the-fly rebuild's inversion chain: "adjj" = adjugate-of-J +
    # divide (the reference's do_invert form, poisson_operator.h:27-63);
    # "jtj" = adj(J^T J) rsqrt(det) — mathematically identical, fewer VPU
    # ops, measured faster at the mid/high twostage degrees (see
    # benchmark.resolve_cofactor for the measured dispatch).  Ignored by
    # the precomputed-metric path.
    cofactor: str = field(metadata=dict(static=True), default="adjj")


def _metric_entries(coeffs: np.ndarray, q_points: np.ndarray,
                    w3: np.ndarray) -> np.ndarray:
    """Precompute G = det(J) w J^{-1} J^{-T} at all quadrature points (host, f64).

    Returns the 6 unique entries (00, 01, 02, 11, 12, 22) stacked as rows:
    shape (6*q^3, n_cells).  This is a deliberate departure from the
    reference's 24-floats/cell on-the-fly geometry (``poisson_operator.h:
    151-179``): on TPU the VPU work to rebuild J/adj/det per point (~120
    elementwise passes per q-point) costs far more than streaming 6 extra
    f32 words per q-point from HBM at ~900 GB/s, so the compute-for-bandwidth
    trade flips (measured; see tools/MICROBENCH.txt).
    """
    from mf_data_locality_tpu import native

    if native.AVAILABLE and native.HAS_METRIC:
        return native.metric_entries(coeffs, q_points, w3)

    qp = q_points
    q = qp.size
    w, v, u = np.meshgrid(qp, qp, qp, indexing="ij")
    uvw = np.stack([u.reshape(-1), v.reshape(-1), w.reshape(-1)], axis=-1)
    jac = geometry.jacobian(coeffs[:, None, :, :], uvw[None, :, :])
    inv, det = geometry.invert_3x3(jac)  # (nc, q^3, 3, 3), (nc, q^3)
    g = np.einsum("cqed,cqfd->cqef", inv, inv) * (det * w3.reshape(1, -1))[
        ..., None, None]
    entries = [g[..., 0, 0], g[..., 0, 1], g[..., 0, 2],
               g[..., 1, 1], g[..., 1, 2], g[..., 2, 2]]
    return np.concatenate([e.T for e in entries], axis=0)  # (6q^3, nc)


def metric_for_coeffs(co_kernel: np.ndarray, p: int, q: int) -> np.ndarray:
    """Precomputed metric from kernel-layout coefficients (3, 8, nc).

    Host-side helper for the distributed path, which re-installs slab
    geometry into an already-built operator (``parallel/distributed.py``).
    Returns (6*q^3, nc) float64.
    """
    shape = lagrange.make_shape(p, q)
    w = shape.q_weights
    w3 = (w[:, None, None] * w[None, :, None] * w[None, None, :]).reshape(-1, 1)
    coeffs = np.asarray(co_kernel, np.float64).transpose(2, 1, 0)  # (nc, 8, 3)
    return _metric_entries(coeffs, shape.q_points, w3)


def dummy_metric_columns(w3, n_cols: int, xp=np):
    """(6*q^3, n_cols) metric for unit-geometry dummy cells: G = diag(w)."""
    q3 = w3.shape[0]
    g = xp.zeros((6 * q3, n_cols), dtype=w3.dtype)
    if n_cols == 0:
        return g
    if xp is np:
        g[0 * q3:1 * q3] = w3
        g[3 * q3:4 * q3] = w3
        g[5 * q3:6 * q3] = w3
        return g
    g = g.at[0 * q3:1 * q3].set(w3)
    g = g.at[3 * q3:4 * q3].set(w3)
    g = g.at[5 * q3:6 * q3].set(w3)
    return g


def make_pallas_operator(layout: DofLayout, n_q: int | None = None,
                         dtype=jnp.float32,
                         block: int | None = None,
                         metric: str = "precomputed",
                         precision: str = "highest",
                         windowing: str = "reshape",
                         metric_dtype=None,
                         factor: str = "dense",
                         cofactor: str = "adjj") -> PallasOperatorData:
    """Build the Pallas operator.

    ``metric``: "precomputed" stores the 6 metric entries per q-point
    (6*q^3*4 bytes/cell of HBM) and streams them through the kernel;
    "onthefly" stores 24 floats/cell and rebuilds J per q-point in-kernel
    (the reference's trade, ``poisson_operator.h:151-179``).  With
    windowing="pieces" the rebuild happens inside the piece-resident
    kernels (``cg_fused_kernel._metric_onthefly``; dense factorization
    only) — 54x less geometry HBM at p=4 for ~100 extra VPU ops per
    q-point-lane.  CAVEAT: on TPU the in-kernel Jacobian matmul always
    runs as a split3 bf16 hi/lo pair, so metric="onthefly" +
    precision="highest" yields ~1e-5-class geometry perturbation (measured
    6-8e-6 max rel on random geometry-like operands) instead
    of exact-f32 geometry (Mosaic offers no exact-f32 matmul here; f64
    interpret mode keeps exact accumulation).
    ``precision``: "highest" (exact f32 matmuls),
    "split3" (manual 3-product bf16 hi/lo split, ~1e-5 relative operator
    error, f32-HIGH class), or "bf16" (single-pass, ~1e-3).
    ``metric_dtype``: storage dtype of the precomputed metric stream
    (default: the compute dtype).  bfloat16 halves the dominant matvec HBM
    stream (6 q^3 words/cell) at ~2e-3 operator error — pair with
    ``precision="bf16"`` (same error class).
    """
    p = layout.degree
    q = n_q if n_q is not None else p + 2
    shape = lagrange.make_shape(p, q)
    B = block or _block_size(p)
    # small meshes: don't pad beyond the cell count (lane-aligned)
    B = min(B, max(128, -(-layout.mesh.n_cells // 128) * 128))
    # bf16 vectors: the stream (mask, windowing) stays bf16, but matrices,
    # geometry and the metric are kept f32 — in-kernel compute is f32
    vec_dtype = dtype
    if dtype == jnp.bfloat16:
        dtype = jnp.float32

    # stacked row-wise (3*q^3 rows): one fused MXU matmul computes all three
    # gradient directions — fewer, larger matmuls tile far better at low p
    mats = np.concatenate(_dense_gradient_matrices(p, q), axis=0)
    pds = np.concatenate(_monomial_derivative_matrices(shape.q_points), axis=0)
    w = shape.q_weights
    w3 = (w[:, None, None] * w[None, :, None] * w[None, None, :]).reshape(-1, 1)

    nc = layout.mesh.n_cells
    nc_pad = -(-nc // B) * B
    coeffs = geometry.trilinear_coefficients(layout.mesh.cell_vertices)
    co = np.zeros((3, 8, nc_pad))
    co[:, :, :nc] = coeffs.transpose(2, 1, 0)
    # dummy cells: unit geometry so det = 1 (reference pads inactive SIMD
    # lanes the same way, poisson_operator.h:269-280)
    co[0, 1, nc:] = 1.0
    co[1, 2, nc:] = 1.0
    co[2, 4, nc:] = 1.0

    gmetric = None
    if metric == "precomputed":
        gm = np.zeros((6 * q**3, nc_pad))
        gm[:, :nc] = _metric_entries(coeffs, shape.q_points, w3)
        # dummy cells: unit geometry -> G = diag(w)
        gm[0 * q**3:1 * q**3, nc:] = w3
        gm[3 * q**3:4 * q**3, nc:] = w3
        gm[5 * q**3:6 * q**3, nc:] = w3
        gmetric = jnp.asarray(gm, dtype=metric_dtype or dtype)
    elif metric == "deferred":
        # caller will install the real metric (distributed slab surgery:
        # replace_coeffs_pallas*) — skip the host-side compute, keep the
        # correctly-shaped slot so windowing modes see a precomputed metric
        gmetric = jnp.zeros((6 * q**3, nc_pad),
                            dtype=metric_dtype or dtype)
    elif metric != "onthefly":
        raise ValueError(f"unknown metric mode {metric!r}")

    nz, ny, nx = layout.n_nodes_axis
    mask = (~layout.boundary_node_mask).reshape(1, nz, ny, nx)
    wmats = None
    mask_w = None
    if windowing == "matmul":
        wmats = tuple(jnp.asarray(_window_matrix(n, p), dtype=vec_dtype)
                      for n in (nz, ny, nx))
    elif windowing == "zslab":
        if gmetric is None:
            raise ValueError("windowing='zslab' requires metric='precomputed'")
        # the kernel grid walks z-cell-layers: one block = one layer of
        # cells; no lane padding so the G stream stays layer-aligned
        ncz_, ncy_, ncx_ = layout.mesh.n_cells_axis
        B = ncy_ * ncx_
        gmetric = gmetric[:, :nc]
        co = co[:, :, :nc]
        nc_pad = nc
        mask_w = _to_zslab_form(
            jnp.asarray(mask.astype(np.float64), vec_dtype), p)
    elif windowing == "pieces":
        if gmetric is None and metric != "onthefly":
            raise ValueError(
                "windowing='pieces' requires metric='precomputed', "
                "'deferred', or 'onthefly'")
        ncz_, ncy_, ncx_ = layout.mesh.n_cells_axis
        B = ncy_ * ncx_
        if gmetric is not None:
            gmetric = gmetric[:, :nc]
        co = co[:, :, :nc]
        nc_pad = nc
        mats = mats[:, _piece_perm(p)]
        mask_mode = "iota"
        # (odd-q onthefly row padding happens at kernel-operand setup —
        # cg_fused_kernel._factor_setup — so the stored operator arrays
        # stay canonical)
    elif windowing not in ("reshape", "conv"):
        raise ValueError(f"unknown windowing mode {windowing!r}")
    if windowing != "pieces":
        mask_mode = "none"
    if factor not in ("dense", "twostage"):
        raise ValueError(f"unknown factor mode {factor!r}")
    if cofactor not in ("adjj", "jtj"):
        raise ValueError(f"unknown cofactor mode {cofactor!r}")
    mats2d = None
    if windowing == "pieces":
        # always built (tiny): lets solvers A/B the factorization without
        # rebuilding the operator
        mats2d = jnp.asarray(
            _dense_gradient_matrices_2d(p, q)[:, _piece_perm2d(p)],
            dtype=dtype)
    elif factor == "twostage":
        raise ValueError("factor='twostage' requires windowing='pieces'")
    return PallasOperatorData(
        mats=jnp.asarray(mats, dtype=dtype),
        pds=jnp.asarray(pds, dtype=dtype),
        w3=jnp.asarray(w3, dtype=dtype),
        coeffs=jnp.asarray(co, dtype=dtype),
        mask=jnp.asarray(mask, dtype=vec_dtype),
        gmetric=gmetric,
        wmats=wmats,
        mask_w=mask_w,
        block=B,
        n_cells=nc,
        precision=precision,
        windowing=windowing,
        mask_mode=mask_mode,
        mats2d=mats2d,
        factor=factor,
        cofactor=cofactor,
    )


SPLIT3_FUSED_K = True
"""split3 as one K-stacked matmul (identical arithmetic) instead of three
passes; module-level so probes can A/B both lowerings."""


def _mm(a, b, precision, dims=None):
    """Matmul with selectable precision strategy (MXU).

    "highest": exact accumulation at the operand dtype (XLA HIGHEST,
    multi-pass for f32).  "split3": manual bf16 hi/lo decomposition, 3
    single-pass products hh + hl + lh accumulated in f32 — the HIGH-class
    algorithm expressed explicitly so Mosaic cannot silently upgrade it.
    "split2m": matrices rounded to bf16 (fixed ~2e-3 operator
    perturbation, ~+2 CG iterations) with hi/lo-split stream — 2/3 the
    MXU passes of split3.  "bf16": one pass on rounded operands.

    NOTE: when the streamed operand is ALREADY bf16 (dtype=bf16 runs),
    "split3" and "split2m" degrade gracefully to fewer passes — split2m
    becomes a single bf16 x bf16 product, so its documented "per-apply
    stream noise at f32 class" does NOT hold for that combination (it is
    then identical to precision="bf16").
    """
    dn = dims if dims is not None else (((1,), (0,)), ((), ()))
    f32 = jnp.float32 if a.dtype in (jnp.float32, jnp.bfloat16) else a.dtype
    if precision == "split3":
        def parts(x):
            if x.dtype == jnp.bfloat16:
                return [x]  # already exact in bf16 — nothing to split
            xh = x.astype(jnp.bfloat16)
            return [xh, (x - xh.astype(x.dtype)).astype(jnp.bfloat16)]

        pa, pb = parts(a), parts(b)
        d = lambda x, y: jax.lax.dot_general(  # noqa: E731
            x, y, dn, preferred_element_type=f32)
        # hi*hi + hi*lo + lo*hi (drop lo*lo: below f32 working precision)
        if SPLIT3_FUSED_K and len(pa) > 1 and len(pb) > 1:
            # fuse the three products into ONE matmul by stacking along
            # the contraction axis — identical arithmetic (the MXU f32
            # accumulator sums across K), one invocation instead of three
            ka, kb = dn[0][0][0], dn[0][1][0]
            a3 = jnp.concatenate([pa[0], pa[1], pa[0]], axis=ka)
            b3 = jnp.concatenate([pb[0], pb[0], pb[1]], axis=kb)
            return d(a3, b3)
        out = d(pa[0], pb[0])
        if len(pb) > 1:
            out = out + d(pa[0], pb[1])
        if len(pa) > 1:
            out = out + d(pa[1], pb[0])
        return out
    if precision == "split2m":
        # matrices rounded to ONE bf16 copy, the streamed operand split
        # hi/lo: two products (mh*bh + mh*bl), K-stacked into one matmul.
        # A fixed ~2e-3 perturbation of the OPERATOR (consistent across
        # iterations — CG solves the perturbed SPD system, costing ~2
        # extra iterations), with per-apply stream noise at f32 class —
        # the intermediate rung between split3 and bf16.
        ah = a.astype(jnp.bfloat16)
        if b.dtype == jnp.bfloat16:
            return jax.lax.dot_general(ah, b, dn,
                                       preferred_element_type=f32)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(b.dtype)).astype(jnp.bfloat16)
        ka, kb = dn[0][0][0], dn[0][1][0]
        a2 = jnp.concatenate([ah, ah], axis=ka)
        b2 = jnp.concatenate([bh, bl], axis=kb)
        return jax.lax.dot_general(a2, b2, dn, preferred_element_type=f32)
    if precision in ("bf16", "bf16sr"):
        # "bf16sr" (stochastically rounded streams) exists only inside the
        # fused Pallas kernels (cg_fused_kernel._sr_bf16); at XLA level and
        # in interpret mode it degrades to this round-to-nearest form
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
            preferred_element_type=f32)
    if a.dtype != b.dtype:  # bf16 stream against f32 matrices: upcast
        wide = a.dtype if a.dtype.itemsize >= b.dtype.itemsize else b.dtype
        a, b = a.astype(wide), b.astype(wide)
    return jax.lax.dot_general(
        a, b, dn, preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)


def _kernel_g(precision, mats_ref, g6_ref, u_ref, out_ref):
    """Precomputed-metric cell block: v = sum_e M_e^T (G_ef (M_f u)).

    The geometry pipeline (trilinear Jacobian -> adjugate -> det -> G) is
    hoisted to setup (:func:`_metric_entries`); the kernel streams the 6
    unique G entries per q-point from HBM and spends its time purely on the
    two stacked MXU contractions + 15 VPU passes of the symmetric apply.

    Phased structure (all forwards, then all metric applies, then all
    transposes) keeps the per-component chains visibly independent so the
    scheduler can overlap MXU matmuls of one component with VPU work of
    another.
    """
    p13 = mats_ref.shape[1]
    n_comp = u_ref.shape[0] // p13
    q3 = g6_ref.shape[0] // 6
    m = mats_ref[:]
    g6 = g6_ref[:]
    g00, g01, g02 = g6[:q3], g6[q3:2 * q3], g6[2 * q3:3 * q3]
    g11, g12, g22 = g6[3 * q3:4 * q3], g6[4 * q3:5 * q3], g6[5 * q3:]
    dn_t = (((0,), (0,)), ((), ()))
    grads = []
    for c in range(n_comp):
        u_c = u_ref[c * p13:(c + 1) * p13, :]
        grads.append(_mm(m, u_c, precision).reshape(3, q3, u_c.shape[1]))
    ts = []
    for g in grads:
        t0 = g00 * g[0] + g01 * g[1] + g02 * g[2]
        t1 = g01 * g[0] + g11 * g[1] + g12 * g[2]
        t2 = g02 * g[0] + g12 * g[1] + g22 * g[2]
        ts.append(jnp.concatenate([t0, t1, t2], axis=0))  # (3*q3, B)
    for c, t_all in enumerate(ts):
        v = _mm(m, t_all, precision, dims=dn_t)
        out_ref[c * p13:(c + 1) * p13, :] = v.astype(out_ref.dtype)


def _kernel(mats_ref, pds_ref, w3_ref, u_ref, co_ref, out_ref):
    """One cell block: v_loc = sum_e M_e^T diag(G) M_f u_loc, VMEM-resident.

    I/O is 2D ``(n_comp * p1^3, B)`` — components flattened into rows so the
    sublane dimension has no 3->8 padding (a 2.7x footprint penalty at C=3).
    """
    p13 = mats_ref.shape[1]
    n_comp = u_ref.shape[0] // p13
    B = u_ref.shape[1]
    q3 = w3_ref.shape[0]
    f32 = jnp.float32 if u_ref.dtype in (jnp.float32, jnp.bfloat16) else u_ref.dtype
    # TPU f32 dots default to one bf16 pass (~1e-3 error); HIGHEST selects the
    # exact f32 path — the operator must be accurate to f32 eps or CG
    # iteration counts drift (the reference runs f64 end to end).
    prec = jax.lax.Precision.HIGHEST

    # Jacobian entries j[d][e] = P_e @ coeffs[d]: three stacked matmuls
    co = co_ref[:]
    j_all = [jnp.dot(pds_ref[:], co[d], preferred_element_type=f32,
                     precision=prec).reshape(3, q3, B) for d in range(3)]
    j = [[j_all[d][e] for e in range(3)] for d in range(3)]

    # adjugate and determinant, scalarized on (q3, B) arrays (VPU)
    adj = [[None] * 3 for _ in range(3)]
    adj[0][0] = j[1][1] * j[2][2] - j[1][2] * j[2][1]
    adj[0][1] = j[0][2] * j[2][1] - j[0][1] * j[2][2]
    adj[0][2] = j[0][1] * j[1][2] - j[0][2] * j[1][1]
    adj[1][0] = j[1][2] * j[2][0] - j[1][0] * j[2][2]
    adj[1][1] = j[0][0] * j[2][2] - j[0][2] * j[2][0]
    adj[1][2] = j[0][2] * j[1][0] - j[0][0] * j[1][2]
    adj[2][0] = j[1][0] * j[2][1] - j[1][1] * j[2][0]
    adj[2][1] = j[0][1] * j[2][0] - j[0][0] * j[2][1]
    adj[2][2] = j[0][0] * j[1][1] - j[0][1] * j[1][0]
    det = j[0][0] * adj[0][0] + j[0][1] * adj[1][0] + j[0][2] * adj[2][0]
    scale = w3_ref[:] / det

    def gmat(e, f):
        return scale * (adj[e][0] * adj[f][0] + adj[e][1] * adj[f][1]
                        + adj[e][2] * adj[f][2])

    g00, g01, g02 = gmat(0, 0), gmat(0, 1), gmat(0, 2)
    g11, g12, g22 = gmat(1, 1), gmat(1, 2), gmat(2, 2)

    # per-component pipeline: geometry (above) is computed ONCE; looping over
    # components keeps the VMEM working set ~3x smaller, which is what lets
    # p=5,6 (q^3=343,512) fit the ~16 MB scoped limit
    dn = (((0,), (0,)), ((), ()))
    for c in range(n_comp):
        u_c = u_ref[c * p13:(c + 1) * p13, :].astype(f32)  # (p13, B)
        g_all = jnp.dot(mats_ref[:], u_c, preferred_element_type=f32,
                        precision=prec)
        g = g_all.reshape(3, q3, B)
        t0 = g00 * g[0] + g01 * g[1] + g02 * g[2]
        t1 = g01 * g[0] + g11 * g[1] + g12 * g[2]
        t2 = g02 * g[0] + g12 * g[1] + g22 * g[2]
        t_all = jnp.concatenate([t0, t1, t2], axis=0)  # (3*q3, B)
        v = jax.lax.dot_general(mats_ref[:], t_all, dn,
                                preferred_element_type=f32, precision=prec)
        out_ref[c * p13:(c + 1) * p13, :] = v.astype(out_ref.dtype)


def _kernel_g_zslab(precision, n_comp, mats_ref, g6_ref, um_ref, up_ref,
                    mm_ref, mp_ref, out_main_ref, out_top_ref, carry_ref):
    """One z-cell-layer with in-kernel z-windowing and carry-plane scatter.

    The grid walks z-cell-layers sequentially; dual input BlockSpecs deliver
    the p owned node planes plus the overlapping +1 plane (the structured
    analog of the reference's ghost row), so the z-axis window extraction
    and overlap-add never materialize in HBM.  The shared output plane is
    accumulated across grid steps in a VMEM carry scratch.  The Dirichlet
    mask is applied in-kernel on both sides (two full lattice sweeps saved
    per apply).
    """
    p = um_ref.shape[1]
    p1yx = um_ref.shape[2]
    B = um_ref.shape[3]
    p13 = mats_ref.shape[1]
    q3 = g6_ref.shape[0] // 6
    i = pl.program_id(0)

    mask = jnp.concatenate([mm_ref[:], mp_ref[:]], axis=1)  # (1, p+1, ., B)
    u = jnp.concatenate([um_ref[:], up_ref[:]], axis=1) * mask
    u = u.reshape(n_comp * p13, B)

    m = mats_ref[:]
    g6 = g6_ref[:].reshape(6 * q3, B)
    g00, g01, g02 = g6[:q3], g6[q3:2 * q3], g6[2 * q3:3 * q3]
    g11, g12, g22 = g6[3 * q3:4 * q3], g6[4 * q3:5 * q3], g6[5 * q3:]
    dn_t = (((0,), (0,)), ((), ()))
    grads = []
    for c in range(n_comp):
        u_c = u[c * p13:(c + 1) * p13, :]
        grads.append(_mm(m, u_c, precision).reshape(3, q3, B))
    vs = []
    for g in grads:
        t0 = g00 * g[0] + g01 * g[1] + g02 * g[2]
        t1 = g01 * g[0] + g11 * g[1] + g12 * g[2]
        t2 = g02 * g[0] + g12 * g[1] + g22 * g[2]
        t_all = jnp.concatenate([t0, t1, t2], axis=0)
        vs.append(_mm(m, t_all, precision, dims=dn_t))
    v = jnp.stack(vs, axis=0).reshape(n_comp, p + 1, p1yx, B) * mask

    first = v[:, :1] + jnp.where(i > 0, carry_ref[:], 0.0)[:, None]
    vmain = (first if p == 1
             else jnp.concatenate([first, v[:, 1:p]], axis=1))
    out_main_ref[:] = vmain.astype(out_main_ref.dtype)
    carry_ref[:] = v[:, p]
    out_top_ref[:] = v[:, p:].astype(out_top_ref.dtype)


def _to_zslab_form(u: jax.Array, p: int) -> jax.Array:
    """(C, Nz, Ny, Nx) -> (C, Nz, p1^2, ncy*ncx): y/x windowed, z untouched."""
    t = cellify_t(u, 3, p)  # (C, Nz, Ny, p1x, ncx)
    t = cellify_t(t, 2, p)  # (C, Nz, p1y, ncy, p1x, ncx)
    t = t.transpose(0, 1, 2, 4, 3, 5)  # (C, Nz, p1y, p1x, ncy, ncx)
    c, nz = t.shape[0], t.shape[1]
    p1 = p + 1
    return t.reshape(c, nz, p1 * p1, -1)


def _from_zslab_form(v: jax.Array, p: int, n_nodes_axis) -> jax.Array:
    """Adjoint of :func:`_to_zslab_form` (y/x overlap-add)."""
    nz, ny, nx = n_nodes_axis
    p1 = p + 1
    ncy, ncx = (ny - 1) // p, (nx - 1) // p
    t = v.reshape(v.shape[0], nz, p1, p1, ncy, ncx)
    t = t.transpose(0, 1, 2, 4, 3, 5)  # (C, Nz, p1y, ncy, p1x, ncx)
    t = overlap_add_t(t, 2, p)  # (C, Nz, Ny, p1x, ncx)
    return overlap_add_t(t, 3, p)  # (C, Nz, Ny, Nx)


def apply_lattice_zslab(op: PallasOperatorData, u: jax.Array,
                        interpret: bool | None = None) -> jax.Array:
    """Matvec with in-kernel z-windowing (windowing="zslab")."""
    import functools

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    n_comp, nz, ny, nx = u.shape
    ncz = (nz - 1) // p
    B = ((ny - 1) // p) * ((nx - 1) // p)
    q3 = op.w3.shape[0]
    p13 = op.mats.shape[1]

    t = _to_zslab_form(u, p)  # (C, Nz, p1^2, B)

    grid = (ncz,)
    out_main, out_top = pl.pallas_call(
        functools.partial(_kernel_g_zslab, op.precision, n_comp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3 * q3, p13), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # 3D metric (6q^3, ncz, B): the lane-dim block equals the array
            # dim, satisfying the Mosaic divisible-or-full constraint for
            # every mesh size (B < 128 occurs for s < 10)
            pl.BlockSpec((6 * q3, 1, 1, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, p, p1 * p1, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, 1, p1 * p1, B),
                         lambda i: (0, i * p + p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, p1 * p1, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p1 * p1, B), lambda i: (0, i * p + p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_comp, p, p1 * p1, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, 1, p1 * p1, B), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_comp, ncz * p, p1 * p1, B), u.dtype),
            jax.ShapeDtypeStruct((n_comp, 1, p1 * p1, B), u.dtype),
        ],
        scratch_shapes=[pltpu.VMEM(
            (n_comp, p1 * p1, B),
            jnp.float64 if u.dtype == jnp.float64 else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(op.mats, op.gmetric.reshape(6 * q3, ncz, 1, B), t, t,
      op.mask_w, op.mask_w)

    v = jnp.concatenate([out_main, out_top], axis=1)  # (C, Nz, p1^2, B)
    return _from_zslab_form(v, p, (nz, ny, nx))


def _piece_perm(p: int) -> np.ndarray:
    """Column permutation of the dense matrices for piece-ordered rows.

    Piece order per kz-plane: (ky<p, kx<p) lex, then (ky<p, kx=p), then
    (ky=p, kx<p), then (ky=p, kx=p) — matching the four corner pieces the
    wrapper emits, so the kernel can assemble u_loc by cheap row concat
    instead of interleaving.
    """
    p1 = p + 1
    idx = []
    for kz in range(p1):
        base = kz * p1 * p1
        idx += [base + ky * p1 + kx for ky in range(p) for kx in range(p)]
        idx += [base + ky * p1 + p for ky in range(p)]
        idx += [base + p * p1 + kx for kx in range(p)]
        idx.append(base + p * p1 + p)
    return np.asarray(idx)


def _to_piece_forms(u: jax.Array, p: int):
    """(C, Nz, Ny, Nx) -> four y/x corner pieces (z untouched).

    mm: (ky<p, kx<p) rows; mp: kx = p; pm: ky = p; pp: both.  Each piece is
    one fused slice+transpose — no concats (those happen in VMEM inside the
    kernel), which is the point: the reshape-chain wrapper's three HBM-level
    concats were the single largest matvec cost at p=4.
    """
    c, nz, ny, nx = u.shape
    ncy, ncx = (ny - 1) // p, (nx - 1) // p
    yx = ncy * ncx
    mm = u[:, :, :ncy * p, :ncx * p].reshape(c, nz, ncy, p, ncx, p)
    mm = mm.transpose(0, 1, 3, 5, 2, 4).reshape(c, nz, p * p, yx)
    mp = u[:, :, :ncy * p, p::p].reshape(c, nz, ncy, p, ncx)
    mp = mp.transpose(0, 1, 3, 2, 4).reshape(c, nz, p, yx)
    pm = u[:, :, p::p, :ncx * p].reshape(c, nz, ncy, ncx, p)
    pm = pm.transpose(0, 1, 4, 2, 3).reshape(c, nz, p, yx)
    pp = u[:, :, p::p, p::p].reshape(c, nz, 1, yx)
    return mm, mp, pm, pp


def _from_piece_forms(vm, vtop, p: int, n_nodes_axis) -> jax.Array:
    """Adjoint of :func:`_to_piece_forms` + z-plane reassembly.

    ``vm``: 4 main pieces (C, ncz*p, rows_j, yx); ``vtop``: (C, 1, p1^2, yx)
    holding the global top plane in assembled row order.  Overlapping y/x
    node contributions are summed by construction (pad-shift adds).
    """
    nz, ny, nx = n_nodes_axis
    ncy, ncx = (ny - 1) // p, (nx - 1) // p
    yx = ncy * ncx
    c = vm[0].shape[0]
    p2 = p * p
    tops = (vtop[:, :, :p2], vtop[:, :, p2:p2 + p],
            vtop[:, :, p2 + p:p2 + 2 * p], vtop[:, :, p2 + 2 * p:])
    full = [jnp.concatenate([m, t], axis=1) for m, t in zip(vm, tops)]

    # mm: values at (y = cy*p + ky, x = cx*p + kx), ky, kx < p
    mm = full[0].reshape(c, nz, p, p, ncy, ncx)
    mm = mm.transpose(0, 1, 4, 2, 5, 3).reshape(c, nz, ncy * p, ncx * p)
    v = jnp.pad(mm, ((0, 0), (0, 0), (0, 1), (0, 1)))

    # mp: values at (y = cy*p + ky, x = (cx+1)*p)
    mp = full[1].reshape(c, nz, p, ncy, ncx)
    mp = mp.transpose(0, 1, 3, 2, 4).reshape(c, nz, ncy * p, ncx, 1)
    mp = jnp.pad(mp, ((0, 0), (0, 0), (0, 0), (0, 0), (p - 1, 0)))
    mp = mp.reshape(c, nz, ncy * p, ncx * p)
    v = v + jnp.pad(mp, ((0, 0), (0, 0), (0, 1), (1, 0)))

    # pm: values at (y = (cy+1)*p, x = cx*p + kx)
    pm = full[2].reshape(c, nz, p, ncy, ncx)
    pm = pm.transpose(0, 1, 3, 4, 2).reshape(c, nz, ncy, 1, ncx * p)
    pm = jnp.pad(pm, ((0, 0), (0, 0), (0, 0), (p - 1, 0), (0, 0)))
    pm = pm.reshape(c, nz, ncy * p, ncx * p)
    v = v + jnp.pad(pm, ((0, 0), (0, 0), (1, 0), (0, 1)))

    # pp: values at (y = (cy+1)*p, x = (cx+1)*p)
    pp = full[3].reshape(c, nz, ncy, 1, ncx, 1)
    pp = jnp.pad(pp, ((0, 0), (0, 0), (0, 0), (p - 1, 0),
                      (0, 0), (p - 1, 0)))
    pp = pp.reshape(c, nz, ncy * p, ncx * p)
    v = v + jnp.pad(pp, ((0, 0), (0, 0), (1, 0), (1, 0)))
    return v


def _dirichlet_mask_pieces(p: int, dims, B: int, i, z0: int = 0,
                           ncz_global: int | None = None,
                           y0=0, ncy_global: int | None = None,
                           x0c=0, ncx_global: int | None = None):
    """Full-box Dirichlet mask in piece-row order, from iota (no HBM).

    Rows are the concatenated piece rows (p^2 mm, p mp, p pm, 1 pp) with the
    (ky, kx) mapping of :func:`_piece_perm`; columns are cells cy*ncx + cx.
    A node is constrained iff any of its global lattice coordinates is 0 or
    the axis maximum; per piece row that reduces to corner tests on
    (cy, ky) / (cx, kx) plus the grid-step test on the z-plane index.
    Returns a (p1, p1^2, B) float32 0/1 array.

    Distributed z-slabs: ``z0`` is this slab's global z-cell-layer offset and
    ``ncz_global`` the global layer count — the z Dirichlet faces then sit
    at GLOBAL layers 0 / ncz_global-1, and slab layers past the global top
    (dummy padding for non-divisible device counts) are masked entirely.
    2D (z, y) decomposition adds the same pair for the y cell rows:
    ``y0`` / ``ncy_global``; 3D adds ``x0c`` / ``ncx_global`` for the x
    cell columns.
    """
    ncz, ncy, ncx = dims
    if ncz_global is None:
        ncz_global = ncz
    if ncy_global is None:
        ncy_global = ncy
    if ncx_global is None:
        ncx_global = ncx
    p1 = p + 1
    p2 = p * p
    rows = p1 * p1
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, B), 1)
    cy, cx = col // ncx, col % ncx
    in_mm = r < p2
    in_mp = (r >= p2) & (r < p2 + p)
    in_pm = (r >= p2 + p) & (r < p2 + 2 * p)
    ky = jnp.where(in_mm, r // p, jnp.where(in_mp, r - p2, p))
    kx = jnp.where(in_mm, r % p, jnp.where(in_pm, r - p2 - p, p))
    gcy = y0 + cy  # global y-cell-row index
    ybad = (((gcy == 0) & (ky == 0)) | ((gcy == ncy_global - 1) & (ky == p))
            | (gcy >= ncy_global))
    gcx = x0c + cx  # global x-cell-column index
    xbad = (((gcx == 0) & (kx == 0)) | ((gcx == ncx_global - 1) & (kx == p))
            | (gcx >= ncx_global))
    kz = jax.lax.broadcasted_iota(jnp.int32, (p1, 1), 0)
    gz = z0 + i  # global z-cell-layer index
    zbad = (((gz == 0) & (kz == 0)) | ((gz == ncz_global - 1) & (kz == p))
            | (gz >= ncz_global))
    ok = (~(ybad | xbad))[None, :, :] & (~zbad)[:, :, None]
    return ok.astype(jnp.float32)


def _kernel_g_pieces(precision, n_comp, p, mask_dims, mats_ref, g6_ref,
                     mm_m, mm_p, mp_m, mp_p, pm_m, pm_p, pp_m, pp_p,
                     out_mm, out_mp, out_pm, out_pp, out_top, carry_ref):
    """Corner-piece z-layer kernel: in-VMEM assembly, carry-plane scatter.

    The four y/x corner pieces arrive separately (each with its own dual
    z-BlockSpecs for the overlapping +1 plane); rows are concatenated in
    VMEM and contracted against the column-PERMUTED dense matrices
    (:func:`_piece_perm`), so no interleaving shuffle ever happens.  With
    ``mask_dims`` set, the Dirichlet mask is computed from iota and applied
    to input and output in VMEM (:func:`_dirichlet_mask_pieces`).
    """
    p1 = p + 1
    p13 = mats_ref.shape[1]
    q3 = g6_ref.shape[0] // 6
    B = mm_m.shape[3]
    p2 = p * p
    i = pl.program_id(0)

    mask = None
    if mask_dims is not None:
        mask = _dirichlet_mask_pieces(p, mask_dims, B, i)

    planes = [jnp.concatenate([a[:], b[:]], axis=1)
              for a, b in ((mm_m, mm_p), (mp_m, mp_p),
                           (pm_m, pm_p), (pp_m, pp_p))]
    u = jnp.concatenate(planes, axis=2)  # (C, p1, p1^2, B)
    if mask is not None:
        # bf16 4D multiplies/reshapes hit unsupported Mosaic relayouts;
        # masking in f32 is free (the _mm precision modes re-round anyway)
        if u.dtype == jnp.bfloat16:
            u = u.astype(jnp.float32)
        u = u * mask[None].astype(u.dtype)
    u = u.reshape(n_comp * p13, B)

    m = mats_ref[:]
    g6 = g6_ref[:].reshape(6 * q3, B)
    g00, g01, g02 = g6[:q3], g6[q3:2 * q3], g6[2 * q3:3 * q3]
    g11, g12, g22 = g6[3 * q3:4 * q3], g6[4 * q3:5 * q3], g6[5 * q3:]
    dn_t = (((0,), (0,)), ((), ()))
    grads = []
    for c in range(n_comp):
        u_c = u[c * p13:(c + 1) * p13, :]
        grads.append(_mm(m, u_c, precision).reshape(3, q3, B))
    vs = []
    for g in grads:
        t0 = g00 * g[0] + g01 * g[1] + g02 * g[2]
        t1 = g01 * g[0] + g11 * g[1] + g12 * g[2]
        t2 = g02 * g[0] + g12 * g[1] + g22 * g[2]
        vs.append(_mm(m, jnp.concatenate([t0, t1, t2], axis=0),
                      precision, dims=dn_t))
    v = jnp.stack(vs, axis=0).reshape(n_comp, p1, p1 * p1, B)
    if mask is not None:
        v = v * mask[None]

    first = v[:, :1] + jnp.where(i > 0, carry_ref[:], 0.0)[:, None]
    # p == 1: the "middle planes" slice is empty — Mosaic rejects
    # zero-sized vectors, so concatenate only when there is a middle
    vmain = (first if p == 1
             else jnp.concatenate([first, v[:, 1:p]], axis=1))
    out_mm[:] = vmain[:, :, :p2].astype(out_mm.dtype)
    out_mp[:] = vmain[:, :, p2:p2 + p].astype(out_mp.dtype)
    out_pm[:] = vmain[:, :, p2 + p:p2 + 2 * p].astype(out_pm.dtype)
    out_pp[:] = vmain[:, :, p2 + 2 * p:].astype(out_pp.dtype)
    carry_ref[:] = v[:, p]
    out_top[:] = v[:, p:].astype(out_top.dtype)


def apply_lattice_pieces(op: PallasOperatorData, u: jax.Array,
                         interpret: bool | None = None) -> jax.Array:
    """Matvec with corner-piece windowing (windowing="pieces")."""
    import functools

    if op.gmetric is None:
        raise ValueError(
            "apply_lattice_pieces requires metric='precomputed'; "
            "metric='onthefly' operators run through the piece-resident "
            "paths (cg_fused_kernel.piece_vmult / fused_cg_iteration)")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    n_comp, nz, ny, nx = u.shape
    ncz = (nz - 1) // p
    B = ((ny - 1) // p) * ((nx - 1) // p)
    q3 = op.w3.shape[0]
    p13 = op.mats.shape[1]
    p2 = p * p

    mm, mp, pm, pp = _to_piece_forms(u, p)
    mask_dims = ((ncz, (ny - 1) // p, (nx - 1) // p)
                 if op.mask_mode == "iota" else None)

    def specs_for(rows):
        return [
            pl.BlockSpec((n_comp, p, rows, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, 1, rows, B),
                         lambda i: (0, i * p + p, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    outs = pl.pallas_call(
        functools.partial(_kernel_g_pieces, op.precision, n_comp, p,
                          mask_dims),
        grid=(ncz,),
        in_specs=[
            pl.BlockSpec((3 * q3, p13), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # 3D metric: lane-dim block == array dim (see zslab note)
            pl.BlockSpec((6 * q3, 1, 1, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            *specs_for(p2), *specs_for(p), *specs_for(p), *specs_for(1),
        ],
        out_specs=[
            pl.BlockSpec((n_comp, p, p2, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, p, p, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, p, p, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, p, 1, B), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, 1, p1 * p1, B), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_comp, ncz * p, p2, B), u.dtype),
            jax.ShapeDtypeStruct((n_comp, ncz * p, p, B), u.dtype),
            jax.ShapeDtypeStruct((n_comp, ncz * p, p, B), u.dtype),
            jax.ShapeDtypeStruct((n_comp, ncz * p, 1, B), u.dtype),
            jax.ShapeDtypeStruct((n_comp, 1, p1 * p1, B), u.dtype),
        ],
        scratch_shapes=[pltpu.VMEM(
            (n_comp, p1 * p1, B),
            jnp.float64 if u.dtype == jnp.float64 else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(op.mats, op.gmetric.reshape(6 * q3, ncz, 1, B),
      mm, mm, mp, mp, pm, pm, pp, pp)

    return _from_piece_forms(outs[:4], outs[4], p, (nz, ny, nx))


def apply_local_batched(op: PallasOperatorData, u_loc: jax.Array,
                        interpret: bool | None = None) -> jax.Array:
    """Run the fused kernel over all cell blocks.

    ``u_loc``: (C * p1^3, nc_pad) -> same shape (components flattened into
    rows — no sublane padding).  ``interpret=None`` selects the Pallas
    interpreter automatically on CPU backends (tests / fallback).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cp13, nc_pad = u_loc.shape
    p13 = op.mats.shape[1]
    n_comp = cp13 // p13
    B = op.block
    q3 = op.w3.shape[0]
    grid = (nc_pad // B,)

    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((cp13, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u_loc.shape, u_loc.dtype),
        # raise the scoped-VMEM budget above the 16 MB soft default: XLA may
        # additionally promote small while-loop carries into VMEM, and at
        # p=5 (q^3=343) the combined footprint overflows otherwise
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    if op.gmetric is not None:
        import functools

        flops_per_block = (6 * q3 * p13 * n_comp + 15 * q3 * n_comp) * B * 2
        return pl.pallas_call(
            functools.partial(_kernel_g, op.precision),
            in_specs=[
                pl.BlockSpec((3 * q3, p13), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6 * q3, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cp13, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops_per_block * grid[0],
                bytes_accessed=(2 * p13 * n_comp + 6 * q3) * nc_pad * 4,
                transcendentals=0,
            ),
            input_output_aliases={2: 0},
            **common,
        )(op.mats, op.gmetric, u_loc)

    flops_per_block = (6 * q3 * p13 * n_comp + 9 * q3 * 8 + 80 * q3) * B * 2
    return pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec((3 * q3, p13), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * q3, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q3, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp13, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * grid[0],
            bytes_accessed=(2 * p13 * n_comp + 24) * nc_pad * 4,
            transcendentals=0,
        ),
        # alias u_loc with the output: each component's result is written
        # only after that component's input is consumed, so reuse is safe
        # and halves the custom call's buffer footprint
        input_output_aliases={3: 0},
        **common,
    )(op.mats, op.pds, op.w3, u_loc, op.coeffs)


def _window_matrix(n_nodes: int, p: int) -> np.ndarray:
    """0/1 window-extraction matrix W of shape (p1*nc, N), k-major rows.

    Row (k*nc + c) selects node c*p + k: ``W @ u_axis`` extracts all
    overlapping (p+1)-node cell windows along one axis in one matmul, and
    ``W.T @ v`` is the exact adjoint (overlap-add).  The MXU does the
    structured-mesh gather/scatter as arithmetic — no strided slices, no
    scatter instruction.
    """
    nc = (n_nodes - 1) // p
    w = np.zeros(((p + 1) * nc, n_nodes))
    rows = (np.arange(p + 1)[:, None] * nc + np.arange(nc)[None, :]).ravel()
    cols = (np.arange(nc)[None, :] * p + np.arange(p + 1)[:, None]).ravel()
    w[rows, cols] = 1.0
    return w


def _to_cell_batches_mm(u: jax.Array, p: int, nc_pad: int,
                        ws: tuple[jax.Array, jax.Array, jax.Array]) -> jax.Array:
    """(C, Nz, Ny, Nx) -> (C * p1^3, nc_pad) via three windowing matmuls."""
    wz, wy, wx = ws
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("czyx,Xx->czyX", u, wx, precision=hi)
    t = jnp.einsum("czyX,Yy->czYX", t, wy, precision=hi)
    t = jnp.einsum("czYX,Zz->cZYX", t, wz, precision=hi)
    n_comp = t.shape[0]
    p1 = p + 1
    ncz = t.shape[1] // p1
    ncy = t.shape[2] // p1
    ncx = t.shape[3] // p1
    t = t.reshape(n_comp, p1, ncz, p1, ncy, p1, ncx)
    t = t.transpose(0, 1, 3, 5, 2, 4, 6)
    t = t.reshape(n_comp * p1**3, ncz * ncy * ncx)
    nc = ncz * ncy * ncx
    if nc_pad > nc:
        t = jnp.pad(t, ((0, 0), (0, nc_pad - nc)))
    return t


def _from_cell_batches_mm(v: jax.Array, p: int, n_cells_axis,
                          ws: tuple[jax.Array, jax.Array, jax.Array]
                          ) -> jax.Array:
    """Adjoint of :func:`_to_cell_batches_mm` (W^T accumulates overlaps)."""
    wz, wy, wx = ws
    hi = jax.lax.Precision.HIGHEST
    ncz, ncy, ncx = n_cells_axis
    nc = ncz * ncy * ncx
    p1 = p + 1
    n_comp = v.shape[0] // p1**3
    t = v[:, :nc].reshape(n_comp, p1, p1, p1, ncz, ncy, ncx)
    t = t.transpose(0, 1, 4, 2, 5, 3, 6)
    t = t.reshape(n_comp, p1 * ncz, p1 * ncy, p1 * ncx)
    t = jnp.einsum("cZYX,Zz->czYX", t, wz, precision=hi)
    t = jnp.einsum("czYX,Yy->czyX", t, wy, precision=hi)
    return jnp.einsum("czyX,Xx->czyx", t, wx, precision=hi)


def _conv_dn():
    return jax.lax.conv_dimension_numbers(
        (1, 1, 2, 2, 2), (2, 1, 1, 1, 1), ("NCDHW", "OIDHW", "NCDHW"))


def _to_cell_batches_conv(u: jax.Array, p: int, nc_pad: int) -> jax.Array:
    """(C, Nz, Ny, Nx) -> (C * p1^3, nc_pad) via a strided identity conv.

    Patch extraction with stride p IS a convolution with identity weights —
    the TPU's native im2col path: XLA lowers the windowing to one fused
    op instead of a chain of pad/slice/concat relayouts.  Output channel
    r of the identity enumerates (kz, ky, kx) with kx fastest, matching the
    dense gradient matrices' column order.
    """
    p1 = p + 1
    n_comp = u.shape[0]
    eye = jnp.eye(p1**3, dtype=u.dtype).reshape(p1**3, 1, p1, p1, p1)
    t = jax.lax.conv_general_dilated(
        u[:, None], eye, window_strides=(p, p, p), padding="VALID",
        dimension_numbers=_conv_dn(), precision=jax.lax.Precision.HIGHEST)
    t = t.reshape(n_comp * p1**3, -1)
    nc = t.shape[1]
    if nc_pad > nc:
        t = jnp.pad(t, ((0, 0), (0, nc_pad - nc)))
    return t


def _from_cell_batches_conv(v: jax.Array, p: int, n_cells_axis) -> jax.Array:
    """Adjoint of :func:`_to_cell_batches_conv`: transposed conv scatter-add."""
    ncz, ncy, ncx = n_cells_axis
    nc = ncz * ncy * ncx
    p1 = p + 1
    n_comp = v.shape[0] // p1**3
    t = v[:, :nc].reshape(n_comp, p1**3, ncz, ncy, ncx)
    eye = jnp.eye(p1**3, dtype=v.dtype).reshape(p1**3, 1, p1, p1, p1)
    out = jax.lax.conv_transpose(
        t, eye, strides=(p, p, p), padding="VALID",
        dimension_numbers=_conv_dn(), transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST)
    return out[:, 0]


def _to_cell_batches(u: jax.Array, p: int, nc_pad: int) -> jax.Array:
    """(C, Nz, Ny, Nx) lattice -> (C * p1^3, nc_pad) cell batches.

    Uses the transposed windowing (window dims before cell dims) so every
    intermediate keeps a large minor dimension — 4x faster than the naive
    interleaved form on TPU (see cellify_t).
    """
    t = cellify_t(u, 3, p)  # (C, Nz, Ny, p1, ncx)
    t = cellify_t(t, 2, p)  # (C, Nz, p1, ncy, p1, ncx)
    t = cellify_t(t, 1, p)  # (C, p1, ncz, p1, ncy, p1, ncx)
    t = t.transpose(0, 1, 3, 5, 2, 4, 6)  # (C, p1z, p1y, p1x, ncz, ncy, ncx)
    n_comp = t.shape[0]
    p13 = t.shape[1] * t.shape[2] * t.shape[3]
    nc = t.shape[4] * t.shape[5] * t.shape[6]
    t = t.reshape(n_comp * p13, nc)
    if nc_pad > nc:
        t = jnp.pad(t, ((0, 0), (0, nc_pad - nc)))
    return t


def _from_cell_batches(v: jax.Array, p: int, n_cells_axis) -> jax.Array:
    """(C * p1^3, nc_pad) -> (C, Nz, Ny, Nx) with overlap accumulation."""
    ncz, ncy, ncx = n_cells_axis
    nc = ncz * ncy * ncx
    p1 = p + 1
    n_comp = v.shape[0] // p1**3
    v = v[:, :nc].reshape(n_comp, p1, p1, p1, ncz, ncy, ncx)
    v = v.transpose(0, 1, 4, 2, 5, 3, 6)  # (C, p1z, ncz, p1y, ncy, p1x, ncx)
    v = overlap_add_t(v, 1, p)
    v = overlap_add_t(v, 2, p)
    v = overlap_add_t(v, 3, p)
    return v


def apply_lattice(op: PallasOperatorData, u: jax.Array,
                  interpret: bool | None = None) -> jax.Array:
    """Weak vector-Laplacian on the lattice via the fused kernel."""
    p1 = round(op.mats.shape[1] ** (1 / 3))
    p = p1 - 1
    nc_pad = op.coeffs.shape[2]
    ncz = (u.shape[1] - 1) // p
    ncy = (u.shape[2] - 1) // p
    ncx = (u.shape[3] - 1) // p
    if op.windowing == "zslab":
        return apply_lattice_zslab(op, u, interpret=interpret)
    if op.windowing == "pieces":
        return apply_lattice_pieces(op, u, interpret=interpret)
    if op.windowing == "matmul":
        u_loc = _to_cell_batches_mm(u, p, nc_pad, op.wmats)
        v_loc = apply_local_batched(op, u_loc, interpret=interpret)
        return _from_cell_batches_mm(v_loc, p, (ncz, ncy, ncx), op.wmats)
    if op.windowing == "conv":
        u_loc = _to_cell_batches_conv(u, p, nc_pad)
        v_loc = apply_local_batched(op, u_loc, interpret=interpret)
        return _from_cell_batches_conv(v_loc, p, (ncz, ncy, ncx))
    u_loc = _to_cell_batches(u, p, nc_pad)
    v_loc = apply_local_batched(op, u_loc, interpret=interpret)
    return _from_cell_batches(v_loc, p, (ncz, ncy, ncx))


def vmult(op: PallasOperatorData, u: jax.Array,
          constrained_identity: bool = True,
          interpret: bool | None = None) -> jax.Array:
    """Full operator with Dirichlet masking; semantics as ``laplace.vmult``."""
    if op.windowing == "zslab":
        # both mask applications happen inside the kernel (windowed mask)
        v = apply_lattice_zslab(op, u, interpret=interpret)
    elif op.windowing == "pieces" and op.mask_mode == "iota":
        # both mask applications happen inside the kernel (iota mask)
        v = apply_lattice_pieces(op, u, interpret=interpret)
    else:
        v = apply_lattice(op, u * op.mask, interpret=interpret) * op.mask
    if constrained_identity:
        v = v + u * (1.0 - op.mask)
    return v
