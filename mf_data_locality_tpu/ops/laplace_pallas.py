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
    block: int = field(metadata=dict(static=True), default=128)
    n_cells: int = field(metadata=dict(static=True), default=0)


def make_pallas_operator(layout: DofLayout, n_q: int | None = None,
                         dtype=jnp.float32,
                         block: int | None = None) -> PallasOperatorData:
    p = layout.degree
    q = n_q if n_q is not None else p + 2
    shape = lagrange.make_shape(p, q)
    B = block or _block_size(p)
    # small meshes: don't pad beyond the cell count (lane-aligned)
    B = min(B, max(128, -(-layout.mesh.n_cells // 128) * 128))

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

    nz, ny, nx = layout.n_nodes_axis
    mask = (~layout.boundary_node_mask).reshape(1, nz, ny, nx)
    return PallasOperatorData(
        mats=jnp.asarray(mats, dtype=dtype),
        pds=jnp.asarray(pds, dtype=dtype),
        w3=jnp.asarray(w3, dtype=dtype),
        coeffs=jnp.asarray(co, dtype=dtype),
        mask=jnp.asarray(mask, dtype=dtype),
        block=B,
        n_cells=nc,
    )


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
        u_c = u_ref[c * p13:(c + 1) * p13, :]  # (p13, B)
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

    flops_per_block = (6 * q3 * p13 * n_comp + 9 * q3 * 8 + 80 * q3) * B * 2
    return pl.pallas_call(
        _kernel,
        grid=grid,
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
        out_specs=pl.BlockSpec((cp13, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u_loc.shape, u_loc.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * grid[0],
            bytes_accessed=(2 * p13 * n_comp + 24) * nc_pad * 4,
            transcendentals=0,
        ),
        # alias u_loc with the output: each component's result is written
        # only after that component's input is consumed, so reuse is safe
        # and halves the custom call's buffer footprint
        input_output_aliases={3: 0},
        # raise the scoped-VMEM budget above the 16 MB soft default: XLA may
        # additionally promote small while-loop carries into VMEM, and at
        # p=5 (q^3=343) the combined footprint overflows otherwise
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(op.mats, op.pds, op.w3, u_loc, op.coeffs)


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
    u_loc = _to_cell_batches(u, p, nc_pad)
    v_loc = apply_local_batched(op, u_loc, interpret=interpret)
    return _from_cell_batches(v_loc, p, (ncz, ncy, ncx))


def vmult(op: PallasOperatorData, u: jax.Array,
          constrained_identity: bool = True,
          interpret: bool | None = None) -> jax.Array:
    """Full operator with Dirichlet masking; semantics as ``laplace.vmult``."""
    v = apply_lattice(op, u * op.mask, interpret=interpret) * op.mask
    if constrained_identity:
        v = v + u * (1.0 - op.mask)
    return v
