"""Distributed fused-kernel CG: N-device == 1-device parity.

The fused whole-iteration kernel under shard_map must reproduce the
single-device fused solve exactly (f64): identical iteration counts and
solutions, across divisible and non-divisible device counts — the
"multi-node without a cluster" check of SURVEY.md §4(d) for the round-2
headline solver path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mf_data_locality_tpu.models import bp4
from mf_data_locality_tpu.parallel import dist_fused, distributed as dist
from mf_data_locality_tpu.solvers import cg_fused


def _single(s, p, dtype=jnp.float64, precision="highest"):
    problem = bp4.build(s, p, dtype=dtype, backend="pallas",
                        precision=precision, windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)
    res = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat)
    return res, lataxis


@pytest.mark.parametrize("s,p,D", [(6, 2, 4), (6, 1, 8), (6, 3, 2)])
def test_dist_fused_matches_single(s, p, D):
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.float64)
    res = dist_fused.solve_fused(dp, mesh)
    assert int(res.n_iterations) == int(ref.n_iterations)
    assert bool(res.converged)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))
    n = int(ref.n_iterations) + 1
    np.testing.assert_allclose(np.asarray(res.res_history)[:n],
                               np.asarray(ref.res_history)[:n],
                               rtol=1e-6, atol=1e-8 * float(ref.res_history[0]))


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_dist_fused_2level_mesh_matches_single(shape):
    """2-level (DCN x ICI) slice-of-slices mesh == 1 device, exactly.

    The z slabs shard over BOTH named axes (flattened row-major): slab
    halos at slice boundaries cross the outer (DCN) axis and the single
    7-scalar psum spans both axes — the capability analog of the
    reference's MPI ranks spanning nodes (``benchmark.h:79``).
    """
    s, p = 6, 2
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused_2level(s, p, mesh_shape=shape,
                                                  dtype=jnp.float64)
    assert mesh.axis_names == (dist_fused.AXIS_DCN, dist_fused.AXIS)
    res = dist_fused.solve_fused(dp, mesh,
                                 axis=(dist_fused.AXIS_DCN, dist_fused.AXIS))
    assert int(res.n_iterations) == int(ref.n_iterations)
    assert bool(res.converged)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))
    n = int(ref.n_iterations) + 1
    np.testing.assert_allclose(np.asarray(res.res_history)[:n],
                               np.asarray(ref.res_history)[:n],
                               rtol=1e-6, atol=1e-8 * float(ref.res_history[0]))


@pytest.mark.parametrize("D", [3, 5])
def test_dist_fused_nondivisible_devices(D):
    """ncz % D != 0: trailing dummy layers must not perturb the solve."""
    s, p = 7, 2  # ncz = 8
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.float64)
    res = dist_fused.solve_fused(dp, mesh)
    assert int(res.n_iterations) == int(ref.n_iterations)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))


def test_dist_fused_fold_variant():
    s, p, D = 6, 2, 4
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.float64)
    res = dist_fused.solve_fused(dp, mesh, fold=True)
    assert int(res.n_iterations) == int(ref.n_iterations)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    np.testing.assert_allclose(xg, np.asarray(ref.x), atol=1e-11 * 200.0)


def test_dist_fused_x0_start():
    s, p, D = 6, 2, 4
    problem = bp4.build(s, p, dtype=jnp.float64, backend="pallas",
                        windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    rng = np.random.default_rng(5)
    x0_lat = (jnp.asarray(rng.standard_normal((3,) + lataxis))
              * problem.op.mask)
    ref = cg_fused.fused_merged_cg_solve(
        problem.op, lataxis, problem.b.reshape((3,) + lataxis),
        problem.inv_diag.reshape((1,) + lataxis), x0=x0_lat)
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.float64)
    # slab the x0 lattice into the replicated-plane convention
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    Pp = (dp.b.shape[2] - 1)
    x0_sl = np.stack([np.asarray(x0_lat)[:, d * Pp:d * Pp + Pp + 1]
                      for d in range(D)])
    x0_sh = jax.device_put(jnp.asarray(x0_sl),
                           NamedSharding(mesh, P(dist_fused.AXIS)))
    res = dist_fused.solve_fused(dp, mesh, x0=x0_sh)
    assert int(res.n_iterations) == int(ref.n_iterations)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-10 * max(1.0, np.abs(xr).max()))


def test_dist_fused_bf16_storage_converges():
    s, p, D = 6, 2, 4
    p32 = bp4.build(s, p, dtype=jnp.float32, backend="pallas",
                    windowing="pieces")
    lataxis = p32.layout.n_nodes_axis
    r32 = cg_fused.fused_merged_cg_solve(
        p32.op, lataxis, p32.b.reshape((3,) + lataxis),
        p32.inv_diag.reshape((1,) + lataxis))
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.bfloat16)
    res = dist_fused.solve_fused(dp, mesh)
    assert bool(res.converged)
    assert abs(int(res.n_iterations) - int(r32.n_iterations)) <= 6


@pytest.mark.parametrize("s,p,D", [(7, 2, 2), (7, 2, 3), (6, 3, 2)])
def test_dist_fused_overlap_matches_single(s, p, D):
    """Comm/compute-overlap split (interior + boundary kernel calls) must
    reproduce the single-device solve exactly — same iteration counts and
    solutions (VERDICT round-2 item 3); covers divisible (s=7 -> ncz=4,
    D=2: 2 layers/device) and non-divisible (D=3: 2 layers + dummy
    padding) z-layer counts.  NOTE from_s puts z on the smallest axis
    (ncz = 2^(s//3)), so D=4 at s=7 would be the 1-layer fallback."""
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.float64)
    res = dist_fused.solve_fused(dp, mesh, overlap=True)
    assert int(res.n_iterations) == int(ref.n_iterations)
    assert bool(res.converged)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))
    n = int(ref.n_iterations) + 1
    np.testing.assert_allclose(np.asarray(res.res_history)[:n],
                               np.asarray(ref.res_history)[:n],
                               rtol=1e-6, atol=1e-8 * float(ref.res_history[0]))


def test_dist_fused_overlap_single_layer_fallback():
    """ncz_loc == 1 has no interior layers: overlap must fall back to the
    unsplit kernel and still match."""
    s, p, D = 6, 2, 4  # ncz = 4 -> 1 layer/device
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.float64)
    res = dist_fused.solve_fused(dp, mesh, overlap=True)
    assert int(res.n_iterations) == int(ref.n_iterations)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))


@pytest.mark.parametrize("s,p,Dz,Dy", [
    (7, 2, 2, 2),   # divisible: ncz=4, ncy=8 -> 2x4 rows/device
    (6, 2, 2, 2),   # ncz=4, ncy=4 -> 2 rows/device
    (6, 3, 2, 2),   # p=3
    (7, 2, 2, 3),   # non-divisible y: ncy=8 over 3 -> 3+3+2 (dummy rows)
    (6, 2, 1, 4),   # pure-y split (Dz=1), 1 row/device
])
def test_dist_fused_2d_matches_single(s, p, Dz, Dy):
    """2D (z, y) fused decomposition == single device exactly (VERDICT
    round-2 item 4): same iteration counts, history and solution, across
    divisible and non-divisible y cell-row counts."""
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused_2d(s, p, (Dz, Dy),
                                              dtype=jnp.float64)
    res = dist_fused.solve_fused_2d(dp, mesh)
    assert int(res.n_iterations) == int(ref.n_iterations)
    assert bool(res.converged)
    xg = dist.gather_global_2d(res.x, nz=lataxis[0], ny=lataxis[1])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))
    n = int(ref.n_iterations) + 1
    np.testing.assert_allclose(np.asarray(res.res_history)[:n],
                               np.asarray(ref.res_history)[:n],
                               rtol=1e-6, atol=1e-8 * float(ref.res_history[0]))


@pytest.mark.parametrize("s,p,Dz,Dy,Dx", [
    (7, 2, 1, 1, 2),   # pure-x split: ncx=8 -> 4 columns/device
    (7, 2, 2, 2, 2),   # full 3D: (4, 4, 8) cells over 2x2x2
    (6, 3, 2, 2, 2),   # p=3, (4, 4, 4) cells
    (7, 2, 1, 1, 3),   # non-divisible x: ncx=8 over 3 -> 3+3+2 (dummies)
    (7, 2, 2, 1, 4),   # (z, x) split without y
])
def test_dist_fused_3d_matches_single(s, p, Dz, Dy, Dx):
    """3D (z, y, x) fused decomposition == single device exactly: same
    iteration counts, history and solution, across divisible and
    non-divisible x cell-column counts (VERDICT P1 completion: the fused
    production solver now covers 1D/2D/3D like the merged solver)."""
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused_3d(s, p, (Dz, Dy, Dx),
                                              dtype=jnp.float64)
    res = dist_fused.solve_fused_3d(dp, mesh)
    assert int(res.n_iterations) == int(ref.n_iterations)
    assert bool(res.converged)
    xg = dist.gather_global_3d(res.x, nz=lataxis[0], ny=lataxis[1],
                               nx=lataxis[2])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))
    n = int(ref.n_iterations) + 1
    np.testing.assert_allclose(np.asarray(res.res_history)[:n],
                               np.asarray(ref.res_history)[:n],
                               rtol=1e-6, atol=1e-8 * float(ref.res_history[0]))


@pytest.mark.parametrize("s,p,D", [(6, 2, 4), (6, 3, 3)])
def test_dist_fused_onthefly_matches_single(s, p, D):
    """Distributed fused solve with metric='onthefly' (slab operators
    carry 24 coefficients/cell, no precomputed metric; p=3 exercises the
    odd-q row padding) == single-device f64 reference.  D=3 at ncz=4 also
    covers the non-divisible dummy-layer case."""
    ref, lataxis = _single(s, p)
    dp, mesh = dist_fused.build_dist_fused(s, p, n_devices=D,
                                           dtype=jnp.float64,
                                           metric="onthefly")
    res = dist_fused.solve_fused(dp, mesh)
    assert int(res.n_iterations) == int(ref.n_iterations)
    assert bool(res.converged)
    xg = dist.gather_global(res.x, nz=lataxis[0])
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(xg, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))


def test_dist_fused_2d_3d_onthefly_matches_single():
    """2D (z, y) and 3D (z, y, x) fused decompositions with
    metric='onthefly' == single-device f64 reference."""
    s, p = 6, 2
    ref, lataxis = _single(s, p)
    xr = np.asarray(ref.x)
    dp2, mesh2 = dist_fused.build_dist_fused_2d(s, p, (2, 2),
                                                dtype=jnp.float64,
                                                metric="onthefly")
    r2 = dist_fused.solve_fused_2d(dp2, mesh2)
    assert int(r2.n_iterations) == int(ref.n_iterations)
    xg2 = dist.gather_global_2d(r2.x, nz=lataxis[0], ny=lataxis[1])
    np.testing.assert_allclose(xg2, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))
    dp3, mesh3 = dist_fused.build_dist_fused_3d(s, p, (2, 2, 2),
                                                dtype=jnp.float64,
                                                metric="onthefly")
    r3 = dist_fused.solve_fused_3d(dp3, mesh3)
    assert int(r3.n_iterations) == int(ref.n_iterations)
    xg3 = dist.gather_global_3d(r3.x, nz=lataxis[0], ny=lataxis[1],
                                nx=lataxis[2])
    np.testing.assert_allclose(xg3, xr,
                               atol=1e-11 * max(1.0, np.abs(xr).max()))
