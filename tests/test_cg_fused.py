"""Fused whole-iteration CG kernel: parity with the merged solver.

The fused path must reproduce the merged recurrence exactly
(``solver_cg_optimized.h:190-302``): identical iteration counts, matching
residual histories, matching solutions.  Run in f64 interpret mode so the
comparison is at full precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mf_data_locality_tpu.models import bp4
from mf_data_locality_tpu.ops import cg_fused_kernel as fk
from mf_data_locality_tpu.solvers import cg_fused, cg_merged


def _setup(s, p, dtype=jnp.float64, precision="highest"):
    problem = bp4.build(s, p, dtype=dtype, backend="pallas",
                        precision=precision, windowing="pieces")
    lataxis = problem.layout.n_nodes_axis
    b_lat = problem.b.reshape((3,) + lataxis)
    prec_lat = problem.inv_diag.reshape((1,) + lataxis)
    return problem, lataxis, b_lat, prec_lat


@pytest.mark.parametrize("s,p", [(5, 1), (6, 2), (6, 3)])
def test_piece_state_roundtrip(s, p):
    problem, lataxis, _, _ = _setup(s, p)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((3,) + lataxis))
    u = u * problem.op.mask  # boundary-zero invariant of the solver state
    st = fk.to_piece_state(u, p)
    u2 = fk.from_piece_state(st, p, lataxis)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-14)


@pytest.mark.parametrize("s,p", [(5, 1), (6, 2), (6, 3), (6, 4)])
def test_fused_matches_merged_f64(s, p):
    problem, lataxis, b_lat, prec_lat = _setup(s, p)
    ref = cg_merged.merged_cg_solve(problem.a_apply, problem.b,
                                    problem.inv_diag)
    res = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat)
    assert int(res.n_iterations) == int(ref.n_iterations)
    n = int(ref.n_iterations) + 1
    hr = np.asarray(ref.res_history)[:n]
    hf = np.asarray(res.res_history)[:n]
    # the in-kernel per-layer dot accumulation orders f64 rounding
    # differently; deep in a long solve the residuals below ~1e-8*res0
    # (the convergence tolerance itself) drift a few percent relative
    # while the iterate and iteration count stay identical
    np.testing.assert_allclose(hf, hr, rtol=1e-6, atol=1e-8 * hr[0])
    xr = np.asarray(ref.x).reshape(3, -1)
    xf = np.asarray(res.x).reshape(3, -1)
    np.testing.assert_allclose(xf, xr, atol=1e-10 * max(1.0, np.abs(xr).max()))


@pytest.mark.parametrize("s,p", [(5, 1), (6, 2), (6, 3)])
def test_compact_matches_full(s, p):
    """mm-only compact state == full piece-row state (f64)."""
    problem, lataxis, b_lat, prec_lat = _setup(s, p)
    r0 = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat,
                                        compact=False)
    r1 = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat,
                                        compact=True)
    assert int(r0.n_iterations) == int(r1.n_iterations)
    x0 = np.asarray(r0.x)
    x1 = np.asarray(r1.x)
    np.testing.assert_allclose(x1, x0, atol=1e-11 * max(1.0, np.abs(x0).max()))


def test_expand_reduce_mm_roundtrip():
    """_reduce_mm == _make_consistent on mm rows; _expand_mm inverts."""
    from mf_data_locality_tpu.ops.laplace_pallas import _dirichlet_mask_pieces

    p, ncy, ncx = 2, 4, 4
    p1, p2, R, B = p + 1, p * p, (p + 1) ** 2, 16
    rng = np.random.default_rng(7)
    v = rng.standard_normal((3, p1, R, B))
    mask = np.asarray(jax.jit(lambda: _dirichlet_mask_pieces(
        p, (10 ** 9, ncy, ncx), B, jnp.asarray(5)))())
    v = v * mask[None]
    cons = np.asarray(jax.jit(
        lambda a: fk._make_consistent(a, p, ncx))(jnp.asarray(v)))
    red = np.asarray(jax.jit(
        lambda a: fk._reduce_mm(a, p, ncx))(jnp.asarray(v)))
    np.testing.assert_allclose(red, cons[:, :, :p2], atol=1e-13)
    exp = np.asarray(jax.jit(
        lambda a: fk._expand_mm(a, p, ncx))(jnp.asarray(cons[:, :, :p2])))
    np.testing.assert_allclose(exp, cons, atol=0)


@pytest.mark.parametrize("s,p", [(5, 1), (6, 2), (6, 3)])
def test_fold_matches_unfolded(s, p):
    """Lane-folded state (one 3x-wide MXU call) == per-component form."""
    problem, lataxis, b_lat, prec_lat = _setup(s, p)
    r0 = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat,
                                        fold=False)
    r1 = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat,
                                        fold=True)
    assert int(r0.n_iterations) == int(r1.n_iterations)
    x0 = np.asarray(r0.x)
    x1 = np.asarray(r1.x)
    np.testing.assert_allclose(x1, x0, atol=1e-11 * max(1.0, np.abs(x0).max()))


def test_fold_state_roundtrip():
    rng = np.random.default_rng(9)
    v = jnp.asarray(rng.standard_normal((3, 8, 9, 16)))
    f = fk.fold_state(v)
    assert f.shape == (1, 8, 9, 48)
    np.testing.assert_array_equal(np.asarray(fk.unfold_state(f, 3)),
                                  np.asarray(v))


@pytest.mark.parametrize("s,p,L,compact", [
    (5, 1, 1, False), (6, 2, 1, False), (6, 2, 2, False), (6, 3, 2, False),
    (5, 1, 1, True), (6, 2, 1, True), (6, 3, 1, True)])
def test_piece_vmult_matches_lattice(s, p, L, compact):
    """Piece-resident matvec == lattice vmult (boundary-zero input).

    ``compact=True`` is the benchmark's fused-matvec timing path
    (mm-only state, benchmark.py) — pinned here so a regression in the
    compact branch cannot ship as a wrong timed operator.
    """
    import mf_data_locality_tpu.ops.laplace_pallas as lp

    problem, lataxis, _, _ = _setup(s, p)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((3,) + lataxis)) * problem.op.mask
    ref = lp.vmult(problem.op, u, constrained_identity=False)
    dpc = fk.to_piece_state(u, p)
    if compact:
        dpc = dpc[:, :, :p * p]
    zd = fk.zplanes_init(dpc, p)
    h, zh = fk.piece_vmult(problem.op, lataxis, dpc, zd, layers_per_step=L,
                           compact=compact)
    np.testing.assert_allclose(np.asarray(zh), np.asarray(h)[:, ::p],
                               atol=0)
    if compact:
        h = fk._expand_mm(h, p, (lataxis[2] - 1) // p)
    h_lat = fk.from_piece_state(h, p, lataxis)
    np.testing.assert_allclose(np.asarray(h_lat), np.asarray(ref),
                               atol=1e-12)


def test_fused_high_degree_dispatch():
    """The fused path covers the reference's full degree range: p=7 on a
    tiny mesh (benchmark.h:290-313 dispatches p=1..11)."""
    problem, lataxis, b_lat, prec_lat = _setup(3, 7)
    ref = cg_merged.merged_cg_solve(problem.a_apply, problem.b,
                                    problem.inv_diag)
    r = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat)
    assert int(r.n_iterations) == int(ref.n_iterations)
    xr = np.asarray(ref.x).reshape(3, -1)
    xf = np.asarray(r.x).reshape(3, -1)
    np.testing.assert_allclose(xf, xr,
                               atol=1e-6 * max(1.0, np.abs(xr).max()))


def test_zplanes_init_selects_boundary_planes():
    rng = np.random.default_rng(11)
    p = 3
    v = jnp.asarray(rng.standard_normal((2, 4 * p, 16, 8)))
    z = fk.zplanes_init(v, p)
    assert z.shape == (2, 4, 16, 8)
    np.testing.assert_array_equal(np.asarray(z),
                                  np.asarray(v)[:, ::p])


def test_scalar_recurrence_matches_merged_solver():
    """The shared recurrence helper reproduces cg_merged's coefficients.

    Feed the same 7 sums through fk.scalar_recurrence and through one
    in-situ merged-CG iteration (p=1 tiny problem) and compare alpha/beta
    and the sigma-trick residual.
    """
    problem, lataxis, b_lat, prec_lat = _setup(5, 1)
    ref = cg_merged.merged_cg_solve(problem.a_apply, problem.b,
                                    problem.inv_diag)
    res = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                         prec_lat)
    # identical residual histories imply identical alpha/beta sequences
    n = int(ref.n_iterations) + 1
    np.testing.assert_allclose(np.asarray(res.res_history)[:n],
                               np.asarray(ref.res_history)[:n], rtol=1e-10)


def test_fused_x0_start():
    problem, lataxis, b_lat, prec_lat = _setup(6, 2)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.standard_normal(b_lat.shape)) * problem.op.mask
    ref = cg_merged.merged_cg_solve(problem.a_apply, problem.b,
                                    problem.inv_diag,
                                    x0=x0.reshape(problem.b.shape))
    res = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat,
                                         x0=x0)
    assert int(res.n_iterations) == int(ref.n_iterations)
    xr = np.asarray(ref.x).reshape(3, -1)
    xf = np.asarray(res.x).reshape(3, -1)
    np.testing.assert_allclose(xf, xr, atol=1e-9 * max(1.0, np.abs(xr).max()))


def test_fused_bf16_storage_converges():
    """bf16 d/h storage with f32 recurrence: same contract as merged bf16."""
    p32, lataxis, b32, prec32 = _setup(6, 2, dtype=jnp.float32)
    res32 = cg_fused.fused_merged_cg_solve(p32.op, lataxis, b32, prec32)
    p16, _, b16, prec16 = _setup(6, 2, dtype=jnp.bfloat16)
    res16 = cg_fused.fused_merged_cg_solve(p16.op, lataxis, b16, prec16)
    assert bool(res16.converged)
    assert abs(int(res16.n_iterations) - int(res32.n_iterations)) <= 6


def test_x_dtype_bf16_iteration_path_exact():
    """bf16-x-only storage (VERDICT r5 item 3): x feeds no residual
    recurrence, so the ITERATION PATH must be identical to the f32-x solve
    (same counts, same residual history to roundoff); only the delivered x
    is bf16-rounded."""
    problem, lataxis, b_lat, prec_lat = _setup(6, 2)
    ref = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                         prec_lat)
    res = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                         prec_lat, x_dtype=jnp.bfloat16)
    assert bool(res.converged)
    assert int(res.n_iterations) == int(ref.n_iterations)
    n = int(ref.n_iterations) + 1
    np.testing.assert_array_equal(np.asarray(res.res_history)[:n],
                                  np.asarray(ref.res_history)[:n])
    xr = np.asarray(ref.x)
    # delivered solution: bf16-rounding class relative to |x|
    np.testing.assert_allclose(np.asarray(res.x), xr,
                               atol=2e-2 * max(1.0, np.abs(xr).max()))


def test_consistency_matches_overlap_add():
    """_make_consistent == overlap-add assembly then re-window (per layer)."""
    p, ncy, ncx = 2, 4, 4
    p1 = p + 1
    R = p1 * p1
    B = ncy * ncx
    ny, nx = ncy * p + 1, ncx * p + 1
    rng = np.random.default_rng(7)
    v = rng.standard_normal((2, p1, R, B))
    # zero the global-face copies (the kernel masks before consistency)
    from mf_data_locality_tpu.ops.laplace_pallas import _dirichlet_mask_pieces
    mask = np.asarray(jax.jit(
        lambda: _dirichlet_mask_pieces(p, (10**9, ncy, ncx), B,
                                       jnp.asarray(5)))())
    v = v * mask[None]
    out = np.asarray(jax.jit(
        lambda a: fk._make_consistent(a, p, ncx))(jnp.asarray(v)))
    # reference: assemble each z-row by overlap-add, then re-extract copies
    p2 = p * p
    for kz in range(p1):
        lat = np.zeros((2, ny, nx))
        idx = {}
        for r in range(R):
            if r < p2:
                ky, kx = r // p, r % p
            elif r < p2 + p:
                ky, kx = r - p2, p
            elif r < p2 + 2 * p:
                ky, kx = p, r - p2 - p
            else:
                ky, kx = p, p
            idx[r] = (ky, kx)
        for r in range(R):
            ky, kx = idx[r]
            for cy in range(ncy):
                for cx in range(ncx):
                    lat[:, cy * p + ky, cx * p + kx] += v[:, kz, r, cy * ncx + cx]
        for r in range(R):
            ky, kx = idx[r]
            for cy in range(ncy):
                for cx in range(ncx):
                    np.testing.assert_allclose(
                        out[:, kz, r, cy * ncx + cx],
                        lat[:, cy * p + ky, cx * p + kx],
                        atol=1e-12, err_msg=f"kz={kz} r={r} cy={cy} cx={cx}")


def test_bf16_metric_operator_error_and_convergence():
    """bf16 metric storage: ~2e-3 operator error class, CG still converges."""
    import mf_data_locality_tpu.ops.laplace_pallas as lp
    from mf_data_locality_tpu.mesh.box import BoxMesh
    from mf_data_locality_tpu.mesh.dofs import DofLayout

    layout = DofLayout(BoxMesh.from_s(6), 2)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((3,) + layout.n_nodes_axis),
                    jnp.float32)
    op32 = lp.make_pallas_operator(layout, dtype=jnp.float32,
                                   windowing="pieces")
    op16 = lp.make_pallas_operator(layout, dtype=jnp.float32,
                                   windowing="pieces",
                                   metric_dtype=jnp.bfloat16)
    v32 = np.asarray(lp.vmult(op32, u))
    v16 = np.asarray(lp.vmult(op16, u))
    rel = np.abs(v16 - v32).max() / np.abs(v32).max()
    assert rel < 2e-2, rel

    problem, lataxis, b_lat, prec_lat = _setup(6, 2, dtype=jnp.float32)
    op16b = lp.make_pallas_operator(DofLayout(BoxMesh.from_s(6), 2),
                                    dtype=jnp.float32, windowing="pieces",
                                    precision="bf16",
                                    metric_dtype=jnp.bfloat16)
    res = cg_fused.fused_merged_cg_solve(op16b, lataxis, b_lat, prec_lat)
    ref = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat, prec_lat)
    assert bool(res.converged)
    assert abs(int(res.n_iterations) - int(ref.n_iterations)) <= 8


@pytest.mark.parametrize("s,p", [(6, 2), (6, 3)])
def test_x_skip_exact(s, p):
    """The x-skip variant (elide x's read/write on non-pay iterations via
    lax.cond; solver_cg_optimized.h:132-160's deferred-x steady state) must
    be bitwise-equivalent: same iterations, history, and solution."""
    problem, lataxis, b_lat, prec_lat = _setup(s, p)
    ref = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                         prec_lat)
    res = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                         prec_lat, x_skip=True)
    assert int(res.n_iterations) == int(ref.n_iterations)
    n = int(ref.n_iterations) + 1
    np.testing.assert_allclose(np.asarray(res.res_history)[:n],
                               np.asarray(ref.res_history)[:n], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-13)


def test_prec_dtype_bf16_converges():
    """bf16 preconditioner storage (vector_access_reduced.h capability
    slot): a ~0.4% Jacobi perturbation — same-quality solution, iteration
    count within a small delta."""
    problem, lataxis, b_lat, prec_lat = _setup(6, 3)
    ref = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                         prec_lat)
    res = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                         prec_lat, prec_dtype=jnp.bfloat16)
    assert bool(res.converged)
    assert abs(int(res.n_iterations) - int(ref.n_iterations)) <= 3
    xr = np.asarray(ref.x)
    np.testing.assert_allclose(np.asarray(res.x), xr,
                               atol=1e-6 * max(1.0, np.abs(xr).max()))


@pytest.mark.parametrize("s,p", [(6, 2), (6, 3), (4, 5)])
def test_onthefly_metric_matches_precomputed(s, p):
    """pieces + metric='onthefly': the in-kernel Jacobian rebuild
    (cg_fused_kernel._metric_onthefly — the reference's on-the-fly
    geometry, poisson_operator.h:470-520) must reproduce the streamed
    precomputed metric: same matvec, same solve.  p=3 and p=5 exercise
    the odd-q row padding (q^3 -> next sublane multiple, zero no-op
    rows)."""
    problem, lataxis, b_lat, prec_lat = _setup(s, p)
    potf = bp4.build(s, p, dtype=jnp.float64, backend="pallas",
                     precision="highest", windowing="pieces",
                     metric="onthefly")
    assert potf.op.gmetric is None

    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((3,) + lataxis)) * problem.op.mask
    dpc = fk.to_piece_state(u, p)[:, :, :p * p]
    zd = fk.zplanes_init(dpc, p)
    h0, _ = fk.piece_vmult(problem.op, lataxis, dpc, zd, compact=True)
    h1, _ = fk.piece_vmult(potf.op, lataxis, dpc, zd, compact=True)
    scale = float(jnp.max(jnp.abs(h0)))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               atol=1e-12 * scale)

    r0 = cg_fused.fused_merged_cg_solve(problem.op, lataxis, b_lat,
                                        prec_lat)
    r1 = cg_fused.fused_merged_cg_solve(potf.op, lataxis, b_lat, prec_lat)
    assert int(r1.n_iterations) == int(r0.n_iterations)
    xr = np.asarray(r0.x)
    np.testing.assert_allclose(np.asarray(r1.x), xr,
                               atol=1e-10 * max(1.0, np.abs(xr).max()))


def test_onthefly_metric_guards():
    """onthefly has no lattice-form pieces matvec — it must fail loudly,
    not silently misbehave."""
    import mf_data_locality_tpu.ops.laplace_pallas as lp

    potf = bp4.build(6, 2, dtype=jnp.float64, backend="pallas",
                     precision="highest", windowing="pieces",
                     metric="onthefly")
    lataxis = potf.layout.n_nodes_axis
    b_lat = potf.b.reshape((3,) + lataxis)
    with pytest.raises(ValueError, match="onthefly"):
        lp.apply_lattice_pieces(potf.op, b_lat)


@pytest.mark.parametrize("s,p", [(6, 3), (4, 5)])
def test_onthefly_twostage_matches_precomputed(s, p):
    """metric='onthefly' under the twostage factorization: the per-qz
    Jacobian rebuild concatenated into the (q^2, qB) twostage metric
    layout must reproduce the streamed metric's solve (p=5 exercises the
    q^2 row padding: 49 -> 56)."""
    problem, lataxis, b_lat, prec_lat = _setup(s, p)
    pb0 = bp4.build(s, p, dtype=jnp.float64, backend="pallas",
                    precision="highest", windowing="pieces",
                    factor="twostage")
    pb1 = bp4.build(s, p, dtype=jnp.float64, backend="pallas",
                    precision="highest", windowing="pieces",
                    factor="twostage", metric="onthefly")
    r0 = cg_fused.fused_merged_cg_solve(pb0.op, lataxis, b_lat, prec_lat)
    r1 = cg_fused.fused_merged_cg_solve(pb1.op, lataxis, b_lat, prec_lat)
    assert int(r1.n_iterations) == int(r0.n_iterations)
    xr = np.asarray(r0.x)
    np.testing.assert_allclose(np.asarray(r1.x), xr,
                               atol=1e-10 * max(1.0, np.abs(xr).max()))


def test_fused_x0_start_onthefly():
    """x0 shift with metric='onthefly': the residual equation's A x0 apply
    must route through the piece-resident matvec (the lattice-form pieces
    matvec requires the streamed metric) and match the merged solver."""
    problem, lataxis, b_lat, prec_lat = _setup(6, 2)
    potf = bp4.build(6, 2, dtype=jnp.float64, backend="pallas",
                     precision="highest", windowing="pieces",
                     metric="onthefly")
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.standard_normal(b_lat.shape)) * problem.op.mask
    ref = cg_merged.merged_cg_solve(problem.a_apply, problem.b,
                                    problem.inv_diag,
                                    x0=x0.reshape(problem.b.shape))
    res = cg_fused.fused_merged_cg_solve(potf.op, lataxis, b_lat, prec_lat,
                                         x0=x0)
    assert int(res.n_iterations) == int(ref.n_iterations)
    xr = np.asarray(ref.x).reshape(3, -1)
    xf = np.asarray(res.x).reshape(3, -1)
    np.testing.assert_allclose(xf, xr, atol=1e-9 * max(1.0, np.abs(xr).max()))


def test_fused_bf16_storage_onthefly_matches_precomputed():
    """bf16 d/h storage x onthefly geometry: the rebuild runs at the f32
    accumulation dtype regardless of the stream dtype, so the solve must
    match the precomputed-metric bf16 run iteration-for-iteration."""
    pb0 = bp4.build(6, 2, dtype=jnp.bfloat16, backend="pallas",
                    precision="highest", windowing="pieces")
    pb1 = bp4.build(6, 2, dtype=jnp.bfloat16, backend="pallas",
                    precision="highest", windowing="pieces",
                    metric="onthefly")
    lataxis = pb0.layout.n_nodes_axis
    b = pb0.b.reshape((3,) + lataxis)
    pr = pb0.inv_diag.reshape((1,) + lataxis)
    r0 = cg_fused.fused_merged_cg_solve(pb0.op, lataxis, b, pr)
    r1 = cg_fused.fused_merged_cg_solve(pb1.op, lataxis, b, pr)
    assert bool(r1.converged) == bool(r0.converged)
    # the rebuilt metric differs from the host-precomputed one only at
    # f32 rounding; bf16 streams dominate, iteration counts stay close
    assert abs(int(r1.n_iterations) - int(r0.n_iterations)) <= 2
