"""Round-2 kernel/solver variants: precomputed metric, windowing modes,
matmul precision strategies, bf16 vector storage, x0 starts, f32-vs-f64
iteration parity.

Capability slots: precomputed metric replaces the reference's on-the-fly
geometry trade (``poisson_operator.h:151-179``) where the TPU balance flips;
precision "split3" is the explicit bf16 hi/lo 3-product decomposition;
bf16 storage generalizes ``vector_access_reduced.h`` (float storage /
double compute) to bf16 storage / f32 compute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mf_data_locality_tpu.mesh.box import BoxMesh
from mf_data_locality_tpu.mesh.dofs import DofLayout
from mf_data_locality_tpu.models import bp4
from mf_data_locality_tpu.ops import laplace_pallas as lp
from mf_data_locality_tpu.solvers import cg, cg_merged


def _rand_u(layout, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((3,) + layout.n_nodes_axis), dtype)


@pytest.mark.parametrize("s,p", [(2, 2), (4, 3)])
def test_metric_precomputed_matches_onthefly(s, p):
    layout = DofLayout(BoxMesh.from_s(s), p)
    u = _rand_u(layout)
    v_otf = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float64,
                                             metric="onthefly"), u)
    v_pre = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float64,
                                             metric="precomputed"), u)
    scale = float(jnp.max(jnp.abs(v_otf)))
    assert float(jnp.max(jnp.abs(v_otf - v_pre))) < 1e-13 * scale


@pytest.mark.parametrize("windowing", ["matmul", "conv", "zslab", "pieces"])
@pytest.mark.parametrize("s,p", [(3, 2), (4, 3)])
def test_windowing_modes_match_reshape(windowing, s, p):
    layout = DofLayout(BoxMesh.from_s(s), p)
    u = _rand_u(layout)
    v_ref = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float64), u)
    v = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float64,
                                         windowing=windowing), u)
    scale = float(jnp.max(jnp.abs(v_ref)))
    assert float(jnp.max(jnp.abs(v_ref - v))) < 1e-13 * scale


def test_windowing_conv_irregular_mesh():
    layout = DofLayout(BoxMesh(n_cells_axis=(3, 2, 2), spacing=0.25), 2)
    u = _rand_u(layout)
    v_ref = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float64), u)
    v = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float64,
                                         windowing="conv"), u)
    assert float(jnp.max(jnp.abs(v_ref - v))) < 1e-13


def test_precision_split3_is_f32_class():
    """split3 (3 bf16 products) must stay within ~10x of f32 dot roundoff."""
    layout = DofLayout(BoxMesh.from_s(4), 3)
    u = _rand_u(layout, dtype=jnp.float32)
    v_hi = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float32), u)
    v_s3 = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float32,
                                            precision="split3"), u)
    rel = float(jnp.max(jnp.abs(v_hi - v_s3)) / jnp.max(jnp.abs(v_hi)))
    assert rel < 2e-5, rel


def test_precision_split2m_class_and_iterations():
    """split2m: bf16-rounded matrices (fixed ~2e-3 operator perturbation)
    with hi/lo-split stream — the consistent SPD perturbation costs zero
    to few CG iterations (measured iteration-EXACT at p=2 s=7 on TPU)."""
    from mf_data_locality_tpu.solvers import cg_fused

    layout = DofLayout(BoxMesh.from_s(4), 3)
    u = _rand_u(layout, dtype=jnp.float32)
    v_hi = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float32), u)
    v_s2 = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float32,
                                            precision="split2m"), u)
    rel = float(jnp.max(jnp.abs(v_hi - v_s2)) / jnp.max(jnp.abs(v_hi)))
    assert 1e-5 < rel < 1e-2, rel

    p3 = bp4.build(s=6, degree=2, dtype=jnp.float32, backend="pallas",
                   precision="split3", windowing="pieces")
    p2m = bp4.build(s=6, degree=2, dtype=jnp.float32, backend="pallas",
                    precision="split2m", windowing="pieces")
    lat = p3.layout.n_nodes_axis
    r3 = cg_fused.fused_merged_cg_solve(
        p3.op, lat, p3.b.reshape((3,) + lat),
        p3.inv_diag.reshape((1,) + lat))
    r2 = cg_fused.fused_merged_cg_solve(
        p2m.op, lat, p2m.b.reshape((3,) + lat),
        p2m.inv_diag.reshape((1,) + lat))
    assert bool(r2.converged)
    assert abs(int(r2.n_iterations) - int(r3.n_iterations)) <= 3


def test_precision_bf16_is_bf16_class():
    layout = DofLayout(BoxMesh.from_s(4), 3)
    u = _rand_u(layout, dtype=jnp.float32)
    v_hi = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float32), u)
    v_bf = lp.vmult(lp.make_pallas_operator(layout, dtype=jnp.float32,
                                            precision="bf16"), u)
    rel = float(jnp.max(jnp.abs(v_hi - v_bf)) / jnp.max(jnp.abs(v_hi)))
    assert 1e-5 < rel < 3e-2, rel


def test_precision_bf16sr_solves():
    """bf16sr (stochastically rounded single-pass streams, f32 state):
    converges near the f32 count.  On CPU the Pallas interpreter has no
    prng lowering, so the rung degrades to round-to-nearest (documented);
    this validates the plumbing + the bf16-class convergence envelope —
    the SR-vs-RTN iteration comparison is on-chip evidence
    (tools/R3_BATCH8.txt)."""
    from mf_data_locality_tpu.solvers import cg_fused

    pf = bp4.build(s=5, degree=2, dtype=jnp.float32, backend="pallas",
                   precision="split2m", windowing="pieces")
    lat = pf.layout.n_nodes_axis
    rf = cg_fused.fused_merged_cg_solve(
        pf.op, lat, pf.b.reshape((3,) + lat),
        pf.inv_diag.reshape((1,) + lat))
    ps = bp4.build(s=5, degree=2, dtype=jnp.float32, backend="pallas",
                   precision="bf16sr", windowing="pieces")
    rs = cg_fused.fused_merged_cg_solve(
        ps.op, lat, ps.b.reshape((3,) + lat),
        ps.inv_diag.reshape((1,) + lat))
    assert bool(rf.converged) and bool(rs.converged)
    assert abs(int(rs.n_iterations) - int(rf.n_iterations)) <= 5


def test_bf16_storage_iteration_parity():
    """bf16 d/h storage: converges with itCG within a few of f32
    (VERDICT round-1 item 5 done-criterion)."""
    pf = bp4.build(s=6, degree=2, dtype=jnp.float32, backend="pallas")
    rf = bp4.solve_merged(pf, rel_tol=1e-8)
    pb = bp4.build(s=6, degree=2, dtype=jnp.bfloat16, backend="pallas")
    rb = bp4.solve_merged(pb, rel_tol=1e-8)
    assert bool(rf.converged) and bool(rb.converged)
    assert abs(int(rb.n_iterations) - int(rf.n_iterations)) <= 5
    # solution accuracy is bounded by the bf16 operator stream (~4e-3)
    xg = np.asarray(rf.x, np.float64)
    xb = np.asarray(rb.x, np.float64)
    assert np.max(np.abs(xg - xb)) / np.max(np.abs(xg)) < 3e-2


def test_merged_cg_x0_start():
    """Nonzero x0: g0 = A x0 - b (solver_cg_optimized.h:221-228)."""
    prob = bp4.build(s=4, degree=2, dtype=jnp.float64, backend="structured")
    r_ref = bp4.solve_merged(prob, rel_tol=1e-10)
    rng = np.random.default_rng(3)
    # constraint-consistent start: zero on Dirichlet DoFs (the reference
    # passes vectors with constraints already applied, benchmark.h:170-176)
    free = ~prob.layout.boundary_node_mask
    x0 = jnp.asarray(rng.standard_normal(prob.b.shape) * 0.1 * free[None, :])
    r_x0 = cg_merged.merged_cg_solve(prob.a_apply, prob.b, prob.inv_diag,
                                     x0=x0, rel_tol=1e-10)
    assert bool(r_x0.converged)
    # same linear system -> same solution to solver tolerance
    err = float(jnp.max(jnp.abs(r_x0.x - r_ref.x)))
    scale = float(jnp.max(jnp.abs(r_ref.x)))
    assert err < 1e-7 * scale
    # warm start from the exact solution: the initial residual must reflect
    # g = A x0 - b ~ 0 (tolerance stays RELATIVE to it, ReductionControl
    # semantics, so the iteration count need not be small)
    r_warm = cg_merged.merged_cg_solve(prob.a_apply, prob.b, prob.inv_diag,
                                       x0=r_ref.x, rel_tol=1e-8)
    res0_cold = float(r_ref.res_history[0])
    res0_warm = float(r_warm.res_history[0])
    assert res0_warm < 1e-8 * res0_cold


def test_baseline_cg_x0_matches_merged_x0():
    prob = bp4.build(s=4, degree=2, dtype=jnp.float64, backend="structured")
    rng = np.random.default_rng(4)
    free = ~prob.layout.boundary_node_mask
    x0 = jnp.asarray(rng.standard_normal(prob.b.shape) * 0.1 * free[None, :])
    r_b = cg.cg_solve(prob.a_apply_full, prob.b, prob.inv_diag, x0=x0,
                      rel_tol=1e-10)
    r_m = cg_merged.merged_cg_solve(prob.a_apply, prob.b, prob.inv_diag,
                                    x0=x0, rel_tol=1e-10)
    assert bool(r_b.converged) and bool(r_m.converged)
    assert int(r_b.n_iterations) == int(r_m.n_iterations)


def test_f32_iteration_parity_vs_f64():
    """f32 iteration counts track f64 at a convergent size (VERDICT
    round-1 weak item 2 — previously only a PARITY.md note)."""
    for p, s in [(2, 6), (3, 5)]:
        r64 = bp4.solve_merged(bp4.build(s=s, degree=p, dtype=jnp.float64,
                                         backend="pallas"), rel_tol=1e-8)
        r32 = bp4.solve_merged(bp4.build(s=s, degree=p, dtype=jnp.float32,
                                         backend="pallas"), rel_tol=1e-8)
        assert bool(r64.converged) and bool(r32.converged)
        it64, it32 = int(r64.n_iterations), int(r32.n_iterations)
        assert abs(it64 - it32) <= max(1, round(0.03 * it64)), (it64, it32)


@pytest.mark.parametrize("p", [5, 7, 9, 11])
def test_high_degree_pallas_matches_structured(p):
    """Degrees beyond the benchmark sweet spot (reference dispatch covers
    p=1..11, benchmark.h:290-313): pallas (precomputed metric) vs the
    structured lattice path on a tiny mesh."""
    from mf_data_locality_tpu.ops import laplace_structured as ls

    layout = DofLayout(BoxMesh.from_s(1), p)
    u = _rand_u(layout)
    op_s = ls.make_structured_operator(layout, dtype=jnp.float64)
    v_ref = ls.vmult(op_s, u)
    op_p = lp.make_pallas_operator(layout, dtype=jnp.float64)
    v = lp.vmult(op_p, u)
    scale = float(jnp.max(jnp.abs(v_ref)))
    assert float(jnp.max(jnp.abs(v_ref - v))) < 1e-11 * scale


# ---------------------------------------------------------------------------
# two-stage factorization (round 3): z on the VPU + 2D MXU stage must equal
# the dense (3q^3, p1^3) contraction path exactly (same operator, different
# association order only)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("s,p", [(5, 1), (6, 2), (6, 3), (6, 4)])
def test_twostage_piece_vmult_matches_dense(s, p):
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk

    layout = DofLayout(BoxMesh.from_s(s), p)
    u = _rand_u(layout)
    outs = {}
    for factor in ("dense", "twostage"):
        op = lp.make_pallas_operator(layout, dtype=jnp.float64,
                                     precision="highest",
                                     windowing="pieces", factor=factor)
        uu = u * op.mask.astype(u.dtype)
        d = fk.to_piece_state(uu, p)
        zd = fk.zplanes_init(d, p)
        h, _ = fk.piece_vmult(op, layout.n_nodes_axis, d, zd, interpret=True)
        outs[factor] = np.asarray(
            fk.from_piece_state(h, p, layout.n_nodes_axis))
    scale = np.abs(outs["dense"]).max()
    assert np.abs(outs["dense"] - outs["twostage"]).max() < 1e-13 * scale


@pytest.mark.parametrize("s,p", [(6, 2), (6, 4)])
def test_twostage_fused_solve_matches_dense(s, p):
    from mf_data_locality_tpu.solvers import cg_fused

    results = {}
    for factor in ("dense", "twostage"):
        problem = bp4.build(s, p, dtype=jnp.float64, backend="pallas",
                            precision="highest", windowing="pieces",
                            factor=factor)
        lataxis = problem.layout.n_nodes_axis
        res = cg_fused.fused_merged_cg_solve(
            problem.op, lataxis, problem.b.reshape((3,) + lataxis),
            problem.inv_diag.reshape((1,) + lataxis))
        results[factor] = res
    rd, rt = results["dense"], results["twostage"]
    assert int(rd.n_iterations) == int(rt.n_iterations)
    n = int(rd.n_iterations) + 1
    hd = np.asarray(rd.res_history)[:n]
    ht = np.asarray(rt.res_history)[:n]
    # identical recurrence; only sub-tolerance tail entries see f64
    # rounding-order differences (same bound as fused-vs-merged)
    np.testing.assert_allclose(ht, hd, rtol=1e-6, atol=1e-8 * hd[0])
    xd, xt = np.asarray(rd.x), np.asarray(rt.x)
    np.testing.assert_allclose(xt, xd, atol=1e-11 * max(1.0, np.abs(xd).max()))


@pytest.mark.parametrize("s,p,factor", [(2, 2, "dense"), (4, 3, "twostage")])
def test_cofactor_jtj_piece_vmult_matches_adjj(s, p, factor):
    """jtj inversion chain (G = w adj(J^T J) rsqrt(det C)) is algebraically
    identical to the adjugate-of-J chain (the reference's ``do_invert``,
    ``poisson_operator.h:27-63``) — f64 interpret parity to roundoff."""
    from mf_data_locality_tpu.ops import cg_fused_kernel as fk

    layout = DofLayout(BoxMesh.from_s(s), p)
    u = _rand_u(layout)
    outs = {}
    for cofactor in ("adjj", "jtj"):
        op = lp.make_pallas_operator(layout, dtype=jnp.float64,
                                     precision="highest",
                                     windowing="pieces", factor=factor,
                                     metric="onthefly", cofactor=cofactor)
        uu = u * op.mask.astype(u.dtype)
        d = fk.to_piece_state(uu, p)
        zd = fk.zplanes_init(d, p)
        h, _ = fk.piece_vmult(op, layout.n_nodes_axis, d, zd, interpret=True)
        outs[cofactor] = np.asarray(
            fk.from_piece_state(h, p, layout.n_nodes_axis))
    scale = np.abs(outs["adjj"]).max()
    assert np.abs(outs["adjj"] - outs["jtj"]).max() < 1e-12 * scale


def test_cofactor_jtj_fused_solve_matches_adjj():
    """Full fused solve with the jtj chain: iteration-for-iteration parity
    with the adjugate chain in f64 (same recurrence, roundoff-only drift)."""
    from mf_data_locality_tpu.solvers import cg_fused

    results = {}
    for cofactor in ("adjj", "jtj"):
        problem = bp4.build(5, 4, dtype=jnp.float64, backend="pallas",
                            precision="highest", windowing="pieces",
                            factor="twostage", metric="onthefly",
                            cofactor=cofactor)
        lataxis = problem.layout.n_nodes_axis
        results[cofactor] = cg_fused.fused_merged_cg_solve(
            problem.op, lataxis, problem.b.reshape((3,) + lataxis),
            problem.inv_diag.reshape((1,) + lataxis))
    ra, rj = results["adjj"], results["jtj"]
    assert int(ra.n_iterations) == int(rj.n_iterations)
    n = int(ra.n_iterations) + 1
    ha = np.asarray(ra.res_history)[:n]
    hj = np.asarray(rj.res_history)[:n]
    np.testing.assert_allclose(hj, ha, rtol=1e-6, atol=1e-8 * ha[0])
    xa, xj = np.asarray(ra.x), np.asarray(rj.x)
    np.testing.assert_allclose(xj, xa, atol=1e-11 * max(1.0, np.abs(xa).max()))


def test_resolve_cofactor_dispatch():
    """The measured jtj dispatch rule (tools/PROBE_R5_COFACTOR.txt,
    PROBE_R5_JTJ2.txt): jtj only on the onthefly+twostage path at the
    degrees where it won the interleaved A/B; explicit requests pass
    through; the precomputed stream has no in-kernel inversion."""
    from mf_data_locality_tpu.benchmark import resolve_cofactor

    assert resolve_cofactor("jtj", 4, "twostage", "onthefly") == "jtj"
    assert resolve_cofactor("adjj", 9, "twostage", "onthefly") == "adjj"
    assert resolve_cofactor("auto", 4, "twostage", "onthefly") == "adjj"
    assert resolve_cofactor("auto", 5, "twostage", "onthefly") == "jtj"
    assert resolve_cofactor("auto", 6, "twostage", "onthefly") == "jtj"
    assert resolve_cofactor("auto", 11, "twostage", "onthefly") == "jtj"
    assert resolve_cofactor("auto", 9, "dense", "onthefly") == "adjj"
    assert resolve_cofactor("auto", 6, "twostage", "precomputed") == "adjj"
