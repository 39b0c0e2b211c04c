"""BP4 benchmark harness / CLI.

Capability of the reference harness (``common_code/benchmark.h:50-318`` and
the two ``bench.cc`` executables): degree dispatch, auto size ladder, the 4x
min-timed CG solve, the 2x50 min-timed matvec, and the fixed-width result
row::

   p |  q | n_element |     n_dofs |     time/it |   dofs/s/it | itCG | time/matvec

Usage (mirrors the reference positional CLI, ``benchmark.h:280-288``)::

   python -m mf_data_locality_tpu.benchmark <degree> [s] [compact] \
       [--solver fused|merged|baseline] [--dtype f32|f64|bf16] \
       [--precision highest|split3|split2m|bf16] \
       [--windowing pieces|zslab|reshape|matmul|conv] \
       [--metric-dtype f32|bf16] [--devices N] [--backend ...]

Production configuration: ``--solver fused --precision split3
--windowing pieces`` (f32-class) — see README "Performance notes" for
the split2m / bf16 variants.

``s < 1`` runs the auto ladder: s starts at 1 + log2(n_devices) and grows
while (p+1)^3 * 2^s * n_components < 6e6 * n_devices (``benchmark.h:243-257``).
The degree dispatch table p=1..11 with q=p+2 matches ``benchmark.h:290-313``;
each (p, q) is a separate jit specialization — the XLA analog of the
reference's compile-time template instantiations.
"""

from __future__ import annotations

import argparse
import math
import sys
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mf_data_locality_tpu.models import bp4
from mf_data_locality_tpu.utils import timing

DTYPES = {"f32": jnp.float32, "f64": jnp.float64, "bf16": jnp.bfloat16}
HEADER = (" p |  q | n_element |     n_dofs |     time/it |   dofs/s/it |"
          " itCG | time/matvec")


@dataclass
class RunResult:
    degree: int
    n_q: int
    n_cells: int
    n_dofs: int
    time_per_it: float
    dofs_per_s_per_it: float
    n_iterations: int
    time_per_matvec: float
    converged: bool
    note: str = ""
    # one-chain (wall / n_it) solve time — the round 1-4 protocol, kept for
    # cross-round comparability.  On the tunneled backend it includes a
    # per-solve fixed cost (dispatch + the latency-correction residual,
    # measured 2-22 ms) divided by only ~100 iterations, overstating
    # time_per_it by up to ~90 us at fast configs; the primary column now
    # uses the two-solve slope that cancels it (see run_one).
    time_per_it_wall: float = 0.0

    def row(self) -> str:
        return (f"{self.degree:2d} | {self.n_q:2d} |{self.n_cells:10d} "
                f"|{self.n_dofs:11d} | {self.time_per_it:.5e} | "
                f"{self.dofs_per_s_per_it:.5e} | {self.n_iterations:4d} | "
                f"{self.time_per_matvec:.5e}"
                + (f"   [{self.note}]" if self.note else ""))


def resolve_factor(factor: str, degree: int, windowing: str,
                   precision: str = "split2m",
                   solver: str = "fused",
                   metric: str = "auto") -> str:
    """Resolve factor='auto' to the measured-optimal contraction form.

    Dense MXU matmuls at low degree, the two-stage factorization (2D MXU
    stage + VPU z-stage, (p+1)x fewer FLOPs) where it measures faster:
    p >= 5 on every rung (tools/R3_BATCH1.txt, PROBE_TWOSTAGE.txt,
    PROBE_DISPATCH2.txt — the crossover holds under both geometry
    modes), plus p=4 on the f32-class split rungs, where
    twostage+onthefly won a 3-round interleaved A/B decisively
    (191.7 vs 211.3 us/it min, tools/PROBE_P4FACTOR.txt) and converges
    two iterations earlier at the convergent point (92 vs 94,
    PROBE_FOLLOWUP part A).  The bf16 rung keeps dense at p=4: there
    dense+onthefly measured 168.8 vs twostage 224.7 (PROBE_DISPATCH2
    part G) — the one-pass bf16 matmul is cheap enough that the
    twostage FLOP cut no longer pays for its extra VPU z-stage.
    """
    if factor != "auto":
        return factor
    if windowing != "pieces":
        return "dense"
    if degree >= 5:
        return "twostage"
    # NOT 'highest', NOT the non-fused solvers, and NOT an explicitly
    # requested precomputed stream: the p=4 twostage win is onthefly's
    # (resolve_metric engages the rebuild only on the fused pieces path)
    # — with the precomputed stream, p=4 dense measured faster
    # (R3_BATCH1 / PROBE_TWOSTAGE).  ``metric`` is the caller's REQUEST
    # ('auto'/'precomputed'/'onthefly'), consulted before resolve_metric
    # runs (which itself needs the resolved factor).
    if (degree == 4 and solver == "fused"
            and precision in ("split3", "split2m")
            and metric != "precomputed"):
        return "twostage"
    return "dense"


def resolve_metric(metric: str, solver: str, windowing: str, factor: str,
                   degree: int, n_q: int | None = None,
                   precision: str = "split2m") -> str:
    """Resolve metric='auto' to the measured-optimal geometry mode.

    'onthefly' (in-kernel Jacobian rebuild from 24 coefficients/cell —
    the reference's data-locality trade, ``poisson_operator.h:470-520``)
    wins on the fused pieces path at nearly every degree once odd-q
    sublane padding (``cg_fused_kernel._pad_row_blocks``) and the
    twostage per-qz rebuild are in: same-session A/Bs at the ladder max
    (tools/PROBE_DISPATCH.txt, PROBE_DISPATCH2.txt, PROBE_ODDQ.txt,
    PROBE_FOLLOWUP.txt) measure, time/iteration

      - split2m: p=2 115 vs 124-139, p=4 219-243 vs 273-277, p=5..11
        twostage 158-381 vs 274-700 -> onthefly;
      - bf16 rung: p=2 LOSES (159 vs 132 -> keep precomputed), p=4..11
        win (e.g. p=9 154 vs 227) -> onthefly for p >= 3 (twostage);
      - p=1 loses slightly on both rungs (92.6 vs 96.0) -> precomputed.

    CONVERGENCE carve-out: the DENSE rebuild with padded odd-q rows is
    the one config out of its iteration class — p=3 s=9 split2m hits the
    100-it cap unconverged vs f64's 95 while twostage+onthefly converges
    at 97 and dense+precomputed at 96 (tools/PROBE_PRODHIST.txt,
    PARITY.md shipping-config ladder).  Speed means nothing at +5
    iterations, so dense + odd q keeps the precomputed stream on every
    rung; in the factor-auto ladder this only affects p=3 (odd p >= 5
    ship twostage, whose per-qz rebuild stays in class).

    ``precision`` is the kernel matmul rung ('bf16'/'bf16sr' = the
    reduced bf16-stream rung; callers with ``dtype=bfloat16`` should pass
    'bf16' since split3/split2m degrade to one bf16 pass there).
    'highest' keeps the precomputed metric: the in-kernel Jacobian matmul
    runs as a split3 hi/lo bf16 pair on TPU (~1e-5-class geometry
    perturbation, measured 6-8e-6 max rel), which would silently weaken
    the exact-f32 contract —
    force --geometry onthefly to accept the trade.  ``n_q`` is the actual
    quadrature count when a caller overrides the q = p+2 reference
    default (benchmark.h:290-313); the dispatch is degree/rung-based
    (padding handles any q), so it is accepted for interface stability.
    """
    if metric != "auto":
        return metric
    if solver == "fused" and windowing == "pieces":
        q = n_q if n_q is not None else degree + 2
        dense_odd_q = factor == "dense" and q % 2 == 1
        if precision in ("bf16", "bf16sr"):
            return ("onthefly" if degree >= 3 and not dense_odd_q
                    else "precomputed")
        if precision in ("split3", "split2m"):
            return ("onthefly" if degree >= 2 and not dense_odd_q
                    else "precomputed")
    return "precomputed"


def resolve_cofactor(cofactor: str, degree: int, factor: str, metric: str,
                     precision: str = "split2m") -> str:
    """Resolve cofactor='auto' to the measured-optimal inversion chain.

    The on-the-fly rebuild's 3x3 inversion + metric assembly can run as
    the adjugate-of-J chain ('adjj', the reference's ``do_invert`` form,
    ``poisson_operator.h:27-63``) or as G = w adj(J^T J) rsqrt(det C)
    ('jtj') — mathematically identical (C^{-1} = J^{-1} J^{-T},
    det C = det(J)^2), ~12% fewer VPU ops, an rsqrt instead of a divide.
    Interleaved inner=50 slope A/Bs (tools/PROBE_R5_COFACTOR.txt,
    PROBE_R5_JTJ2.txt) measured jtj faster at every TWOSTAGE degree
    p >= 5 — trimmed means -3.6% (p=7) to -11% (p=6), neutral only at
    p=8 (+0.1%), and -7%/-4% on the bf16 rung at p=9 — but slower at
    p=4 twostage (+8..18%) and neutral on the dense path (p=2).
    Iteration histories at the convergent points are in class (itCG
    identical at p=4 s=7 and p=6 s=4, history dev <= 4e-2).  The
    precomputed-metric path has no inversion in-kernel — 'adjj' is
    returned as the inert default there.
    """
    if cofactor != "auto":
        return cofactor
    if metric != "onthefly" or factor != "twostage":
        return "adjj"
    return "jtj" if degree >= 5 else "adjj"


def run_one(degree: int, s: int, solver: str = "merged", dtype=jnp.float32,
            backend: str = "structured", verbose: bool = False,
            precision: str = "highest", windowing: str = "reshape",
            metric_dtype=None, layers_per_step: int = 1,
            factor: str = "auto", x_skip: bool = False, prec_dtype=None,
            x_dtype=None,
            solve_repeats: int = 4, matvec_repeats: int = 2,
            matvec_inner: int = 50, problem=None,
            metric: str = "auto", cofactor: str = "auto") -> RunResult:
    """Set up and time one (p, s) benchmark point (``benchmark.h:50-226``).

    ``factor="auto"`` picks the measured-optimal contraction factorization
    per degree and rung (``resolve_factor``): dense MXU matmuls at low
    degree, the two-stage form (z on the VPU, 2D MXU stage) for p >= 5
    everywhere plus p=4 on the f32-class split rungs, where its (p+1)x
    FLOP cut wins (tools/R3_BATCH1.txt, PROBE_TWOSTAGE.txt,
    PROBE_DISPATCH2.txt, PROBE_P4FACTOR.txt).
    """
    from functools import partial

    # with dtype=bf16 the streamed operands are bf16 regardless of the
    # split flag, so both dispatches must see the bf16 rung
    eff_prec = "bf16" if dtype == jnp.bfloat16 else precision
    factor = resolve_factor(factor, degree, windowing, precision=eff_prec,
                            solver=solver, metric=metric)
    metric = resolve_metric(metric, solver, windowing, factor, degree,
                            precision=eff_prec)
    cofactor = resolve_cofactor(cofactor, degree, factor, metric,
                                precision=eff_prec)

    from mf_data_locality_tpu.models.bp4 import _VMULT
    from mf_data_locality_tpu.solvers import cg, cg_fused, cg_merged

    import time as _time

    setup_t0 = _time.perf_counter()
    if problem is None:
        # callers timing many degrees may pass a prebuilt problem (same
        # build arguments) to avoid paying setup twice
        problem = bp4.build(s, degree, dtype=dtype, backend=backend,
                            precision=precision, windowing=windowing,
                            metric_dtype=metric_dtype, factor=factor,
                            metric=metric, cofactor=cofactor)
    elif backend == "pallas":
        # a prebuilt problem must match the configuration the timings will
        # be labeled with — a mismatch would silently report the wrong
        # factor/geometry/precision column
        pop = problem.op
        if getattr(pop, "factor", factor) != factor:
            raise ValueError(f"prebuilt problem has factor="
                             f"{pop.factor!r}, call resolved {factor!r}")
        if (pop.gmetric is None) != (metric == "onthefly"):
            raise ValueError(f"prebuilt problem geometry "
                             f"({'onthefly' if pop.gmetric is None else 'precomputed'}) "
                             f"!= call's resolved metric {metric!r}")
        if getattr(pop, "precision", precision) != precision:
            raise ValueError(f"prebuilt problem has precision="
                             f"{pop.precision!r}, call passed {precision!r}")
        if getattr(pop, "cofactor", "adjj") != cofactor:
            raise ValueError(f"prebuilt problem has cofactor="
                             f"{getattr(pop, 'cofactor', 'adjj')!r}, call "
                             f"resolved {cofactor!r}")
    vmult_fn = _VMULT[backend]
    if verbose:
        # reference verbose mode: diagonal norm + setup time
        # (benchmark.h:149-154, 178-182)
        import jax.numpy as _jnp
        diag_norm = float(_jnp.linalg.norm(1.0 / problem.inv_diag))
        print(f"Norm of diagonal for preconditioner: {diag_norm:.6e}",
              file=sys.stderr)
        print(f"Setup time:         {_time.perf_counter() - setup_t0:.3f}s",
              file=sys.stderr)

    lat = ((problem.n_components,) + problem.layout.n_nodes_axis
           if backend != "general" else None)

    if solver == "fused" and not (backend == "pallas" and windowing == "pieces"):
        raise ValueError("--solver fused requires --backend pallas "
                         "--windowing pieces")

    # operator data captured as jit CONSTANTS: XLA then pre-tiles the
    # operand layouts (the bf16 metric stream as a runtime argument keeps
    # its default layout and costs ~130 us/it of strided per-step DMA —
    # measured 2.4x on the bf16 config, tools/PROBE_FUSED.txt
    # probe_compact).  The reference's operator tables are equally
    # resident/pre-laid-out across its whole run.  Host copies are taken
    # first so constant embedding at trace time needs no device->host
    # fetch (the tunneled backend intermittently errors there).
    import numpy as _np

    op_c = jax.tree.map(
        lambda a: _np.asarray(a) if isinstance(a, jax.Array) else a,
        problem.op)

    @jax.jit
    def solve_jit(inv_diag, b):
        if solver == "fused":
            lataxis = problem.layout.n_nodes_axis
            return cg_fused.fused_merged_cg_solve(
                op_c, lataxis, b.reshape((problem.n_components,) + lataxis),
                inv_diag.reshape((1,) + lataxis),
                layers_per_step=layers_per_step, x_skip=x_skip,
                prec_dtype=prec_dtype, x_dtype=x_dtype)
        raw = partial(vmult_fn, op_c,
                      constrained_identity=(solver == "baseline"))
        a = raw if lat is None else (lambda u: raw(u.reshape(lat)).reshape(u.shape))
        if solver == "merged":
            return cg_merged.merged_cg_solve(a, b, inv_diag)
        return cg.cg_solve(a, b, inv_diag)

    args = (problem.inv_diag, problem.b)
    result = solve_jit(*args)  # warmup & compile
    n_it = int(result.n_iterations)

    # -- solve timing: two-chain slope (round-5 protocol) ------------------
    # The reference times the solve with an in-process timer
    # (benchmark.h:184-199): dispatch cost ~0.  On the tunneled backend a
    # one-chain wall measurement carries a 2-22 ms per-solve fixed cost
    # (dispatch + whatever the latency correction mis-estimates) divided by
    # only ~itCG iterations — the same bias the matvec column already
    # cancels with its slope.  Chain k complete solves inside one jit with
    # a data dependency (solve i's res_norm perturbs nothing at runtime but
    # prevents CSE of identical solves) and report t_2 - t_1: every
    # per-chain fixed cost cancels; per-solve entry/exit work (state
    # conversions, initial residual, exit fixup) stays IN the numerator,
    # matching the reference's time/it semantics.  t_1 is exactly the old
    # protocol's measurement and is kept as time_per_it_wall.
    def make_solve_chain(k):
        @jax.jit
        def f():
            def body(c, _):
                bb = jnp.where(c == c, args[1], args[1] + 1.0)
                r = solve_jit(args[0], bb)  # jit-under-jit: inlined trace
                return r.res_norm.astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return out
        return f

    chain1, chain2 = make_solve_chain(1), make_solve_chain(2)
    # alternating floor pair: the tunnel's per-call fixed cost drifts by
    # several ms on minute timescales; sampling the 1- and 2-solve chains
    # back-to-back keeps the drift common-mode in the slope subtraction
    # (timing.time_pair_fetch; the smoke's recorded-band post-mortem)
    t1, t2 = timing.time_pair_fetch(chain1, chain2,
                                    repeats=solve_repeats, warmup=1)
    solver_time = t2 - t1
    solver_time_wall = t1
    if not (solver_time > 0
            and t2 > 0.2 * timing.round_trip_latency()):
        # tiny problems finishing inside the round trip: the slope drowns
        # in noise — fall back to the one-chain measurement
        solver_time = t1

    if solver == "fused":
        # the operator's native matvec for the fused path: input/output
        # stay in piece-state + Z-plane form across the 50-apply chain —
        # the analog of the reference's vmult on its native vector layout
        # (benchmark.h:204-215; zero windowing round trips)
        from mf_data_locality_tpu.ops import cg_fused_kernel as _fk

        lataxis = problem.layout.n_nodes_axis
        degree_p = degree
        d0 = _fk.to_piece_state(
            problem.b.reshape((problem.n_components,) + lataxis), degree_p)
        d0 = d0[:, :, :degree_p * degree_p]  # compact mm-only state
        zd0 = _fk.zplanes_init(d0, degree_p)
        matvec_time = timing.time_scan_fetch(
            lambda c: _fk.piece_vmult(op_c, lataxis, c[0], c[1],
                                      layers_per_step=layers_per_step,
                                      compact=True),
            (d0, zd0), inner=matvec_inner, repeats=matvec_repeats)
    else:
        matvec_time = timing.time_scan_fetch(
            problem.a_apply_full, problem.b,
            inner=matvec_inner, repeats=matvec_repeats)

    if verbose:
        hist = [float(r) for r in result.res_history[: n_it + 1]]
        print(f"  solver residual history: {hist[:4]} ... {hist[-2:]}",
              file=sys.stderr)

    return RunResult(
        degree=degree,
        n_q=degree + 2,
        n_cells=problem.layout.mesh.n_cells,
        n_dofs=problem.n_dofs,
        time_per_it=solver_time / max(n_it, 1),
        dofs_per_s_per_it=problem.n_dofs / solver_time * n_it,
        n_iterations=n_it,
        time_per_matvec=matvec_time,
        converged=bool(result.converged),
        time_per_it_wall=solver_time_wall / max(n_it, 1),
    )


def run_one_distributed(degree: int, s: int, n_devices: int,
                        solver: str = "merged", dtype=jnp.float32,
                        backend: str = "pallas", overlap: bool = False,
                        precision: str = "highest",
                        windowing: str = "reshape",
                        solve_repeats: int = 4, matvec_repeats: int = 2,
                        matvec_inner: int = 50,
                        metric: str = "auto") -> RunResult:
    """Distributed solve + matvec timing over an n-device z-slab mesh.

    The multi-rank analog of the reference run: one 7-scalar psum per merged
    iteration, halo ppermutes inside the operator.
    """
    from mf_data_locality_tpu.parallel import distributed as dist

    note = ""
    if solver == "fused":
        if backend != "pallas" or windowing != "pieces":
            raise ValueError("--solver fused --devices N requires "
                             "--backend pallas --windowing pieces")
        from mf_data_locality_tpu.parallel import dist_fused

        # distributed fused slabs are dense-factorization.  metric='auto'
        # keeps the streamed precomputed metric here: the distributed
        # matvec protocol (dist.dist_matvec_jit -> apply_lattice_pieces)
        # has no sharded piece-resident onthefly form yet, and the solve
        # and matvec columns must describe the SAME operator.  An explicit
        # metric='onthefly' runs the solve with the in-kernel rebuild and
        # times the matvec on a precomputed-stream twin (labeled caveat).
        metric = "precomputed" if metric == "auto" else metric
        dp, mesh = dist_fused.build_dist_fused(
            s, degree, n_devices=n_devices, dtype=dtype, precision=precision,
            metric=metric)
        if metric == "onthefly":
            dp_mv, _ = dist_fused.build_dist_fused(
                s, degree, n_devices=n_devices, dtype=dtype,
                precision=precision, metric="precomputed")
            # the solve and matvec columns describe DIFFERENT operators
            # here (onthefly solve, precomputed-stream matvec twin) —
            # carried on the result row, not only as a code comment
            note = "matvec: precomputed-metric twin"
        else:
            dp_mv = dp
        do_solve = lambda: dist_fused.solve_fused(dp, mesh)  # noqa: E731
    elif backend == "general":
        # gather-map backend decomposed over cell chunks with rank-set
        # halo grouping (renumber_dofs_for_mf.h:492-535 capability)
        from mf_data_locality_tpu.parallel import dist_general

        if metric not in ("auto", "precomputed"):
            raise ValueError(
                f"--backend general cannot honor --geometry {metric!r} "
                "(the gather/scatter backend has no in-kernel rebuild)")
        dp, mesh = dist_general.build_dist_general(s, degree,
                                                   n_devices=n_devices,
                                                   dtype=dtype)
        dp_mv = dp
        do_solve = lambda: dist_general.solve_general(  # noqa: E731
            dp, mesh, solver=solver)
    else:
        if metric not in ("auto", "precomputed"):
            raise ValueError(
                f"--solver {solver} --devices N cannot honor --geometry "
                f"{metric!r} (only the fused distributed path has the "
                "in-kernel rebuild)")
        dp, mesh = dist.build_distributed(s, degree, n_devices=n_devices,
                                          dtype=dtype, backend=backend,
                                          precision=precision,
                                          windowing=windowing)
        dp_mv = dp
        do_solve = lambda: dist.solve(dp, mesh, solver=solver,  # noqa: E731
                                      overlap=overlap)
    result = do_solve()
    n_it = int(result.n_iterations)
    solver_time = timing.time_min_fetch(
        lambda: do_solve().res_norm,
        repeats=solve_repeats, warmup=0)

    if backend == "general" and solver != "fused":
        from mf_data_locality_tpu.parallel import dist_general

        mv = dist_general.dist_matvec_jit(dp, mesh)
        matvec_time = timing.time_scan_fetch(
            lambda u: mv(dp.op_stack, dp.export_idx, dp.import_idx, u),
            dp.b, inner=matvec_inner, repeats=matvec_repeats)
    else:
        mv = dist.dist_matvec_jit(dp_mv, mesh, overlap=overlap)
        matvec_time = timing.time_scan_fetch(
            lambda u: mv(dp_mv.op_stack, u), dp_mv.b,
            inner=matvec_inner, repeats=matvec_repeats)

    return RunResult(
        degree=degree, n_q=degree + 2,
        n_cells=dp.n_cells, n_dofs=dp.n_dofs,
        time_per_it=solver_time / max(n_it, 1),
        dofs_per_s_per_it=dp.n_dofs / solver_time * n_it,
        n_iterations=n_it,
        time_per_matvec=matvec_time,
        converged=bool(result.converged),
        note=note,
    )


def ladder_sizes(degree: int, n_components: int = 3,
                 n_devices: int | None = None) -> list[int]:
    """The reference auto size ladder (``benchmark.h:243-257``)."""
    nd = n_devices or jax.device_count()
    s = 1 + int(math.log2(nd))
    out = []
    while (degree + 1) ** 3 * (1 << s) * n_components < 6_000_000 * nd:
        out.append(s)
        s += 1
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("degree", type=int, nargs="?", default=1)
    ap.add_argument("s", type=int, nargs="?", default=-1,
                    help="mesh size exponent (2^s cells); <1 runs the ladder")
    ap.add_argument("compact", type=int, nargs="?", default=1)
    ap.add_argument("--solver", choices=["merged", "baseline", "fused"],
                    default="merged",
                    help="fused = whole-iteration Pallas kernel "
                         "(requires --backend pallas --windowing pieces)")
    ap.add_argument("--dtype", choices=list(DTYPES), default="f32")
    ap.add_argument("--backend", choices=["pallas", "structured", "general"],
                    default="pallas")
    ap.add_argument("--devices", type=int, default=0,
                    help="distribute over N devices (0 = single-device path)")
    ap.add_argument("--precision",
                    choices=["highest", "split3", "split2m", "bf16",
                             "bf16sr"],
                    default="highest",
                    help="pallas kernel matmul precision strategy "
                         "(with --dtype bf16 the streamed operand is "
                         "already bf16, so split3/split2m degrade to a "
                         "single bf16 pass — same class as bf16)")
    ap.add_argument("--windowing",
                    choices=["reshape", "matmul", "conv", "zslab", "pieces"],
                    default="reshape",
                    help="pallas lattice<->cell-batch windowing strategy")
    ap.add_argument("--metric-dtype", choices=["f32", "bf16"], default="f32",
                    help="storage dtype of the precomputed metric stream")
    ap.add_argument("--geometry", choices=["auto", "qpoint", "onthefly"],
                    default="auto",
                    help="qpoint: stream the precomputed 6-entry metric "
                         "per q-point; onthefly: store 24 floats/cell and "
                         "rebuild the Jacobian metric per q-point in-kernel "
                         "(the reference's data-locality trade, "
                         "poisson_operator.h:470-520; 27-54x less geometry "
                         "HBM); auto: onthefly where it measures faster "
                         "AND stays in the f64+1..2 iteration class — "
                         "fused pieces, p>=2 f32-class / p>=3 bf16 rung, "
                         "except dense+odd-q whose padded rebuild is "
                         "convergence-degraded (tools/PROBE_DISPATCH*.txt, "
                         "PROBE_PRODHIST.txt: -10%% to -45%% time/it). "
                         "NOTE: with --precision highest, the onthefly "
                         "Jacobian matmul still runs as a split3 hi/lo "
                         "bf16 pair on TPU (~1e-5-class geometry "
                         "perturbation vs exact f32, measured 6-8e-6) — "
                         "Mosaic has no exact-f32 matmul inside this "
                         "kernel")
    ap.add_argument("--cofactor", choices=["auto", "adjj", "jtj"],
                    default="auto",
                    help="onthefly rebuild's 3x3 inversion chain: adjj = "
                         "adjugate-of-J + divide (do_invert form, "
                         "poisson_operator.h:27-63); jtj = "
                         "adj(J^T J) rsqrt(det) — identical algebra, fewer "
                         "VPU ops; auto = jtj where measured faster "
                         "(benchmark.resolve_cofactor)")
    ap.add_argument("--layers-per-step", type=int, default=1,
                    help="z-cell layers per fused-kernel grid step")
    ap.add_argument("--factor", choices=["auto", "dense", "twostage"],
                    default="auto",
                    help="fused-kernel contraction factorization: dense "
                         "(3q^3, p1^3) MXU matmuls vs twostage (z on the "
                         "VPU + 2D MXU stage, (p+1)x fewer FLOPs); auto = "
                         "dense for p<=4, twostage for p>=5 (measured)")
    ap.add_argument("--overlap", action="store_true",
                    help="overlap halo exchange with interior compute "
                         "(distributed path)")
    ap.add_argument("--x-skip", action="store_true",
                    help="fused solver: elide x's HBM read/write on non-pay "
                         "iterations of the delayed-x recurrence (exact)")
    ap.add_argument("--prec-dtype", choices=["f32", "bf16"], default="f32",
                    help="fused solver: storage dtype of the preconditioner "
                         "stream (bf16 = ~0.4%% Jacobi perturbation)")
    ap.add_argument("--x-dtype", choices=["f32", "bf16"], default="f32",
                    help="fused solver: storage dtype of the solution "
                         "vector x only (bf16 halves x's read+write; the "
                         "iteration path stays f32-class since x feeds no "
                         "residual recurrence, but the DELIVERED x is "
                         "bf16-rounded — a reduced solution-accuracy rung)")
    ap.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                    help="cpu: retarget jax to the host CPU and "
                         "self-provision enough virtual devices for "
                         "--devices N (works even where the environment "
                         "pins a TPU platform and pre-imports jax, as the "
                         "test conftest does; must run before any backend "
                         "query, i.e. only via this CLI entry)")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        # mirror tests/conftest.py: the env alone is ignored once jax is
        # imported, and XLA_FLAGS must carry the virtual device count
        # before the CPU backend initializes
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            n = max(args.devices, 1)
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    if jax.default_backend() not in ("cpu",):
        # persistent compile cache: tunneled-TPU compiles take minutes per
        # program.  TPU-only — sharing AOT entries with CPU processes loads
        # binaries compiled for mismatched machine features (SIGILL risk).
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if not 1 <= args.degree <= 11:
        raise SystemExit("Only degrees 1..11 implemented")  # benchmark.h:313

    dtype = DTYPES[args.dtype]
    sizes = ([args.s] if args.s >= 1
             else ladder_sizes(args.degree,
                               n_devices=args.devices or None))
    print(HEADER)
    for s in sizes:
        if args.devices > 0:
            r = run_one_distributed(args.degree, s, args.devices,
                                    solver=args.solver, dtype=dtype,
                                    backend=args.backend, overlap=args.overlap,
                                    precision=args.precision,
                                    windowing=args.windowing,
                                    metric={"auto": "auto",
                                            "qpoint": "precomputed",
                                            "onthefly": "onthefly"
                                            }[args.geometry])
        else:
            md = jnp.bfloat16 if args.metric_dtype == "bf16" else None
            r = run_one(args.degree, s, solver=args.solver, dtype=dtype,
                        backend=args.backend, verbose=not args.compact,
                        precision=args.precision, windowing=args.windowing,
                        metric_dtype=md,
                        layers_per_step=args.layers_per_step,
                        factor=args.factor, x_skip=args.x_skip,
                        prec_dtype=(jnp.bfloat16 if args.prec_dtype == "bf16"
                                    else None),
                        x_dtype=(jnp.bfloat16 if args.x_dtype == "bf16"
                                 else None),
                        metric={"auto": "auto", "qpoint": "precomputed",
                                "onthefly": "onthefly"}[args.geometry],
                        cofactor=args.cofactor)
        print(r.row() + ("" if r.converged else "   [not converged]"))


if __name__ == "__main__":
    main()
