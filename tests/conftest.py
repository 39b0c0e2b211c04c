"""Test configuration: run the suite on CPU with 8 virtual devices.

The multi-device tests exercise the same ``shard_map`` programs that run on a
real TPU slice ("multi-node testing without a cluster" — the TPU analog of the
reference's MPI oversubscription, see SURVEY.md §4).  float64 is enabled so
operator/solver kernels can be validated at full precision.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize imports jax before this file runs, so the env var alone is
# ignored — jax.config.update is required to retarget the backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Slow-test partition: plain `pytest -q` runs a fast representative subset
# (~5-6 min warm-cache on an 8-vCPU host; first cold run adds ~2 min of
# XLA compiles); `pytest -q -m slow` runs the heavy remainder
# (larger sizes / extra parametrizations whose logic the fast set already
# covers once).  `pytest -q -m ""` runs everything.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

# nodeid substrings marked slow — each entry's coverage has a cheaper
# representative that stays in the fast set
_SLOW_PATTERNS = (
    # high-degree / large-size parametrizations (representatives kept:
    # high_degree[7], twostage[6-2], twostage_piece[5-1]/[6-2])
    "test_high_degree_pallas_matches_structured[5",
    "test_high_degree_pallas_matches_structured[9",
    "test_high_degree_pallas_matches_structured[11",
    "test_twostage_piece_vmult_matches_dense[6-3",
    "test_twostage_piece_vmult_matches_dense[6-4",
    "test_twostage_fused_solve_matches_dense[6-4",
    "test_structured_matches_general[5-3",
    "test_structured_matches_general[3-3",
    "test_structured_matches_general[1-4",
    "test_structured_matches_general[3-2",
    "test_pallas_kernel_matches_general[1-3",
    "test_vmult_matches_dense[0-1]",
    "test_vmult_matches_dense[1-2]",
    # distributed: representatives kept per mesh shape / device count
    "test_distributed_arbitrary_device_count_structured[5",
    "test_distributed_arbitrary_device_count_structured[6",
    "test_distributed_arbitrary_device_count_structured[7",
    "test_distributed_2d_matches_single[shape1",
    "test_distributed_3d_matches_single[shape0",
    "test_distributed_3d_matches_single[shape1",
    "test_overlap_with_windowing_modes",
    # fused solver: keep one case per feature (divisible/non-divisible/
    # fallback), push the extra parametrizations to slow
    "test_fused_matches_merged_f64[6-4",
    "test_dist_fused_matches_single[6-1-8",
    "test_dist_fused_nondivisible_devices[3",
    "test_dist_fused_overlap_matches_single[7-2-3",
    "test_dist_fused_overlap_matches_single[6-3-2",
    "test_dist_fused_2d_matches_single[7-2-2-3",
    "test_dist_fused_2d_matches_single[6-3-2-2",
    "test_dist_fused_2d_matches_single[6-2-1-4",
    "test_piece_vmult_matches_lattice[6-3",
    "test_piece_vmult_matches_lattice[6-4",
    "test_x_skip_exact[6-3",
    # convergence-rate study (manufactured solution, multiple sizes)
    "test_l2_convergence_rate[3",
    # unique-but-heavy feature checks: still run under -m slow
    "test_2d_cg_solve",
    "test_merged_cg_x0_start",
    "test_vmap_batched_solves",
    "test_structured_matches_general[0-1",
    "test_distributed_matvec_matches_single",
    "test_distributed_bf16_storage_matches_single",
    "test_distributed_pallas_overlap_matches",
    "test_fused_matches_merged_f64[6-3",
    "test_fused_x0_start",
    "test_dist_fused_x0_start",
    "test_dist_fused_fold_variant",
    "test_fold_matches_unfolded",
    "test_bf16_metric_operator_error_and_convergence",
    "test_run_one_baseline_matches_merged_iterations",
    "test_renumbered_operator_is_equivalent",
    # round-3 repartition (full suite had crept to ~13 min): push the
    # heavier parametrization of each already-covered feature to slow.
    # Representatives kept fast are noted per group.
    "test_profiling_helpers_are_safe_everywhere",   # profiling: import/enter covered elsewhere
    "test_high_degree_pallas_matches_structured[7", # high-p: twostage[5-1]/[6-2] + dispatch stay
    "test_fused_high_degree_dispatch",
    "test_baseline_cg_x0_matches_merged_x0",        # x0: bf16_storage/x0 slow set covers
    "test_dist_fused_3d_matches_single[7-2-2-1-4",  # 3D fused: [7-2-1-1-2] stays
    "test_dist_fused_3d_matches_single[6-3",
    "test_dist_fused_3d_matches_single[7-2-1-1-3",
    "test_dist_fused_3d_matches_single[7-2-2-2-2",
    "test_dist_fused_2d_matches_single[7-2-2-2",    # 2D fused: [6-2-2-2] stays
    "test_dist_fused_overlap_single_layer_fallback",  # overlap: [7-2-2] stays
    "test_overlapped_halo_exchange_matches",        # merged overlap: fused overlap stays
    "test_pallas_kernel_matches_general[0-1",       # vs-general: structured_matches_general[4-2] stays
    "test_structured_matches_general[3-1",
    "test_dist_fused_bf16_storage_converges",       # single-dev fused bf16 parity stays
    "test_fused_bf16_storage_converges",            # bf16_storage_iteration_parity stays
    "test_fused_matches_merged_f64[6-2",            # [5-1] stays
    "test_dist_fused_matches_single[6-3-2",         # [6-2-4] stays
    "test_distributed_merged_matches_single[8",     # [2] stays
    "test_distributed_merged_matches_single[4",
    "test_compact_matches_full[6-3",                # [5-1] stays
    "test_compact_matches_full[6-2",
    "test_vmult_matches_dense[3-1]",                # [1-1]/[3-2]/[0-3] stay
    "test_vmult_matches_dense[1-3]",
    "test_vmult_matches_dense[0-4]",
    "test_vmult_matches_dense[0-2]",
    "test_metric_precomputed_matches_onthefly[4-3", # [2-2] stays
    "test_nullspace_constants[3-3",                 # [2-2] stays
    "test_distributed_2d_matches_single[shape2",    # [shape0] stays
    "test_distributed_2d_replication_invariant",    # replication_invariant_preserved stays
    "test_distributed_pallas_matches_single[6",     # [2]/[4] stay
    "test_distributed_pallas_matches_single[3",
    "test_distributed_pallas_matvec_matches_single",  # dist matvec: CLI matvec check stays
    "test_distributed_pieces_nondivisible_and_overlap",  # fused nondivisible[5] stays
    "test_distributed_3d_matches_single[shape2",    # 3d pallas single stays
    "test_operator_symmetry[1-4",                   # smaller symmetry params stay
    "test_twostage_piece_vmult_matches_dense[6-2",  # [5-1] stays
    "test_vmult2d_matches_dense[nc3-2",             # [nc0-1]/[nc2-3] stay
    "test_vmult2d_matches_dense[nc1-2",
    "test_windowing_modes_match_reshape[4-3",       # [3-2-*] stay
    "test_windowing_modes_match_reshape[3-2-matmul",
    "test_precision_bf16sr_solves",                 # measured-dead-end variant; split2m/split3 stay
    "test_vjp_is_transpose",                        # transform: smaller AD checks stay
    "test_delayed_x_fixup_at_truncation[2",         # [1]/[4] stay
    "test_delayed_x_fixup_at_truncation[3",
    "test_delayed_x_fixup_at_truncation[7",
    "test_delayed_x_fixup_at_truncation[10",
    "test_l2_convergence_rate[2",                   # [1] stays
    "test_mass_matches_dense[0-3",                  # [1-1]/[3-2] stay
    "test_run_one_bf16_reduced_precision",          # CLI flags test stays
    "test_distributed_pallas_backend",              # run_one_distributed_reports stays
    "test_dist_fused_nondivisible_devices[5",       # edge case -> slow; divisible [6-2-4] stays
    "test_windowing_conv_irregular_mesh",           # conv mode is non-production
    "test_piece_vmult_matches_lattice[6-2-2",       # L=2 variant; [6-2-1-False] stays
    "test_piece_vmult_matches_lattice[6-2-1-True",
    "test_vmult2d_matches_dense[nc2-3",             # [nc0-1] stays
    "test_delayed_x_fixup_at_truncation[4",         # [1] stays
    "test_x_skip_exact[6-2",                        # off-by-default option
    "test_prec_dtype_bf16_converges",               # off-by-default option
    # round-4 repartition: heaviest onthefly parametrizations; [6-2]/[6-3]
    # representatives (even-q dense + odd-q twostage rebuild) stay fast
    "test_onthefly_metric_matches_precomputed[4-5",
    "test_onthefly_twostage_matches_precomputed[4-5",
    # 2D/3D x onthefly composition; 1D onthefly + 2D/3D precomputed stay
    "test_dist_fused_2d_3d_onthefly_matches_single",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
