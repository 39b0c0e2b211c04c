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
# (< 5 min on a single CPU); `pytest -q -m slow` runs the heavy remainder
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
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
