"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py / __graft_entry__.py.

Note: the environment's sitecustomize imports jax at interpreter startup, so
JAX_PLATFORMS must be overridden through jax.config, not os.environ.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest

# ---------------------------------------------------------------- markers
# Fast/slow split: the FULL suite stays the default gate (`pytest tests/`,
# ~30 min on the 8-virtual-device mesh); `-m "not slow"` gives a ~10 min
# inner loop during development.  Centralized by name (round-5 durations
# table: everything >= ~20 s lands here) so test bodies stay unmarked.
SLOW_TESTS = {
    "test_solver_with_multigrid_g0",
    "test_sharded_hyper_newton_matches_single_device",
    "test_512_cube_sharded_step_fits_hbm",
    "test_dif_radix2_chain_matches_separate",
    "test_demo_sfrp_parameter_fit",
    "test_sharded_solve_with_slab_middle_matches_single_chip",
    "test_sharded_fused_solve_matches_single_chip",
    "test_g0_staggered_middle_slab_matches_chain",
    "test_fused_dispatch_uses_slab_middle",
    "test_viscosity_fused_solve_matches_generic",
    "test_hyper_gspmd_fallback_never_uses_pallas_middle",
    "test_demo_2d",
    "test_g0_staggered_fused_matches_separate",
    "test_hyper_eig_range_host_split_matches_single_program",
    "test_middle_slab_matches_single_chip",
    "test_digital_rocks_64_crop_pinned",
    "test_warn_fallback_still_solves_correctly",
    "test_hyper_eig_range_chunked_matches_full_grid",
    "test_sweep_kernels_anisotropic_cell",
    "test_three_phase_laminate_elasticity_runs",
    "test_sharded_middle_step_keeps_all_to_all_no_gather",
    "test_sharded_solve_matches_single_device",
    "test_solver_equivalence_with_middle",
    "test_stress_sweep_tau_sum",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running equivalence/scale tests "
        "(full suite runs them; deselect with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
