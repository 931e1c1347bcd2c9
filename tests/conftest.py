"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

The multi-chip analog of the reference's "same binary under mpirun -n N"
story (SURVEY.md §4): sharding tests run on a virtual CPU mesh; numerical
golden tests run in f64, which the CPU backend executes natively.
"""

import os

# Must be configured before jax initializes a backend.  The axon
# sitecustomize pins JAX_PLATFORMS=axon (the real TPU), so we override via
# jax.config, which takes precedence.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import pytest


# ---------------------------------------------------------------------------
# Fast tier (`pytest -m "not slow"`, ~10 min solo): the full suite is the
# gate but takes 60-90+ min on this single-core box, which is how suites
# stop being run.  The list below is duration-derived (every test function
# whose slowest parametrization exceeded 40 s in a full `--durations=0`
# run) — regenerate after adding heavy tests.  The slow set is dominated by
# end-to-end convergence-count replays; every subsystem keeps faster
# parity/property tests in the fast tier.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_curved.py::test_curved_multigrid_convergence",
    "test_golden_convergence.py::test_geometric_golden",
    "test_golden_convergence.py::test_geometric_golden_full_table",
    "test_golden_convergence.py::test_polynomial_golden",
    "test_golden_convergence.py::test_polynomial_golden_full_table",
    "test_laplace_auto.py::test_q6_mxu3_exact_preserves_convergence_counts",
    "test_manufactured.py::test_l2_error_rate_2d",
    "test_manufactured.py::test_l2_error_rate_3d",
    "test_mixed.py::test_iterative_refinement_reaches_f64_accuracy",
    "test_mixed.py::test_mixed_ph_ladder_converges",
    "test_mixed.py::test_mixed_precision_matches_f64_history",
    "test_operator.py::test_bkron_solve_count_parity",
    "test_pallas2d.py::test_fused_chebyshev_matches_plain_2d",
    "test_pallas2d.py::test_geometric_2d_auto_counts",
    "test_pallas2d.py::test_polynomial_2d_auto_counts",
    "test_pallas_cheb2.py::test_cheb2_auto_ladder_degrades_on_compile_crash",
    "test_pallas_cheb2.py::test_cheb2_pairs_match_single_steps",
    "test_pallas_cheb2.py::test_cheb2_smoother_preserves_convergence_counts",
    "test_pallas_cheb2.py::test_cheb2lr_costs_at_most_one_iteration",
    "test_pallas_cheb2.py::test_cheb2lr_fallback_without_kernel",
    "test_pallas_elasticity.py::test_fused_vector_chebyshev_matches_plain",
    "test_pallas_elasticity.py::test_fused_vector_vcycle_preserves_convergence_counts",
    "test_pallas_elasticity.py::test_mxu_recurrence_preserves_cg_counts",
    "test_pallas_elasticity.py::test_pallas_elasticity_smoother_parity",
    "test_pallas_smoother.py::test_bf16_state_smoother_preserves_convergence_counts",
    "test_pallas_smoother.py::test_fused_chebyshev_matches_plain",
    "test_pallas_smoother.py::test_fused_vcycle_preserves_convergence_counts",
    "test_pallas_smoother.py::test_mxu_smoother_preserves_convergence_counts",
    "test_pallas_smoother.py::test_trimmed_io_matches_full",
    "test_pallas_smoother.py::test_trimmed_vcycle_matches_full",
    "test_pallas_transfer.py::test_vcycle_counts_with_pallas_transfer",
    "test_pallas_zpad.py::test_zpad_fused_smoother_matches_unpadded",
    "test_pallas_zpad.py::test_zpad_up_hierarchy_matches_plain",
    "test_pallas_zpad.py::test_zpad_vcycle_matches_unpadded",
    "test_sharding.py::test_2d_pencil_pallas_solve_matches_single_device",
    "test_sharding.py::test_2d_pencil_zpad_solve_matches_single_device",
    "test_sharding.py::test_extended_arbitrary_shard_counts",
    "test_sharding.py::test_sharded_elasticity_matches_single_device",
    "test_sharding.py::test_sharded_fused_smoother_matches_single_chip",
    "test_sharding.py::test_sharded_pallas_elasticity_solve_matches_single_device",
    "test_sharding.py::test_sharded_pallas_solve_matches_single_device",
    "test_sharding.py::test_sharded_polynomial_solve_matches_single_device",
    "test_sharding.py::test_sharded_solve_matches_single_device",
    "test_sharding.py::test_sharded_solve_two_devices",
    "test_sharding.py::test_sharded_zpad_solve_matches_single_device",
    "test_solvers.py::test_eig_cap_large_coarse_level_convergence",
    "test_solvers.py::test_geometric_mg_iteration_counts",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name.split("[")[0]
        key = f"{os.path.basename(item.fspath)}::{name}"
        if key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The XLA CPU compiler segfaults intermittently deep into the 200+-test
    single-process run (observed twice around test #160, each time inside
    backend_compile, with >120 GB RAM free); clearing the jit caches between
    modules keeps the compiler state small and has eliminated the crash in
    practice.  Costs a few recompiles of shared tiny programs.
    """
    yield
    jax.clear_caches()
