"""Test harness setup.

Tests run on CPU with 8 virtual devices so that multi-chip sharding paths
compile and execute without TPU hardware (the driver separately dry-runs the
multi-chip path). Must run before the first `import jax` anywhere.
"""

import os

# Force CPU: the session environment exports JAX_PLATFORMS=axon (remote TPU
# tunnel), which would turn every test op into a network round trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: the persistent compilation cache is intentionally NOT enabled:
# cache-loaded executables run pathologically slowly on the axon TPU
# platform and XLA:CPU AOT reloads warn about machine-feature mismatches.

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# only the config knob reliably pins tests to local CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Tests that individually exceed ~15s on the CPU suite (measured with
# --durations; see CLAUDE.md). The fast lane `-m "not slow"` stays under
# ~3 min so the last commit of a round can always re-verify quickly.
_SLOW_TESTS = {
    "test_mono_vo_on_real_flow",
    "test_checkpoint_roundtrip",
    "test_optimize_depth_recovers_from_wrong_init",
    "test_exact_local_prop_mode_converges",
    "test_falign_recovers_relative_pose_geometry_only",
    "test_depth_prior_mode",
    "test_multichip_matches_single_chip",
    "test_multichip_full_solve_matches_single_chip",
    "test_dryrun_multichip",
    "test_ap3p_single_exact_recovery",
    "test_stereo_mode_recovers_metric_scale",
    "test_slam_mono_local_links_and_pgo",
    "test_links_batch_matches_single",
    "test_slam_mono_vo_trajectory",
    "test_falign_connectivity_subset",
    "test_optimize_depth_monotone_cost",
    "test_save_result",
    "test_engine_mono_end_to_end",
    "test_falign_photometric_refinement",
    "test_optimize_depth_batched_recovers",
    "test_pgo_consistent_graph_is_fixed_point",
    "test_pallas_cost_matches_reference",
    "test_demo_pipeline_with_loaders",
    "test_save_poses_formats",
    "test_pipeline_matches_sequential",
    "test_pipeline_flush_on_pgo_writeback",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_memory():
    """Clear jit/executable caches at module boundaries. A single suite
    process compiles hundreds of XLA:CPU programs; the accumulated LLVM
    JIT state has produced a rare segfault *inside backend_compile* late
    in the run (observed at ~76 tests in; unreproducible from the two
    neighboring modules alone). Modules rarely share executables, so this
    bounds compiler memory at a negligible recompile cost."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(233)
