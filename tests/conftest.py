"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise pjit/shard_map collectives without a
real TPU pod; single-chip numerics tests also run on CPU for speed and
determinism. (The environment pins JAX_PLATFORMS=axon, so we must override
via jax.config, not just the env var.)
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ----------------------------------------------------------------------
# `-m smoke` tier: one fast test per subsystem (< 5 min on one CPU), so
# drivers / judges / pre-snapshot checks have a tractable green signal.
# The full suite stays the default; heavy oracle suites keep their own
# markers (slow, kernel_smoke).
# ----------------------------------------------------------------------
_SMOKE = (
    "test_core.py::TestVoxelize::test_unique_and_representatives",
    "test_core.py::TestKernelMaps::test_self_map_matches_oracle",
    "test_models.py::TestResUNet::test_forward_shapes_and_norm",
    "test_losses.py::TestHelpers::test_pair_isin",
    "test_device_pipeline.py::TestRadiusKNN::test_matches_bruteforce",
    "test_data.py::TestTrajectoryIO::test_gt_log_roundtrip",
    "test_train.py::TestIterSizeAccumulation"
    "::test_accum_equals_one_step_on_mean_gradient",
    "test_reg.py::TestProcrustes::test_exact_recovery",
    "test_native.py::TestNative::test_voxelize",
    "test_reference_parity.py::TestRobustPoseParity"
    "::test_est_quad_linear_robust[0]",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        ident = item.nodeid.split("tests/")[-1]
        is_smoke = any(ident.startswith(s) for s in _SMOKE)
        if (item.get_closest_marker("kernel_smoke")
                and not item.get_closest_marker("slow")):
            is_smoke = True
        if is_smoke:
            item.add_marker(pytest.mark.smoke)
