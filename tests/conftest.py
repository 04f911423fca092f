"""Test config: force an 8-virtual-device CPU mesh so the whole suite —
including multi-chip sharding tests — runs without TPU hardware
(the TPU-native answer to 'test multi-node without a cluster', SURVEY.md §4).

Note: the env var JAX_PLATFORMS is ignored when the axon TPU plugin is
present, so we must use jax.config.update before any computation.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests validate math against f32 torch oracles; the serving path
# chooses bf16 explicitly where it wants speed.
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Pre-commit "core" lane: `pytest -m core` runs the <5-minute subset that
# protects the invariants most likely to break during iteration (forward
# parity, decode math, orchestrator semantics, trackers, fused dispatch).
# The full `-m "not slow"` lane (~35 min on a 1-core host) stays the CI lane.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

CORE_TEST_MODULES = {
    "test_model_parity",       # torch-oracle forward parity (tiny/sslim)
    "test_decode",             # UDP/DARK decode goldens
    "test_pipeline_semantics", # yolo_step cadence, tracker wiring, state
    "test_vitinference",       # public API contract
    "test_sort",
    "test_bytetrack",
    "test_fused_detect",       # single-dispatch == two-program equivalence
    "test_pose_step",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in CORE_TEST_MODULES:
            item.add_marker(pytest.mark.core)
