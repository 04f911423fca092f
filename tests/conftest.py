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
