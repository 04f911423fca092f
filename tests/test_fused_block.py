"""Fused Pallas transformer block (models/fused_block.py) vs the XLA block.

Runs the kernel in interpreter mode on CPU; the TPU A/B timing lives in
scripts/bench_fused_block.py (PERF.md records the numbers).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig
from easy_vitpose_tpu.models.vit import init_vit_params, vit_forward


@pytest.fixture(scope="module")
def setup():
    cfg = BackboneConfig(embed_dim=96, depth=2, num_heads=4)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 256, 192, 3),
                          jnp.float32)
    return cfg, params, x


def test_fused_block_matches_xla_f32(setup):
    cfg, params, x = setup
    a = np.asarray(vit_forward(params, x, cfg))
    b = np.asarray(vit_forward(params, x, cfg,
                               block_impl="pallas_interpret"))
    # same math and accumulation dtype; the only analytic difference is the
    # in-kernel A&S erf (max 5e-7 per GELU — Mosaic has no erf lowering).
    # B=6 with G=4 also exercises the pad-to-multiple path.
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_fused_block_bf16_close(setup):
    cfg, params, x = setup
    from easy_vitpose_tpu.models.vitpose import cast_params
    p16 = cast_params(params, jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)
    a = np.asarray(vit_forward(p16, x16, cfg), np.float32)
    b = np.asarray(vit_forward(p16, x16, cfg,
                               block_impl="pallas_interpret"), np.float32)
    # fused path computes attention logits in f32 (free in VMEM) where the
    # XLA path keeps them bf16, so allow small softmax-weight differences
    rng = np.ptp(a)
    assert np.abs(b - a).max() < 0.02 * rng


def test_fused_block_in_pose_step(setup):
    """End-to-end: pose_step with block_impl='pallas_interpret' matches the
    XLA pose_step keypoints."""
    from easy_vitpose_tpu.configs import HeadConfig, ModelConfig
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.pipeline.pose_step import pose_step

    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.array([[30, 20, 160, 200], [100, 40, 280, 230]], np.float32)
    mask = np.ones((2,), bool)

    a = np.asarray(pose_step(params, jnp.asarray(frame), jnp.asarray(boxes),
                             jnp.asarray(mask), cfg))
    b = np.asarray(pose_step(params, jnp.asarray(frame), jnp.asarray(boxes),
                             jnp.asarray(mask), cfg,
                             block_impl="pallas_interpret"))
    np.testing.assert_allclose(b, a, atol=1e-4)
