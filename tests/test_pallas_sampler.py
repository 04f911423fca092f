"""Window-streamed Pallas crop sampler vs the XLA gather sampler
(interpret mode on CPU; TPU timings in scripts/bench_sampler.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from easy_vitpose_tpu.ops.pallas_sampler import sample_crops_pallas
from easy_vitpose_tpu.ops.preprocess import crop_geometry, sample_crops


def _setup(H=720, W=1280, M=8, seed=0):
    rng = np.random.default_rng(seed)
    frame = jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    boxes = np.stack([rng.uniform(0, W - 200, M), rng.uniform(0, H - 300, M),
                      rng.uniform(200, W, M), rng.uniform(300, H, M)],
                     -1).astype(np.float32)
    return frame, crop_geometry(jnp.asarray(boxes), (H, W))


def test_matches_gather_sampler_f32():
    frame, geo = _setup()
    a = np.asarray(sample_crops(frame, geo, sample_dtype=jnp.float32))
    b = np.asarray(sample_crops_pallas(frame, geo, sample_dtype=jnp.float32,
                                       interpret=True))
    # one-hot-matmul FMA ordering vs explicit lerp: ~1e-5 relative on 0..255
    np.testing.assert_allclose(b, a, atol=5e-3)


def test_bf16_within_quantization_noise():
    frame, geo = _setup()
    a = np.asarray(sample_crops(frame, geo, sample_dtype=jnp.float32))
    b = np.asarray(sample_crops_pallas(frame, geo, sample_dtype=jnp.bfloat16,
                                       interpret=True), np.float32)
    assert np.abs(a - b).max() < 3.0  # ~2 uint8 LSB, same as the bf16 paths


def test_nondivisible_height_and_edge_boxes():
    """H=250 (not a multiple of the 64-row window) + boxes touching frame
    edges exercise the zero-padded tail window and the clamps."""
    H, W = 250, 320
    rng = np.random.default_rng(1)
    frame = jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    boxes = np.array([
        [0, 0, 60, 249],       # full-height left edge
        [250, 180, 319, 249],  # bottom-right corner
        [-5, -5, 40, 60],      # detector overshoot (clipped by geometry)
    ], np.float32)
    geo = crop_geometry(jnp.asarray(boxes), (H, W))
    a = np.asarray(sample_crops(frame, geo, sample_dtype=jnp.float32))
    b = np.asarray(sample_crops_pallas(frame, geo, sample_dtype=jnp.float32,
                                       interpret=True))
    np.testing.assert_allclose(b, a, atol=5e-3)


def test_pose_step_with_pallas_sampler():
    from easy_vitpose_tpu.configs import (BackboneConfig, HeadConfig,
                                          ModelConfig)
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
                             sampler="pallas_interpret"))
    np.testing.assert_allclose(b, a, atol=2e-2)  # kpt px on near-flat maps
