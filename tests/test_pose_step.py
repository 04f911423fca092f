"""Fused pose-step tests vs the reference end-to-end oracle.

pipeline_golden.npz: random frame + 5 tricky boxes -> reference-path crops and
keypoints (tiny model).  Our fused on-device step must reproduce keypoints to
sub-pixel tolerance (the only permitted divergence is cv2's uint8 fixed-point
resize vs our float bilinear sampling).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import IMAGE_SIZE
from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.ops.preprocess import crop_geometry, sample_crops
from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit, bucket_slots
from tests.test_model_parity import CASES, load_case

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pipeline_golden.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def tiny_params():
    sd, _, _ = load_case("tiny")
    return convert_vitpose_state_dict(sd, CASES["tiny"])


def test_crop_sampling_matches_reference(g):
    """On-device crop sampler vs host crop->pad->cv2.resize (uint8)."""
    frame = jnp.asarray(g["frame"])
    geo = crop_geometry(jnp.asarray(g["boxes"]), frame.shape[:2])
    crops = np.asarray(sample_crops(frame, geo, IMAGE_SIZE)) / 255.0
    ref = g["crops"]
    # uint8 resize quantizes to 1/255 per pixel; allow a few LSBs.
    assert np.abs(crops - ref).max() < 3.5 / 255.0
    assert np.abs(crops - ref).mean() < 0.5 / 255.0


def test_pose_step_matches_reference_keypoints(g, tiny_params):
    cfg = CASES["tiny"]
    boxes = g["boxes"]
    M = bucket_slots(len(boxes))
    boxes_p = np.zeros((M, 4), np.float32)
    boxes_p[:len(boxes)] = boxes
    mask = np.zeros((M,), bool)
    mask[:len(boxes)] = True
    out = np.asarray(pose_step_jit(tiny_params, jnp.asarray(g["frame"]),
                                   jnp.asarray(boxes_p), jnp.asarray(mask), cfg))
    ref = g["keypoints"]
    got = out[:len(boxes)]
    # scores must agree everywhere (argmax VALUE is tie-insensitive)
    assert np.abs(got[..., 2] - ref[..., 2]).max() < 1e-5
    # coords: a random-weight fixture model can have exactly tied heatmap
    # peaks whose argmax flips under 1e-7 float noise — allow a couple of tie
    # flips, but a geometry bug would shift a whole box, so demand the 95th
    # percentile is sub-pixel-tight.
    d_yx = np.abs(got[..., :2] - ref[..., :2])
    frac_good = (d_yx.max(-1) < 0.5).mean()
    assert frac_good >= 0.97, (frac_good, d_yx.max())
    assert np.percentile(d_yx, 95) < 0.1
    # masked slots exactly zero
    assert np.all(out[len(boxes):] == 0)


def test_bucket_slots():
    assert bucket_slots(0) == 1
    assert bucket_slots(1) == 1
    assert bucket_slots(3) == 4
    assert bucket_slots(17) == 32
    assert bucket_slots(1000) == 64


def test_bf16_sampling_close_to_f32(g):
    """bf16 crop sampling must stay within uint8-quantization-scale error."""
    import jax.numpy as jnp
    frame = jnp.asarray(g["frame"])
    geo = crop_geometry(jnp.asarray(g["boxes"]), frame.shape[:2])
    f32 = np.asarray(sample_crops(frame, geo, IMAGE_SIZE))
    b16 = np.asarray(sample_crops(frame, geo, IMAGE_SIZE,
                                  sample_dtype=jnp.bfloat16)).astype(np.float32)
    d = np.abs(f32 - b16)
    # two bf16-rounded lerp stages: ~0.5 LSB each; mean well below 1 LSB and
    # worst case ~2.6 LSB — smaller than bf16 model-forward noise downstream
    assert d.mean() < 0.5 and d.max() < 3.0


def test_matmul_sampler_matches_gather(g):
    import jax.numpy as jnp
    from easy_vitpose_tpu.ops.preprocess import sample_crops_matmul
    frame = jnp.asarray(g["frame"])
    geo = crop_geometry(jnp.asarray(g["boxes"]), frame.shape[:2])
    ref = np.asarray(sample_crops(frame, geo, IMAGE_SIZE))
    mm = np.asarray(sample_crops_matmul(frame, geo, IMAGE_SIZE,
                                        sample_dtype=jnp.float32))
    np.testing.assert_allclose(mm, ref, atol=1e-4)


def test_pose_step_matmul_sampler(g, tiny_params):
    cfg = CASES["tiny"]
    boxes = g["boxes"]
    M = bucket_slots(len(boxes))
    boxes_p = np.zeros((M, 4), np.float32)
    boxes_p[:len(boxes)] = boxes
    mask = np.zeros((M,), bool)
    mask[:len(boxes)] = True
    import jax.numpy as jnp
    a = np.asarray(pose_step_jit(tiny_params, jnp.asarray(g["frame"]),
                                 jnp.asarray(boxes_p), jnp.asarray(mask), cfg))
    b = np.asarray(pose_step_jit(tiny_params, jnp.asarray(g["frame"]),
                                 jnp.asarray(boxes_p), jnp.asarray(mask), cfg,
                                 sampler="matmul"))
    # same crops (1e-4) -> same heatmaps -> scores equal, coords equal except
    # possible argmax ties on this random-weight model
    assert np.abs(a[..., 2] - b[..., 2]).max() < 1e-4
    d = np.abs(a[..., :2] - b[..., :2])
    assert (d.max(-1) < 0.5).mean() >= 0.97
