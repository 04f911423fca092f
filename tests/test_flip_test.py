"""Flip-test averaging tests: on a horizontally symmetric scene, flip-test
must be a no-op up to float noise; on generic scenes it must stay close to
the plain forward (sanity that channel swapping/mirroring is wired right)."""
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit
from easy_vitpose_tpu.skeletons import flip_pairs
from tests.test_model_parity import CASES, load_case


@pytest.fixture(scope="module")
def tiny_params():
    sd, _, _ = load_case("tiny")
    return convert_vitpose_state_dict(sd, CASES["tiny"])


def test_flip_test_runs_and_stays_sane(tiny_params):
    cfg = CASES["tiny"]
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    f = np.stack([np.sin(xx / 13), np.cos(yy / 17), np.sin((xx + yy) / 23)], -1)
    frame = ((f - f.min()) / (np.ptp(f) + 1e-9) * 255).astype(np.uint8)
    boxes = jnp.asarray(np.array([[40, 30, 160, 200]], np.float32))
    mask = jnp.asarray(np.array([True]))
    fp = flip_pairs("coco")

    plain = np.asarray(pose_step_jit(tiny_params, jnp.asarray(frame), boxes,
                                     mask, cfg))
    flipped = np.asarray(pose_step_jit(tiny_params, jnp.asarray(frame), boxes,
                                       mask, cfg, flip_pairs=fp))
    assert flipped.shape == plain.shape
    assert np.isfinite(flipped).all()
    # averaging halves the effective noise; scores must stay comparable
    assert np.abs(flipped[..., 2] - plain[..., 2]).max() < 0.5


def test_flip_back_involution(tiny_params):
    """flip_back(flip_back(x)) == x when pairs are symmetric."""
    from easy_vitpose_tpu.ops.affine import flip_back_heatmaps
    rng = np.random.default_rng(0)
    hm = jnp.asarray(rng.normal(size=(2, 17, 8, 6)).astype(np.float32))
    fp = flip_pairs("coco")
    twice = flip_back_heatmaps(flip_back_heatmaps(hm, fp), fp)
    np.testing.assert_array_equal(np.asarray(twice), np.asarray(hm))


def test_vitinference_flip_test_flag(tmp_path):
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.utils.checkpoint import save_params
    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, CASES["tiny"])
    p = str(tmp_path / "vitpose-s-coco.npz")
    save_params(p, params)
    m = VitInference(p, model_name="s", dataset="coco", flip_test=True,
                     model_cfg=CASES["tiny"])
    img = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    out = m.inference(img, bboxes=np.array([[40, 30, 160, 200, 0.9]],
                                           np.float32))
    assert out[0].shape == (17, 3)
