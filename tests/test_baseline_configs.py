"""One test per BASELINE.json deployment config, exercising the real code
path of each at tiny scale (random weights; geometry/shapes/state machines
are what's under test — accuracy parity is covered by the golden suites).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit
from easy_vitpose_tpu.utils.checkpoint import save_params


def tiny_cfg(k=17):
    return ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=k,
                        deconv_filters=(32, 32)))


def _frame(seed=0, h=240, w=320):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f = np.stack([np.sin(xx / (11 + seed)), np.cos(yy / 13),
                  np.sin((xx + yy) / 17)], -1)
    return ((f - f.min()) / (np.ptp(f) + 1e-9) * 255).astype(np.uint8)


def test_config1_single_image_precomputed_bboxes(tmp_path):
    """ViTPose-S COCO, single image with precomputed bboxes."""
    from easy_vitpose_tpu import VitInference
    cfg = tiny_cfg(17)
    p = str(tmp_path / "vitpose-s-coco.npz")
    save_params(p, init_vitpose_params(jax.random.PRNGKey(0), cfg))
    m = VitInference(p, model_name="s", dataset="coco", model_cfg=cfg,
                     is_video=False)
    out = m.inference(_frame(), bboxes=np.array(
        [[40, 30, 160, 200, 0.9]], np.float32))
    assert out[0].shape == (17, 3)


def test_config2_coco25_video_yolo_sort(tmp_path):
    """ViTPose-B COCO+feet (25 kpts), video with YOLOv8n + SORT."""
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
    from easy_vitpose_tpu.detect.yolo import YoloSpec, init_yolo_params
    cfg = tiny_cfg(25)
    p = str(tmp_path / "vitpose-b-coco_25.npz")
    save_params(p, init_vitpose_params(jax.random.PRNGKey(0), cfg))
    yp = str(tmp_path / "yolov8n.npz")
    save_yolo_npz(yp, init_yolo_params(jax.random.PRNGKey(1), YoloSpec("n")),
                  "n", 80)
    m = VitInference(p, yolo=yp, model_name="b", model_cfg=cfg,
                     is_video=True, yolo_step=2)
    assert m.dataset == "coco_25"  # filename inference
    m._detector.conf = -1.0  # random weights: accept anything
    for i in range(4):
        out = m.inference(_frame(i))
        for k in out.values():
            assert k.shape == (25, 3)


def test_config3_wholebody_multiperson_batched():
    """ViT-L wholebody (133 kpts), multi-person batched crops per frame."""
    cfg = tiny_cfg(133)
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    boxes = np.array([[10, 10, 100, 200], [120, 20, 230, 210],
                      [50, 30, 180, 220], [5, 5, 60, 100]], np.float32)
    mask = np.array([True, True, True, False])
    out = np.asarray(pose_step_jit(params, jnp.asarray(_frame()),
                                   jnp.asarray(boxes), jnp.asarray(mask),
                                   cfg))
    assert out.shape == (4, 133, 3)
    assert np.all(out[3] == 0)  # masked slot
    assert np.isfinite(out[:3]).all()


def test_config4_animal_pose_det_classes(tmp_path):
    """ViT-H AP10k/APT36k animal pose with animal det classes."""
    from easy_vitpose_tpu import VitInference
    cfg = tiny_cfg(17)
    p = str(tmp_path / "vitpose-h-ap10k.npz")
    save_params(p, init_vitpose_params(jax.random.PRNGKey(0), cfg))
    m = VitInference(p, model_name="h", model_cfg=cfg, is_video=True)
    assert m.dataset == "ap10k"
    assert m.det_class == "animals"
    assert m.yolo_classes == [15, 16, 17, 18, 19, 20, 21, 22, 23]
    out = m.inference(_frame(), bboxes=np.array(
        [[20, 20, 200, 180, 0.9]], np.float32))
    assert out[1].shape == (17, 3)  # tracker id 1


def test_config5_eight_stream_serving():
    """Multi-stream serving: 8 streams batched per chip."""
    from easy_vitpose_tpu.pipeline.stream import MultiStreamPose
    cfg = tiny_cfg(17)
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    ms = MultiStreamPose(params, cfg, detector=None, n_streams=8,
                         yolo_step=1, compute_dtype=jnp.float32)
    frames = [_frame(i, 96, 128) for i in range(8)]
    boxes = [np.array([[10 + i, 8, 90 + i, 88, 0.9]], np.float32)
             for i in range(8)]
    for _ in range(2):
        res = ms.step(frames, [b.copy() for b in boxes])
    assert len(res) == 8
    for r in res:
        assert len(r) == 1
        assert r[1].shape == (17, 3)
