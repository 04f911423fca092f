"""End-to-end checkpoint FILE loading (VERDICT r1 item 9): torch.save real
on-disk formats in-test, then drive the cli/convert CLI and the
VitInference/YoloDetector path-loading ctors — the code paths a user hits
with downloaded checkpoints (previously only exercised via in-memory
state dicts).
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from easy_vitpose_tpu import VitInference            # noqa: E402
from easy_vitpose_tpu.cli.convert import main as convert_main  # noqa: E402
from tests.test_model_parity import CASES, load_case  # noqa: E402


def _frame(h=240, w=320):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f = np.stack([np.sin(xx / 13), np.cos(yy / 17),
                  np.sin((xx + yy) / 23)], -1)
    return ((f - f.min()) / (np.ptp(f) + 1e-9) * 255).astype(np.uint8)


BOXES = np.array([[40, 30, 200, 220, 0.9]], np.float32)


@pytest.fixture(scope="module")
def pth_raw(tmp_path_factory):
    """A raw reference-format .pth (plain state dict of torch tensors)."""
    sd, _, _ = load_case("tiny")
    path = tmp_path_factory.mktemp("pth") / "vitpose-s-coco.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))
    return str(path)


def test_vitinference_loads_pth_file(pth_raw):
    m = VitInference(pth_raw, model_name="s", model_cfg=CASES["tiny"])
    out = m.inference(_frame(), bboxes=BOXES)
    assert out[0].shape == (17, 3)
    assert np.isfinite(out[0]).all()


def test_wrapped_module_prefixed_pth_matches_raw(pth_raw, tmp_path):
    """The reference's tolerant loader semantics ({'state_dict': ...} wrapper
    + 'module.' DDP prefixes, vit_utils/util.py:117-228) must load to the
    same network."""
    sd, _, _ = load_case("tiny")
    wrapped = {"state_dict": {"module." + k: torch.from_numpy(v)
                              for k, v in sd.items()}}
    path = str(tmp_path / "vitpose-s-coco.pth")
    torch.save(wrapped, path)
    a = VitInference(pth_raw, model_name="s",
                     model_cfg=CASES["tiny"]).inference(_frame(), bboxes=BOXES)
    b = VitInference(path, model_name="s",
                     model_cfg=CASES["tiny"]).inference(_frame(), bboxes=BOXES)
    np.testing.assert_array_equal(a[0], b[0])


def test_convert_cli_vitpose_production_geometry(tmp_path):
    """cli/convert vitpose on a production-geometry ViT-S .pth from the live
    reference oracle, then VitInference on both the .pth and the converted
    .npz -> identical keypoints."""
    if not os.path.isdir("/root/reference/easy_ViTPose"):
        pytest.skip("reference checkout not available")
    for name in ("torchvision", "torchvision.transforms", "matplotlib",
                 "matplotlib.pyplot", "ffmpeg"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, "/root/reference/easy_ViTPose")
    from vit_models.model import ViTPose
    cfg = dict(
        backbone=dict(type="ViT", img_size=(256, 192), patch_size=16,
                      embed_dim=384, depth=12, num_heads=12, ratio=1,
                      use_checkpoint=False, mlp_ratio=4, qkv_bias=True,
                      drop_path_rate=0.0),
        keypoint_head=dict(type="TopdownHeatmapSimpleHead", in_channels=384,
                           num_deconv_layers=2, num_deconv_filters=(256, 256),
                           num_deconv_kernels=(4, 4),
                           extra=dict(final_conv_kernel=1), out_channels=17))
    torch.manual_seed(0)
    model = ViTPose(cfg)
    pth = str(tmp_path / "vitpose-s-coco.pth")
    torch.save(model.state_dict(), pth)

    npz = str(tmp_path / "vitpose-s-coco.npz")
    convert_main(["vitpose", "--ckpt", pth, "--model-name", "s",
                  "--out", npz])  # dataset inferred from the filename
    a = VitInference(pth, model_name="s").inference(_frame(), bboxes=BOXES)
    b = VitInference(npz, model_name="s").inference(_frame(), bboxes=BOXES)
    np.testing.assert_array_equal(a[0], b[0])


# ------------------------------------------------------------------- YOLO

class FakeUltralyticsModel(torch.nn.Module):
    """Stand-in for the pickled ultralytics DetectionModel inside a .pt:
    torch.load(weights_only=False) unpickles the class (importable from this
    test module) and the loader only touches .float()/.state_dict()."""

    def __init__(self, sd=None):
        super().__init__()
        self._sd = sd or {}

    def state_dict(self, *a, **k):  # noqa: D102
        return self._sd


def test_yolo_pt_file_roundtrip(tmp_path):
    """ultralytics-layout .pt -> cli/convert yolo -> .npz; YoloDetector loads
    BOTH file formats and produces identical detections."""
    from easy_vitpose_tpu.detect.yolo import YoloDetector, YoloSpec
    from tests.test_yolo_torch_parity import TYolo, _ultra_state_dict

    torch.manual_seed(0)
    tm = TYolo(YoloSpec("n"))
    tm.eval()
    sd = {k: torch.from_numpy(np.asarray(v)) if not torch.is_tensor(v) else v
          for k, v in _ultra_state_dict(tm).items()}
    pt = str(tmp_path / "yolov8n.pt")
    torch.save({"model": FakeUltralyticsModel(sd), "train_args": {}}, pt)

    npz = str(tmp_path / "yolov8n.npz")
    convert_main(["yolo", "--ckpt", pt, "--out", npz])

    frame = _frame()
    det_pt = YoloDetector(pt, imgsz=160)
    det_npz = YoloDetector(npz, imgsz=160)
    a = det_pt(frame, frame_hw=frame.shape[:2])
    b = det_npz(frame, frame_hw=frame.shape[:2])
    assert det_pt.spec.scale == "n" and det_pt.spec.nc == 80
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# --------------------------------------------------- inverse (JAX -> torch)

def test_export_inverts_convert_on_golden_sd():
    """export_vitpose_state_dict is the exact inverse of the forward
    converter: golden reference-layout sd -> params -> sd' bitwise equal."""
    from easy_vitpose_tpu.convert.vitpose_torch import (
        convert_vitpose_state_dict, export_vitpose_state_dict)

    cfg = CASES["tiny"]
    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, cfg)
    sd2 = export_vitpose_state_dict(params, cfg)

    float_keys = {k for k, v in sd.items()
                  if np.issubdtype(np.asarray(v).dtype, np.floating)}
    assert float_keys == {k for k, v in sd2.items()
                          if np.issubdtype(np.asarray(v).dtype, np.floating)}
    for k in sorted(float_keys):
        np.testing.assert_array_equal(
            np.asarray(sd[k], np.float32), sd2[k], err_msg=k)


def test_params_roundtrip_through_torch_layout():
    """Fresh params -> reference-layout sd -> params again: exact pytree
    equality (layout transforms are lossless permutations at f32)."""
    import jax

    from easy_vitpose_tpu.convert.vitpose_torch import (
        convert_vitpose_state_dict, export_vitpose_state_dict)
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params

    cfg = CASES["tiny"]
    params = jax.tree.map(np.asarray,
                          init_vitpose_params(jax.random.PRNGKey(3), cfg))
    back = convert_vitpose_state_dict(
        export_vitpose_state_dict(params, cfg), cfg)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(params))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_convert_cli_to_torch_e2e(tmp_path):
    """cli/convert to-torch writes a .pth that loads through the torch-ckpt
    path and matches the source .npz keypoint-for-keypoint (ViT-S geometry)."""
    import jax

    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    cfg = get_model_config("coco", "s")
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    npz = str(tmp_path / "vitpose-s-coco.npz")
    save_params(npz, jax.tree.map(np.asarray, params))

    pth = str(tmp_path / "vitpose-s-coco.pth")
    convert_main(["to-torch", "--ckpt", npz, "--model-name", "s",
                  "--out", pth])  # dataset inferred from the filename

    a = VitInference(npz, model_name="s").inference(_frame(), bboxes=BOXES)
    b = VitInference(pth, model_name="s").inference(_frame(), bboxes=BOXES)
    np.testing.assert_array_equal(a[0], b[0])
