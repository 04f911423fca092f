"""Pipeline semantics tests: detector cadence (yolo_step), tracker wiring,
and state-saving — the behavioural contract of the reference orchestrator
(easy_ViTPose/inference.py:221-281)."""
import numpy as np
import pytest

from easy_vitpose_tpu.pipeline.inference import VitInference
from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.utils.checkpoint import save_params
from tests.test_model_parity import CASES, load_case


class CountingDetector:
    """Stub detector that records call count and returns one box."""

    def __init__(self):
        self.calls = 0
        self.conf = 0.25

    def __call__(self, img, frame_hw=None):
        self.calls += 1
        return np.array([[50, 40, 150, 200, 0.9, 0]], np.float32)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, CASES["tiny"])
    path = tmp_path_factory.mktemp("m") / "vitpose-s-coco.npz"
    save_params(str(path), params)
    m = VitInference(str(path), model_name="s", dataset="coco",
                     is_video=True, yolo_step=4)
    m.cfg = CASES["tiny"]
    return m


def _frame():
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    f = np.stack([np.sin(xx / 13), np.cos(yy / 17), xx * 0 + 0.5], -1)
    return ((f - f.min()) / (np.ptp(f) + 1e-9) * 255).astype(np.uint8)


def test_yolo_step_cadence(model):
    """Detector runs on frames 0,1,2 (warm-up) then every yolo_step frames
    (reference inference.py:235-236)."""
    det = CountingDetector()
    model._detector = det
    model.reset()
    img = _frame()
    for _ in range(12):
        model.inference(img)
    # frames 0..2 always, then 4 and 8 (multiples of yolo_step=4)
    assert det.calls == 5


def test_tracker_coasts_between_detections(model):
    det = CountingDetector()
    model._detector = det
    model.reset()
    img = _frame()
    ids_seen = []
    for _ in range(8):
        out = model.inference(img)
        ids_seen.append(sorted(out.keys()))
    # after warm-up the same single track id persists incl. coasted frames
    assert all(ids == ids_seen[3] for ids in ids_seen[3:])
    assert len(ids_seen[-1]) == 1


def test_single_pose_disables_tracker(tmp_path):
    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, CASES["tiny"])
    path = str(tmp_path / "vitpose-s-coco.npz")
    save_params(path, params)
    m = VitInference(path, model_name="s", dataset="coco",
                     is_video=True, single_pose=True)
    assert m.tracker is None
    m2 = VitInference(path, model_name="s", dataset="coco", is_video=False)
    assert m2.tracker is None


def test_save_state_for_draw(model):
    model._detector = CountingDetector()
    model.reset()
    img = _frame()
    model.inference(img)
    assert model._img is not None
    assert model._keypoints is not None
    assert isinstance(model._scores_bbox, dict)


def test_det_class_mapping(tmp_path):
    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, CASES["tiny"])
    path = str(tmp_path / "vitpose-s-ap10k.npz")
    save_params(path, params)
    m = VitInference(path, model_name="s", is_video=False)
    assert m.dataset == "ap10k"
    assert m.det_class == "animals"
    assert m.yolo_classes == [15, 16, 17, 18, 19, 20, 21, 22, 23]
