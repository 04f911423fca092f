"""yolo_step auto-tuning (pipeline/autotune.py + VitInference.set_yolo_step)."""
import numpy as np
import pytest

from easy_vitpose_tpu.pipeline.autotune import YoloStepAutoTuner


def test_raises_step_when_over_budget():
    t = YoloStepAutoTuner(target_fps=30, adjust_every=5)
    steps = [t.update(0.1) for _ in range(25)]  # 10 fps << 30 target
    assert steps[-1] > steps[0]
    assert steps[-1] <= t.max_step


def test_relaxes_step_with_headroom_and_hysteresis():
    t = YoloStepAutoTuner(target_fps=30, adjust_every=5)
    for _ in range(25):
        t.update(0.1)
    high = t.step
    # comfortably fast -> step back toward 1
    for _ in range(200):
        t.update(0.01)  # 100 fps
    assert t.step < high
    assert t.step >= t.min_step
    # inside the hysteresis band (0.9..1.25 target): hold steady
    t2 = YoloStepAutoTuner(target_fps=30, adjust_every=5)
    t2.step = 3
    for _ in range(50):
        t2.update(1 / 31.0)
    assert t2.step == 3


def test_set_yolo_step_retunes_tracker():
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
    from easy_vitpose_tpu.utils.checkpoint import save_params
    from tests.test_model_parity import CASES, load_case
    import tempfile, os
    sd, _, _ = load_case("tiny")
    d = tempfile.mkdtemp()
    ck = os.path.join(d, "vitpose-s-coco.npz")
    save_params(ck, convert_vitpose_state_dict(sd, CASES["tiny"]))
    m = VitInference(ck, model_name="s", model_cfg=CASES["tiny"],
                     is_video=True)
    assert m.tracker.max_age == 1 and m.tracker.min_hits == 3
    m.set_yolo_step(4)
    assert m.yolo_step == 4
    assert m.tracker.max_age == 4 and m.tracker.min_hits == 1
    m.set_yolo_step(1)
    assert m.tracker.max_age == 1 and m.tracker.min_hits == 3
    # tracker state survives retuning (unlike reset())
    boxes = np.array([[30, 20, 120, 170, 0.9]], np.float32)
    frame = np.zeros((240, 320, 3), np.uint8)
    m.inference(frame, bboxes=boxes)
    trk_before = len(m.tracker.trackers) if hasattr(m.tracker, "trackers") \
        else None
    m.set_yolo_step(3)
    trk_after = len(m.tracker.trackers) if hasattr(m.tracker, "trackers") \
        else None
    assert trk_before == trk_after
