"""Offline batched video inference (VitInference.inference_batched):
window-of-frames results must match the sequential frame-by-frame path —
same SORT evolution, detection cadence, and keypoints.
"""
import jax
import numpy as np
import pytest

from easy_vitpose_tpu import VitInference
from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.utils.checkpoint import save_params
from tests.test_model_parity import CASES, load_case


@pytest.fixture(scope="module")
def ckpt_npz(tmp_path_factory):
    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, CASES["tiny"])
    path = tmp_path_factory.mktemp("ck") / "vitpose-s-coco.npz"
    save_params(str(path), params)
    return str(path)


@pytest.fixture(scope="module")
def yolo_npz(tmp_path_factory):
    from easy_vitpose_tpu.detect.yolo import YoloSpec, init_yolo_params
    from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
    params = init_yolo_params(jax.random.PRNGKey(0), YoloSpec("n"))
    path = tmp_path_factory.mktemp("yl") / "yolov8n.npz"
    save_yolo_npz(str(path), params, "n", 80)
    return str(path)


def _frames(n, h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    out = []
    for i in range(n):
        f = np.roll(base, 3 * i, axis=1)  # slow horizontal pan
        out.append(f)
    return out


def _boxes_seq(n):
    """Two people drifting across frames."""
    bs = []
    for i in range(n):
        bs.append(np.array([[30 + 2 * i, 20, 160 + 2 * i, 200, 0.9],
                            [100, 40 + i, 280, 230, 0.8]], np.float32))
    return bs


def _mk(ckpt, **kw):
    m = VitInference(ckpt, model_name="s", model_cfg=CASES["tiny"],
                     dataset="coco", is_video=True, dtype="fp32", **kw)
    return m


def test_batched_matches_sequential_precomputed_boxes(ckpt_npz):
    """Strict path (no detector noise): precomputed boxes, fp32, the same
    gather sampler on both paths."""
    frames = _frames(7)
    boxes = _boxes_seq(7)

    seq = _mk(ckpt_npz)
    seq_out = [seq.inference(f, bboxes=b) for f, b in zip(frames, boxes)]

    bat = _mk(ckpt_npz)
    got = (bat.inference_batched(frames[:4], bboxes_per_frame=boxes[:4])
           + bat.inference_batched(frames[4:], bboxes_per_frame=boxes[4:]))

    assert len(got) == 7
    for a, b in zip(seq_out, got):
        assert set(a) == set(b)  # identical track ids
        for pid in a:
            np.testing.assert_allclose(b[pid], a[pid], atol=1e-3)


def test_batched_detector_cadence_and_tracking(ckpt_npz, yolo_npz):
    """With a live detector and yolo_step=3 across two windows: track IDs
    and boxes must evolve identically to the sequential path (the detector
    runs batched, so keypoints are compared loosely, boxes tightly)."""
    frames = _frames(8, seed=2)

    seq = _mk(ckpt_npz, yolo=yolo_npz, yolo_step=3)
    seq_states = []
    for f in frames:
        seq.inference(f)
        bboxes, ids, scores = seq._tracker_res
        seq_states.append((bboxes.copy(), list(ids)))

    bat = _mk(ckpt_npz, yolo=yolo_npz, yolo_step=3)
    outs = bat.inference_batched(frames[:5]) + bat.inference_batched(
        frames[5:])
    assert len(outs) == 8
    # tracker evolution must match: same ids in the same frames
    for i, (f, out) in enumerate(zip(frames, outs)):
        assert sorted(out.keys()) == sorted(seq_states[i][1]), f"frame {i}"


def test_batched_flip_test_matches_sequential(ckpt_npz):
    """flip-test averaging must flow through the batched pose program —
    it used to be silently dropped (review finding)."""
    frames = _frames(4)
    boxes = _boxes_seq(4)
    seq = VitInference(ckpt_npz, model_name="s", model_cfg=CASES["tiny"],
                       dataset="coco", is_video=True, dtype="fp32",
                       flip_test=True)
    seq_out = [seq.inference(f, bboxes=b) for f, b in zip(frames, boxes)]
    bat = VitInference(ckpt_npz, model_name="s", model_cfg=CASES["tiny"],
                       dataset="coco", is_video=True, dtype="fp32",
                       flip_test=True)
    got = bat.inference_batched(frames, bboxes_per_frame=boxes)
    for a, b in zip(seq_out, got):
        assert set(a) == set(b)
        for pid in a:
            np.testing.assert_allclose(b[pid], a[pid], atol=1e-3)


def test_batched_empty_and_single_frame(ckpt_npz):
    m = _mk(ckpt_npz)
    assert m.inference_batched([]) == []
    frames = _frames(1)
    out = m.inference_batched(frames,
                              bboxes_per_frame=[np.empty((0, 5), np.float32)])
    assert out == [{}]


def test_batched_fuzz_equivalence(ckpt_npz):
    """Fuzz: random person counts per frame (incl. empty frames), uneven
    window sizes, yolo_step>1 cadence — batched track IDs and keypoints
    must match the sequential path on every frame."""
    rng = np.random.default_rng(11)
    n_frames = 13
    frames = _frames(n_frames, seed=5)
    boxes = []
    for i in range(n_frames):
        k = int(rng.integers(0, 4))  # 0..3 people
        if k == 0:
            boxes.append(np.empty((0, 5), np.float32))
        else:
            x1 = rng.uniform(0, 200, k)
            y1 = rng.uniform(0, 120, k)
            b = np.stack([x1, y1, x1 + rng.uniform(40, 110, k),
                          y1 + rng.uniform(60, 110, k),
                          rng.uniform(0.5, 1.0, k)], -1).astype(np.float32)
            boxes.append(b)

    seq = _mk(ckpt_npz, yolo_step=2)
    seq_out = [seq.inference(f, bboxes=b) for f, b in zip(frames, boxes)]

    bat = _mk(ckpt_npz, yolo_step=2)
    got = []
    for s, e in ((0, 5), (5, 6), (6, 13)):  # uneven windows
        got += bat.inference_batched(frames[s:e],
                                     bboxes_per_frame=boxes[s:e])

    for i, (a, b) in enumerate(zip(seq_out, got)):
        assert set(a) == set(b), f"frame {i}: ids {set(b)} != {set(a)}"
        for pid in a:
            np.testing.assert_allclose(b[pid], a[pid], atol=1e-3,
                                       err_msg=f"frame {i} id {pid}")


def test_batched_draw_state_replay(ckpt_npz):
    """select_frame_state points draw() at each frame of the window."""
    frames = _frames(3)
    boxes = _boxes_seq(3)
    m = _mk(ckpt_npz)
    outs = m.inference_batched(frames, bboxes_per_frame=boxes)
    for k in range(3):
        m.select_frame_state(k)
        img = m.draw(show_yolo=True, confidence_threshold=-1.0)
        assert img.shape == frames[k].shape
        assert m._keypoints == outs[k]
