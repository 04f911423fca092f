"""Single-dispatch detection frames (pipeline/fused_detect.py): the fused
detector+pose program must reproduce the two-program path.

* tracker-less (image) mode: EXACT equivalence — same detections, same
  keypoints (the fused program feeds nms_fixed's score-sorted valid prefix
  straight into the pose sampler; the host path conf-gates + caps the same
  prefix).
* video tracker mode: identical track IDs (association runs on host from
  the same fetch); keypoints are computed from the RAW detection boxes
  rather than the Kalman-updated ones (documented semantics), so only
  finiteness/shape is pinned there.
"""
import jax
import numpy as np
import pytest

from easy_vitpose_tpu import VitInference
from tests.test_model_parity import CASES
from tests.test_vitinference import ckpt_npz, yolo_npz  # noqa: F401 (fixtures)


def _frame(seed=0, h=240, w=320):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f = np.stack([np.sin(xx / (11 + seed)), np.cos(yy / (13 + seed)),
                  np.sin((xx + yy) / (17 + seed))], -1)
    return ((f - f.min()) / (np.ptp(f) + 1e-9) * 255).astype(np.uint8)


def make(ckpt, yolo, **kw):
    return VitInference(ckpt, yolo=yolo, model_name="s",
                        model_cfg=CASES["tiny"], **kw)


def test_default_policy(ckpt_npz, yolo_npz):  # noqa: F811
    """single_dispatch defaults ON exactly where fusion is pinned exact:
    image and single_pose modes (no tracker); opt-in for video tracking."""
    assert make(ckpt_npz, yolo_npz, is_video=False).single_dispatch
    assert make(ckpt_npz, yolo_npz, is_video=True,
                single_pose=True).single_dispatch
    assert not make(ckpt_npz, yolo_npz, is_video=True).single_dispatch
    assert make(ckpt_npz, yolo_npz, is_video=True,
                single_dispatch=True).single_dispatch


def test_image_mode_exact_equivalence(ckpt_npz, yolo_npz):  # noqa: F811
    ref = make(ckpt_npz, yolo_npz, is_video=False, single_dispatch=False,
               max_people=8)
    fus = make(ckpt_npz, yolo_npz, is_video=False, single_dispatch=True,
               max_people=8)
    for seed in range(3):
        img = _frame(seed)
        a = ref.inference(img)
        b = fus.inference(img)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5)
        # draw state carries the same detections
        assert (ref._yolo_res is None) == (fus._yolo_res is None)
        if ref._yolo_res is not None:
            np.testing.assert_allclose(ref._yolo_res, fus._yolo_res,
                                       rtol=1e-5, atol=1e-4)


def test_video_mode_ids_match_two_program_path(ckpt_npz, yolo_npz):  # noqa: F811
    ref = make(ckpt_npz, yolo_npz, is_video=True, yolo_step=2, max_people=8)
    fus = make(ckpt_npz, yolo_npz, is_video=True, yolo_step=2,
               single_dispatch=True, max_people=8)
    for t in range(6):
        img = _frame(t % 3)
        a = ref.inference(img)
        b = fus.inference(img)
        assert set(a) == set(b), f"frame {t}: ids diverged"
        for k in b:
            assert b[k].shape == (17, 3)
            assert np.isfinite(b[k]).all()
    img2 = fus.draw()
    assert img2.shape == img.shape


def test_fused_zero_detection_frame_coasts(ckpt_npz, yolo_npz):  # noqa: F811
    """A detection frame with no boxes must still coast tracks through the
    fallback pose dispatch (old-path semantics) without crashing."""
    fus = make(ckpt_npz, yolo_npz, is_video=True, single_dispatch=True,
               max_people=8)
    # seed tracks via precomputed boxes (normal path), then hit the fused
    # path with a frame the random-weight detector may or may not fire on
    bb = np.array([[40, 30, 200, 220, 0.9]], np.float32)
    for _ in range(3):
        fus.inference(_frame(0), bboxes=bb)
    out = fus.inference(_frame(1))
    assert isinstance(out, dict)
    for k in out:
        assert np.isfinite(out[k]).all()


def test_single_dispatch_skipped_frames_use_old_path(ckpt_npz, yolo_npz):  # noqa: F811
    """yolo_step > 1: non-detection frames must go through the standard
    coast path (no detector in the program)."""
    fus = make(ckpt_npz, yolo_npz, is_video=True, yolo_step=3,
               single_dispatch=True, max_people=8)
    outs = [fus.inference(_frame(t % 2)) for t in range(5)]
    assert all(isinstance(o, dict) for o in outs)


def test_slot_rows_pad_beyond_max_det():
    """slots > max_det (the grow-only power-of-two bucket can legally
    exceed a small detector max_det): _slot_rows must zero-pad instead of
    silently truncating the pose batch, and the padded rows must fail
    _slot_mask's validity gate."""
    import jax.numpy as jnp
    from easy_vitpose_tpu.pipeline.fused_detect import _slot_mask, _slot_rows

    max_det, slots = 3, 8
    packed = np.zeros((max_det, 7), np.float32)
    packed[0] = [10, 20, 100, 120, 0.9, 0, 1]   # valid box
    packed[1] = [5, 5, 50, 60, 0.2, 0, 1]       # below gate
    packed[2] = [0, 0, 0, 0, 0, 0, 0]           # invalid slot

    rows = _slot_rows(jnp.asarray(packed), slots, max_det)
    assert rows.shape == (slots, 7)
    np.testing.assert_array_equal(np.asarray(rows[:max_det]), packed)
    np.testing.assert_array_equal(np.asarray(rows[max_det:]), 0.0)

    boxes, mask = _slot_mask(rows, 320, 240, gate=0.35)
    assert boxes.shape == (slots, 4)
    np.testing.assert_array_equal(
        np.asarray(mask), [True] + [False] * (slots - 1))

    # batched twin (detect_pose_multi path): leading stream axis
    rows_b = _slot_rows(jnp.asarray(packed)[None], slots, max_det)
    assert rows_b.shape == (1, slots, 7)
    np.testing.assert_array_equal(np.asarray(rows_b[0]), np.asarray(rows))

    # no-pad path untouched
    np.testing.assert_array_equal(
        np.asarray(_slot_rows(jnp.asarray(packed), 2, max_det)), packed[:2])


def test_track_and_cap_shared_stage():
    """track_and_cap (track/sort.py) is the ONE host tracking stage every
    pipeline shares: sanitize -> update -> finite-filter -> highest-score
    cap; tracker=None degrades to sanitize + cap."""
    from easy_vitpose_tpu.track.sort import Sort, track_and_cap

    dets = np.array([
        [10, 10, 50, 60, 0.9],
        [60, 40, 40, 80, 0.8],     # degenerate (x2 < x1): sanitized away
        [100, 100, 160, 180, 0.6],
        [200, 50, 240, 90, 0.95],
    ], np.float32)

    # tracker-less: sanitize + cap keeps the highest-scored boxes, det_idx
    # maps back into the ORIGINAL dets array
    rows, det_idx = track_and_cap(None, dets, cap=2)
    assert rows.shape == (2, 5)
    np.testing.assert_array_equal(det_idx, [3, 0])
    np.testing.assert_allclose(rows[:, 4], [0.95, 0.9])

    # with a tracker: rows carry ids, det_idx aligns row-for-row
    trk = Sort(max_age=3, min_hits=1, iou_threshold=0.3)
    rows, det_idx = track_and_cap(trk, dets, cap=8)
    assert rows.shape[1] == 6 and len(det_idx) == len(rows)
    assert set(det_idx) <= {0, 2, 3}            # sanitized det never matches

    # empty input stays well-formed
    rows, det_idx = track_and_cap(None, np.empty((0, 5), np.float32), cap=4)
    assert len(rows) == 0 and len(det_idx) == 0


def test_single_dispatch_slot_highwater(ckpt_npz, yolo_npz):  # noqa: F811
    """Unpinned slot count follows the grow-only high-water bucket (same
    policy as the two-program path), NOT max_people: a 2-person scene must
    not pose 64 static crops per detection frame. Overflow on ratchet
    frames rides the fallback pose dispatch, so outputs stay complete."""
    from easy_vitpose_tpu.pipeline.pose_step import bucket_slots
    fus = make(ckpt_npz, yolo_npz, is_video=True, single_dispatch=True,
               max_people=8)
    assert fus._slots_highwater == 0        # frame 1 compiles 1 slot
    out1 = fus.inference(_frame(0))
    hw1 = fus._slots_highwater
    n1 = 0 if fus._yolo_res is None else len(fus._yolo_res)
    assert hw1 <= bucket_slots(max(n1, len(out1), 1), max_slots=8)
    out2 = fus.inference(_frame(1))
    assert fus._slots_highwater >= hw1      # grow-only, never flaps down
    assert isinstance(out1, dict) and isinstance(out2, dict)

    # pinned mode bypasses the ratchet entirely
    pin = make(ckpt_npz, yolo_npz, is_video=True, single_dispatch=True,
               max_people=8, fixed_slots=4)
    pin.inference(_frame(0))
    assert pin._slots_highwater == 0
