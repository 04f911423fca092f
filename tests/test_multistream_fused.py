"""Single-dispatch multi-stream ticks (pipeline/fused_detect.py::
detect_pose_multi + MultiStreamPose(single_dispatch=True)).

Contract (same as the single-stream fusion, tests/test_fused_detect.py):
* track IDs are identical to the two-program path — association runs on
  host from the same detections, after the single fetch;
* keypoints are computed from the RAW detection boxes rather than the
  Kalman-updated ones (documented semantics), so only shape/finiteness is
  pinned against the two-program path, while slot alignment is pinned
  EXACTLY against the standalone fused program;
* the pipelined fused tick returns the sync fused tick's results one tick
  late (the fused program depends only on its own frames, so tick t
  dispatches before tick t-1 is fetched).
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
from easy_vitpose_tpu.detect.yolo import (YoloDetector, YoloSpec,
                                          init_yolo_params,
                                          letterbox_geometry)
from easy_vitpose_tpu.pipeline.stream import MultiStreamPose
from tests.test_model_parity import CASES, load_case


@pytest.fixture(scope="module")
def tiny_params():
    sd, _, _ = load_case("tiny")
    return convert_vitpose_state_dict(sd, CASES["tiny"])


@pytest.fixture(scope="module")
def detector():
    params = init_yolo_params(jax.random.PRNGKey(0), YoloSpec("n"))
    d = tempfile.mkdtemp()
    p = os.path.join(d, "yolov8n.npz")
    save_yolo_npz(p, params, "n", 80)
    # conf=-1 keeps every anchor in the NMS candidate set; random-weight
    # scores sit around sigmoid(~0)=0.5, so the 0.35 pipeline gate passes a
    # stable nonzero subset — deterministic detections on synthetic frames.
    return YoloDetector(p, imgsz=160, classes=None, conf=-1.0, max_det=8)


def _frame(seed, h=192, w=256):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f = np.stack([np.sin(xx / (11 + seed)), np.cos(yy / (13 + seed)),
                  np.sin((xx + yy) / (17 + seed))], -1)
    return ((f - f.min()) / (np.ptp(f) + 1e-9) * 255).astype(np.uint8)


def _make(tiny_params, detector, **kw):
    kw.setdefault("n_streams", 2)
    kw.setdefault("yolo_step", 1)
    kw.setdefault("max_people_per_stream", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    return MultiStreamPose(tiny_params, CASES["tiny"], detector=detector,
                           **kw)


def test_fused_ids_match_two_program_path(tiny_params, detector):
    ref = _make(tiny_params, detector)
    fus = _make(tiny_params, detector, single_dispatch=True)
    assert fus.single_dispatch and not ref.single_dispatch
    for t in range(4):
        frames = [_frame(t % 2), _frame(5 + t % 2)]
        a = ref.step(frames)
        b = fus.step(frames)
        for si in range(2):
            assert set(a[si]) == set(b[si]), f"tick {t} stream {si}"
            for tid, kp in b[si].items():
                assert kp.shape == (17, 3)
                assert np.isfinite(kp).all()


def test_fused_slots_match_standalone_program(tiny_params, detector):
    """Slot alignment is exact: keypoints keyed to track tid must be the
    fused program's row for that detection's packed index."""
    from easy_vitpose_tpu.pipeline.fused_detect import detect_pose_multi_jit
    from easy_vitpose_tpu.track.sort import sanitize_detections

    fus = _make(tiny_params, detector, single_dispatch=True)
    frames = [_frame(0), _frame(5)]
    res = fus.step(frames)

    frames_dev = jnp.asarray(np.stack(frames))
    H, W = frames_dev.shape[1:3]
    geom = letterbox_geometry(H, W, detector.imgsz, rect=detector.rect)
    packed, kpts = jax.device_get(detect_pose_multi_jit(
        detector.params, tiny_params, frames_dev, geom, detector.spec,
        detector.classes, detector.conf, detector.iou, detector.max_det,
        detector.dtype, CASES["tiny"], fus.max_pp, 0.35,
        compute_dtype=jnp.float32))

    # replay the host association against a fresh tracker copy
    fresh = _make(tiny_params, detector, single_dispatch=True)
    dets = YoloDetector.unpack_batch(packed, (H, W))
    for si in range(2):
        r = dets[si]
        res_pd = r[r[:, 4] > 0.35][:, :5]
        res_pd, kept = sanitize_detections(res_pd, return_indices=True)
        rows, det_idx = fresh.trackers[si].update(res_pd, det_indices=kept)
        for row, di in zip(rows, det_idx):
            tid = int(row[5])
            if 0 <= int(di) < fus.max_pp and tid in res[si]:
                np.testing.assert_array_equal(
                    res[si][tid], kpts[si * fus.max_pp + int(di)])


def test_fused_pipelined_matches_fused_sync(tiny_params, detector):
    frames_seq = [[_frame(0), _frame(5)], [_frame(1), _frame(6)],
                  [_frame(2), _frame(7)]]
    sync = _make(tiny_params, detector, single_dispatch=True)
    ref = [sync.step(f) for f in frames_seq]

    pipe = _make(tiny_params, detector, single_dispatch=True)
    got = [pipe.step_pipelined(f) for f in frames_seq]
    assert got[0] is None
    got = got[1:] + [pipe.flush()]

    for t in range(len(frames_seq)):
        for si in range(2):
            assert set(ref[t][si]) == set(got[t][si])
            for tid in ref[t][si]:
                np.testing.assert_array_equal(got[t][si][tid],
                                              ref[t][si][tid])


def test_fused_coast_rows_ride_fallback(tiny_params, detector):
    """Tracks emitted without an in-slot detection (coast on a no-detection
    tick under yolo_step>1, then a detection tick that misses them) must
    still get keypoints via the fallback dispatch."""
    fus = _make(tiny_params, detector, single_dispatch=True, yolo_step=3)
    # seed tracks with explicit boxes (plain path), then run fused ticks
    boxes = [np.array([[30, 20, 120, 170, 0.9]], np.float32),
             np.array([[100, 10, 240, 180, 0.8]], np.float32)]
    for _ in range(3):
        out = fus.step([_frame(0), _frame(5)],
                       boxes_per_stream=[b.copy() for b in boxes])
    for si in range(2):
        assert len(out[si]) == 1
    # yolo_step=3: tick 3 is a detection tick (fused), ticks 4-5 coast (plain)
    for t in range(3):
        out = fus.step([_frame(t % 2), _frame(5 + t % 2)])
        assert isinstance(out, list) and len(out) == 2
        for si in range(2):
            for kp in out[si].values():
                assert np.isfinite(kp).all()


def test_fused_requires_real_detector(tiny_params):
    """Stub detectors (no .params) silently fall back to the two-program
    path instead of crashing inside the fused dispatch."""

    class Stub:
        def detect_batch_async(self, frames):  # pragma: no cover
            raise AssertionError("unused")

    ms = MultiStreamPose(tiny_params, CASES["tiny"], detector=Stub(),
                         n_streams=2, compute_dtype=jnp.float32,
                         single_dispatch=True)
    assert not ms.single_dispatch


def test_fused_smoothing(tiny_params, detector):
    """smooth=True runs the same per-track One-Euro recursion on the fused
    path; dead tracks drop their filters."""
    fus = _make(tiny_params, detector, single_dispatch=True, smooth=True)
    raw = _make(tiny_params, detector, single_dispatch=True, smooth=False)
    frames = [_frame(0), _frame(5)]
    sm1 = fus.step(frames)
    rw1 = raw.step(frames)
    # first tick passes through
    for si in range(2):
        assert set(sm1[si]) == set(rw1[si])
        for tid in sm1[si]:
            np.testing.assert_allclose(sm1[si][tid], rw1[si][tid], rtol=1e-6)
    sm2 = fus.step(frames)
    rw2 = raw.step(frames)
    from easy_vitpose_tpu.ops.one_euro import OneEuroFilter
    for si in range(2):
        for tid in sm2[si]:
            if tid in rw1[si] and tid in rw2[si]:
                f = OneEuroFilter(rw1[si][tid][:, :2])
                want = f(rw2[si][tid][:, :2])
                np.testing.assert_allclose(sm2[si][tid][:, :2], want,
                                           rtol=1e-5, atol=1e-5)
