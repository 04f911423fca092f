"""Multi-stream serving tests: the batched tall-frame path must produce the
same keypoints as running each stream's frame through the single-frame fused
step independently."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit
from easy_vitpose_tpu.pipeline.stream import MultiStreamPose, _pose_multi_frame
from tests.test_model_parity import CASES, load_case


@pytest.fixture(scope="module")
def tiny_params():
    sd, _, _ = load_case("tiny")
    return convert_vitpose_state_dict(sd, CASES["tiny"])


def _frame(seed, h=192, w=256):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f = np.stack([np.sin(xx / (11 + seed)), np.cos(yy / (13 + seed)),
                  np.sin((xx + yy) / (17 + seed))], -1)
    return ((f - f.min()) / (np.ptp(f) + 1e-9) * 255).astype(np.uint8)


def test_multiframe_matches_per_frame(tiny_params):
    cfg = CASES["tiny"]
    frames = np.stack([_frame(0), _frame(3)])
    boxes = np.array([[30, 20, 120, 170],     # stream 0
                      [100, 10, 240, 180],    # stream 1
                      [5, 5, 80, 150]],       # stream 1, edge-touching
                     np.float32)
    fidx = np.array([0, 1, 1], np.int32)
    mask = np.array([True, True, True])

    batched = np.asarray(_pose_multi_frame(
        tiny_params, jnp.asarray(frames), jnp.asarray(boxes),
        jnp.asarray(fidx), jnp.asarray(mask), cfg,
        compute_dtype=jnp.float32))

    for i in range(3):
        single = np.asarray(pose_step_jit(
            tiny_params, jnp.asarray(frames[fidx[i]]),
            jnp.asarray(boxes[i][None]), jnp.asarray(np.array([True])), cfg))
        np.testing.assert_allclose(batched[i], single[0], atol=1e-3)


def test_multistream_class_end_to_end(tiny_params):
    cfg = CASES["tiny"]
    ms = MultiStreamPose(tiny_params, cfg, detector=None, n_streams=2,
                         yolo_step=1, compute_dtype=jnp.float32)
    frames = [_frame(0), _frame(5)]
    boxes = [np.array([[30, 20, 120, 170, 0.9]], np.float32),
             np.array([[100, 10, 240, 180, 0.8]], np.float32)]
    for _ in range(3):
        res = ms.step(frames, [b.copy() for b in boxes])
    assert len(res) == 2
    assert len(res[0]) == 1 and len(res[1]) == 1
    for stream_res in res:
        for k in stream_res.values():
            assert k.shape == (17, 3)
            assert np.isfinite(k).all()
    # track ids are per-stream stable
    assert list(res[0]) == [1] and list(res[1]) == [1]


def test_detect_batch_matches_single():
    """Batched multi-frame detection must equal per-frame detection."""
    import jax
    from easy_vitpose_tpu.detect.yolo import YoloSpec, init_yolo_params, YoloDetector
    from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
    import tempfile, os
    params = init_yolo_params(jax.random.PRNGKey(0), YoloSpec("n"))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "yolov8n.npz")
        save_yolo_npz(p, params, "n", 80)
        det = YoloDetector(p, imgsz=160, classes=None, conf=-1.0)
        frames = np.stack([_frame(0, 120, 160), _frame(7, 120, 160)])
        batched = det.detect_batch(frames)
        singles = [det(frames[0]), det(frames[1])]
    assert len(batched) == 2
    for b, s in zip(batched, singles):
        assert b.shape == s.shape
        np.testing.assert_allclose(b, s, atol=1e-3)


class _StubDetector:
    """Deterministic batched detector stub with the async/unpack protocol."""

    def __init__(self, boxes_per_stream):
        self.boxes = boxes_per_stream  # list of (N, 6) per stream

    def detect_batch_async(self, frames_dev):
        import jax.numpy as jnp
        mx = max(len(b) for b in self.boxes)
        packed = np.zeros((len(self.boxes), mx, 7), np.float32)
        for s, b in enumerate(self.boxes):
            packed[s, :len(b), :6] = b
            packed[s, :len(b), 6] = 1.0
        return jnp.asarray(packed)  # device array, not fetched

    @staticmethod
    def unpack_batch(packed, frame_hw):
        from easy_vitpose_tpu.detect.yolo import YoloDetector
        return YoloDetector.unpack_batch(packed, frame_hw)


def test_pipelined_matches_sync(tiny_params):
    """step_pipelined must produce the sync step()'s results, one tick late
    (VERDICT r1 item 6: detect(t) dispatched before pose(t-1) is fetched)."""
    cfg = CASES["tiny"]
    det_boxes = [
        np.array([[30, 20, 120, 170, 0.9, 0]], np.float32),
        np.array([[100, 10, 240, 180, 0.8, 0],
                  [5, 5, 80, 150, 0.7, 0]], np.float32)]

    def make():
        return MultiStreamPose(tiny_params, cfg,
                               detector=_StubDetector(det_boxes),
                               n_streams=2, yolo_step=1,
                               compute_dtype=jnp.float32)

    frames_seq = [[_frame(0), _frame(5)], [_frame(1), _frame(6)],
                  [_frame(2), _frame(7)]]
    sync = make()
    ref = [sync.step(f) for f in frames_seq]

    pipe = make()
    got = [pipe.step_pipelined(f) for f in frames_seq]
    assert got[0] is None
    got = got[1:] + [pipe.flush()]

    for t in range(len(frames_seq)):
        assert set(ref[t][0]) == set(got[t][0])
        assert set(ref[t][1]) == set(got[t][1])
        for s in range(2):
            for tid in ref[t][s]:
                np.testing.assert_allclose(got[t][s][tid], ref[t][s][tid],
                                           atol=1e-5)


def test_multistream_smoothing_matches_single_filter():
    """smooth=True runs the same per-track One-Euro recursion the
    single-stream pipeline uses: replaying one stream's outputs through a
    standalone filter reproduces the smoothed trajectory; first frame
    passes through; a vanished track's filter is dropped."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.ops.one_euro import OneEuroFilter
    from easy_vitpose_tpu.pipeline.stream import MultiStreamPose
    from tests.test_model_parity import CASES

    cfg = CASES["tiny"]
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ms = MultiStreamPose(params, cfg, n_streams=2,
                         max_people_per_stream=2,
                         compute_dtype=jnp.float32, smooth=True)
    ms_raw = MultiStreamPose(params, cfg, n_streams=2,
                             max_people_per_stream=2,
                             compute_dtype=jnp.float32, smooth=False)
    frames = [rng.integers(0, 255, (96, 128, 3), np.uint8)
              for _ in range(2)]
    boxes = [np.array([[10, 10, 90, 90, 0.9]], np.float32),
             np.array([[20, 8, 100, 88, 0.9]], np.float32)]
    smoothed_t, raw_t = [], []
    for t in range(4):
        sm = ms.step(frames, boxes_per_stream=boxes)
        rw = ms_raw.step(frames, boxes_per_stream=boxes)
        smoothed_t.append(sm)
        raw_t.append(rw)
    # track ids stabilize from the first tick with gt boxes; replay the
    # raw stream-0 trajectory through a standalone filter
    tid = next(iter(raw_t[0][0]))
    f = None
    for t in range(4):
        kp_raw = raw_t[t][0][tid]
        kp_sm = smoothed_t[t][0][tid]
        if f is None:
            f = OneEuroFilter(kp_raw[:, :2])
            np.testing.assert_allclose(kp_sm, kp_raw, rtol=1e-6)
        else:
            want = f(kp_raw[:, :2])
            np.testing.assert_allclose(kp_sm[:, :2], want, rtol=1e-5,
                                       atol=1e-5)
        np.testing.assert_allclose(kp_sm[:, 2], kp_raw[:, 2], rtol=1e-6)
    assert ms._smoothers[0]  # live track has a filter
    # empty tick -> filters dropped
    empty = [np.zeros((0, 5), np.float32)] * 2
    for _ in range(3):  # exceed max_age so the tracks actually die
        ms.step(frames, boxes_per_stream=empty)
    assert not ms._smoothers[0] and not ms._smoothers[1]
