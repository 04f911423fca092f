"""SORT tracker semantics tests (behaviour spec from reference sort.py:203-266).

No filterpy is available, so Kalman correctness is checked against hand-built
dense linear algebra and physical behaviour (constant-velocity extrapolation),
and the tracker against the reference's documented state machine: min_hits
warm-up, id stability, Hungarian crossing, empty-detection coasting, max_age.
"""
import numpy as np

from easy_vitpose_tpu.track import kalman
from easy_vitpose_tpu.track.sort import Sort, associate


def box(x, y, w=20.0, h=40.0, s=0.9):
    return np.array([x, y, x + w, y + h, s], np.float32)


def test_bbox_z_roundtrip():
    b = np.array([10.0, 20.0, 50.0, 100.0])
    z = kalman.bbox_to_z(b)
    np.testing.assert_allclose(z, [30, 60, 40 * 80, 0.5], rtol=1e-6)
    np.testing.assert_allclose(kalman.x_to_bbox(np.concatenate([z, [0, 0, 0]])),
                               b, rtol=1e-5)


def test_kalman_update_matches_dense_formula():
    rng = np.random.default_rng(0)
    z0 = kalman.bbox_to_z(np.array([[5.0, 5.0, 45.0, 85.0]]))
    x, P = kalman.init_state(z0)
    x, P = kalman.predict(x, P)
    z1 = kalman.bbox_to_z(np.array([[7.0, 6.0, 47.0, 86.0]]))
    x2, P2 = kalman.update(x, P, z1)
    # dense single-filter reference computation (Joseph form)
    F, H, R, I = kalman.F, kalman.H, kalman.R, kalman.I7
    xd, Pd = x[0], P[0]
    y = z1[0] - H @ xd
    S = H @ Pd @ H.T + R
    K = Pd @ H.T @ np.linalg.inv(S)
    xn = xd + K @ y
    IKH = I - K @ H
    Pn = IKH @ Pd @ IKH.T + K @ R @ K.T
    np.testing.assert_allclose(x2[0], xn, rtol=1e-5)
    np.testing.assert_allclose(P2[0], Pn, rtol=1e-4, atol=1e-5)


def test_kalman_learns_constant_velocity():
    x, P = kalman.init_state(kalman.bbox_to_z(np.array([[0.0, 0, 20, 40]])))
    for t in range(1, 10):
        x, P = kalman.predict(x, P)
        z = kalman.bbox_to_z(np.array([[5.0 * t, 0, 20 + 5.0 * t, 40]]))
        x, P = kalman.update(x, P, z)
    x, P = kalman.predict(x, P)
    b = kalman.x_to_bbox(x)[0]
    assert abs(b[0] - 50.0) < 1.5  # extrapolates ~5px/frame motion


def test_min_hits_warmup_and_id_stability():
    t = Sort(max_age=1, min_hits=3, iou_threshold=0.3)
    # during the first min_hits frames, tracks are emitted immediately
    out1 = t.update(box(0, 0)[None])
    assert len(out1) == 1 and out1[0, 5] == 1
    out2 = t.update(box(2, 0)[None])
    assert len(out2) == 1 and out2[0, 5] == 1  # same id
    for i in range(5):
        out = t.update(box(4 + 2 * i, 0)[None])
        assert len(out) == 1 and out[0, 5] == 1


def test_new_track_needs_min_hits_after_warmup():
    t = Sort(max_age=1, min_hits=3, iou_threshold=0.3)
    for i in range(5):
        t.update(box(2 * i, 0)[None])
    # a brand-new detection: not emitted until hit_streak reaches min_hits=3,
    # i.e. creation + 3 further consecutive detections (reference sort.py:253)
    d2 = box(300, 300)
    out = t.update(np.stack([box(10, 0), d2]))
    assert set(out[:, 5]) == {1}
    out = t.update(np.stack([box(12, 0), box(301, 300)]))
    assert set(out[:, 5]) == {1}
    out = t.update(np.stack([box(14, 0), box(302, 300)]))
    assert set(out[:, 5]) == {1}
    out = t.update(np.stack([box(16, 0), box(303, 300)]))
    assert set(out[:, 5]) == {1, 2}


def test_empty_dets_coasts_all_tracks():
    t = Sort(max_age=3, min_hits=1, iou_threshold=0.3)
    for i in range(3):
        t.update(box(5 * i, 0)[None])
    out = t.update(np.empty((0, 5)))
    assert len(out) == 1  # coasted prediction, same id
    assert out[0, 5] == 1
    assert out[0, 0] > 10.0  # moved forward by the velocity model


def test_max_age_retirement():
    t = Sort(max_age=1, min_hits=1, iou_threshold=0.3)
    t.update(box(0, 0)[None])
    t.update(np.empty((0, 5)))   # tsu=1
    t.update(np.empty((0, 5)))   # tsu=2 > max_age -> retired after emit
    t.update(box(0, 0)[None])    # new track created (not yet emitted)
    out = t.update(box(0, 0)[None])
    assert out[0, 5] == 2  # old id gone, new track id


def test_crossing_tracks_hungarian():
    t = Sort(max_age=2, min_hits=1, iou_threshold=0.1)
    # two boxes approaching each other; Hungarian must keep ids consistent
    for i in range(8):
        a = box(10.0 * i, 0)
        b = box(100 - 10.0 * i, 2)
        out = t.update(np.stack([a, b]))
    ids = {}
    for r in out:
        ids[int(r[5])] = r[0]
    assert len(ids) == 2  # no id churn


def test_associate_empty():
    m, ud, ut = associate(np.zeros((3, 5)), np.zeros((0, 4)), 0.3)
    assert len(m) == 0 and list(ud) == [0, 1, 2]


def test_update_with_det_indices_returns_tuple():
    """The extended call form returns (rows, emitted_det_idx); the plain
    call keeps the reference Sort.update contract (rows only) and the
    per-call result is never surfaced as a mutable attribute."""
    t = Sort(max_age=2, min_hits=1, iou_threshold=0.3)
    rows = t.update(box(0, 0)[None])
    assert isinstance(rows, np.ndarray) and rows.shape == (1, 6)
    assert not hasattr(t, "emitted_det_idx")

    dets = np.stack([box(0, 0), box(300, 300)])
    rows, emitted = t.update(dets, det_indices=np.array([7, 9]))
    # the matched track maps to global det index 7 (the fresh spawn at
    # (300,300) is still min_hits-warm and not emitted this frame)
    got = {int(r[5]): int(d) for r, d in zip(rows, emitted)}
    assert got == {1: 7}
    # next frame the spawned track has its hit streak and emits too
    rows, emitted = t.update(dets, det_indices=np.array([7, 9]))
    got = {int(r[5]): int(d) for r, d in zip(rows, emitted)}
    assert got == {1: 7, 2: 9}

    # coast frame: emitted rows carry -1 (no detection this frame)
    rows, emitted = t.update(np.empty((0, 5)),
                             det_indices=np.empty((0,), int))
    assert len(rows) and (emitted == -1).all()
