"""ByteTrack (BYTE two-stage association) behaviour tests.

The scenario matrix: equivalence with Sort when no low-confidence boxes
exist, identity survival through a low-confidence (blur/occlusion) window
where Sort drops the track, no-spawn/no-confirm guarantees for low boxes,
and the stricter second-association IoU gate."""
import numpy as np

from easy_vitpose_tpu.track.bytetrack import ByteTrack
from easy_vitpose_tpu.track.sort import Sort


def box(x, y, w=40.0, h=80.0, s=0.9):
    return [x, y, x + w, y + h, s]


def drift(t, speed=3.0):
    """A person walking right at `speed` px/frame."""
    return 50.0 + speed * t, 60.0


def test_equivalent_to_sort_with_only_high_conf():
    st = Sort(max_age=3, min_hits=3, iou_threshold=0.3)
    bt = ByteTrack(max_age=3, min_hits=3, iou_threshold=0.3,
                   high_thresh=0.35)
    rng = np.random.default_rng(0)
    for t in range(20):
        dets = []
        for p, speed in enumerate((2.0, -1.5, 0.0)):
            x, y = 60.0 + 90 * p + speed * t, 50.0 + 10 * p
            jit = rng.normal(0, 0.7, 2)
            dets.append(box(x + jit[0], y + jit[1],
                            s=float(rng.uniform(0.5, 0.95))))
        dets = np.array(dets, np.float32)
        a = st.update(dets)
        b = bt.update(dets)
        np.testing.assert_allclose(a, b)   # bit-identical trajectories


def test_low_conf_sustains_identity_through_blur():
    """Frames 0-4 high conf (track confirmed), frames 5-10 only a 0.2-conf
    box (motion blur), frames 11+ high conf again.  Sort (0.35 gate) sees
    empty frames and loses the identity after max_age; ByteTrack keeps it
    alive and the SAME id spans the whole sequence."""
    def dets_at(t):
        x, y = drift(t)
        if 5 <= t <= 10:
            return np.array([box(x, y, s=0.2)], np.float32)
        return np.array([box(x, y, s=0.9)], np.float32)

    bt = ByteTrack(max_age=2, min_hits=3, iou_threshold=0.3)
    ids_seen = []
    for t in range(16):
        out = bt.update(dets_at(t))
        if len(out):
            ids_seen.extend(out[:, 5].astype(int).tolist())
    assert len(set(ids_seen)) == 1, f"identity switched: {set(ids_seen)}"

    # Sort with the reference's 0.35 gate loses the track: the blur frames
    # arrive EMPTY (the pipeline filters them out before the tracker)
    st = Sort(max_age=2, min_hits=3, iou_threshold=0.3)
    st_ids = set()
    for t in range(16):
        d = dets_at(t)
        d = d[d[:, 4] > 0.35]
        out = st.update(d)
        if len(out):
            st_ids.update(out[:, 5].astype(int).tolist())
    assert len(st_ids) >= 2, "scenario too easy: Sort kept the identity"


def test_low_conf_never_spawns_tracks():
    bt = ByteTrack(max_age=3, min_hits=1, iou_threshold=0.3)
    for t in range(5):
        out = bt.update(np.array([box(300.0, 200.0, s=0.2)], np.float32))
        assert len(out) == 0
    assert len(bt) == 0


def test_low_conf_never_rescues_coasting_tracks():
    """A low box only rescues tracks matched on the PREVIOUS frame — after
    one coasted frame the track is no longer eligible (BYTE keeps lost
    tracks out of the second association)."""
    bt = ByteTrack(max_age=5, min_hits=2, iou_threshold=0.3)
    for t in range(4):                       # confirm a track
        x, y = drift(t)
        bt.update(np.array([box(x, y, s=0.9)], np.float32))
    bt.update(np.empty((0, 5), np.float32))  # coast one frame
    x, y = drift(5)
    out = bt.update(np.array([box(x, y, s=0.2)], np.float32))
    assert len(out) == 0                     # not rescued, not emitted
    assert int(bt.time_since_update[0]) >= 2


def test_second_association_uses_stricter_iou():
    """A low-confidence box overlapping a fresh track only loosely (passes
    the 0.3 first-stage gate but not second_iou=0.5) must NOT be matched."""
    bt = ByteTrack(max_age=3, min_hits=2, iou_threshold=0.3,
                   second_iou=0.5)
    for t in range(4):
        bt.update(np.array([box(100.0, 100.0, s=0.9)], np.float32))
    # ~0.38 IoU with the predicted box: 40x80 vs 40x80 shifted (14, 14)
    out = bt.update(np.array([box(114.0, 114.0, s=0.2)], np.float32))
    assert len(out) == 0
    assert int(bt.time_since_update[0]) == 1  # track coasted, not updated


def test_low_conf_never_confirms_warming_up_track():
    """A warming-up track (hit_streak < min_hits, never emitted) is excluded
    from the second association: a low box can neither advance its warm-up
    nor make it emit carrying the low score."""
    bt = ByteTrack(max_age=3, min_hits=3, iou_threshold=0.3)
    # push frame_count past min_hits first so the early-video emission
    # clause (frame_count <= min_hits) can't confirm anything
    for _ in range(4):
        bt.update(np.empty((0, 5), np.float32))
    x, y = drift(0)
    bt.update(np.array([box(x, y, s=0.9)], np.float32))   # spawn (streak 0)
    x, y = drift(1)
    bt.update(np.array([box(x, y, s=0.9)], np.float32))   # streak 1 < 3
    assert not bt.confirmed[0]
    streak_before = int(bt.hit_streak[0])
    x, y = drift(2)
    out = bt.update(np.array([box(x, y, s=0.2)], np.float32))  # low only
    assert len(out) == 0                       # never emitted on a low box
    assert len(bt) == 1 and not bt.confirmed[0]
    # excluded from the second association entirely: not updated, coasting
    assert int(bt.time_since_update[0]) == 1
    assert int(bt.hit_streak[0]) <= streak_before


def test_rescue_at_detector_cadence():
    """yolo_step > 1: the pipeline calls update(empty) on skipped frames, so
    on detector frames every track has tsu == yolo_step.  With
    det_stride=yolo_step the BYTE rescue still fires; with the default
    stride 1 it must not (cadence-unaware config degenerates to SORT)."""
    def run(det_stride):
        bt = ByteTrack(max_age=2, min_hits=1, iou_threshold=0.3,
                       det_stride=det_stride)
        emitted = []
        for t in range(14):
            if t % 2 == 1:                    # skipped-detector frame
                out = bt.update(np.empty((0, 5), np.float32))
            else:
                x, y = drift(t)
                s = 0.2 if 4 <= t <= 10 else 0.9   # blur window
                out = bt.update(np.array([box(x, y, s=s)], np.float32))
            if len(out):
                emitted.extend(out[:, 5].astype(int).tolist())
        return emitted

    aware = run(det_stride=2)
    assert len(set(aware)) == 1, f"identity switched: {set(aware)}"
    unaware = run(det_stride=1)
    assert len(set(unaware)) >= 2, "scenario too easy: stride-1 kept the id"


def test_pipeline_reset_builds_selected_tracker():
    from easy_vitpose_tpu.pipeline.inference import VitInference
    inst = object.__new__(VitInference)   # wiring test: skip model loading
    inst.yolo_step = 2
    inst.is_video = True
    inst.single_pose = False
    inst.tracker_type = "bytetrack"
    VitInference.reset(inst)
    assert isinstance(inst.tracker, ByteTrack)
    assert inst.tracker.max_age == 2 and inst.tracker.min_hits == 1
    assert inst.tracker.high_thresh == 0.35
    assert inst.tracker.det_stride == 2      # cadence-aware BYTE rescue
    VitInference.set_yolo_step(inst, 3)
    assert inst.tracker.det_stride == 3 and inst.tracker.max_age == 3
    # the detector gate drops to low_thresh so BYTE sees the weak boxes
    rows = np.array([[0, 0, 10, 10, 0.2, 0.0],
                     [0, 0, 10, 10, 0.05, 0.0]], np.float32)
    kept = VitInference._filter_dets(inst, rows)
    assert len(kept) == 1 and kept.shape[1] == 5

    inst.tracker_type = "sort"
    VitInference.reset(inst)
    assert isinstance(inst.tracker, Sort)
    assert not isinstance(inst.tracker, ByteTrack)
    kept = VitInference._filter_dets(inst, rows)
    assert len(kept) == 0                  # reference 0.35 gate


def test_multistream_tracker_selection():
    from easy_vitpose_tpu.convert.vitpose_torch import (
        convert_vitpose_state_dict)
    from easy_vitpose_tpu.pipeline.stream import MultiStreamPose
    from tests.test_model_parity import CASES, load_case
    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, CASES["tiny"])
    ms = MultiStreamPose(params, CASES["tiny"], n_streams=2,
                         tracker="bytetrack")
    assert all(isinstance(t, ByteTrack) for t in ms.trackers)
    assert ms._det_gate == ms.trackers[0].low_thresh < 0.35
    ms2 = MultiStreamPose(params, CASES["tiny"], n_streams=2)
    assert all(not isinstance(t, ByteTrack) for t in ms2.trackers)
    assert ms2._det_gate == 0.35
