"""Quantitative MOT harness: synthetic trajectories with occlusions,
crossings and detector dropout, scoring ID-switches / fragmentation /
recall for SORT vs ByteTrack.

Behavioural tests live in test_sort.py / test_bytetrack.py; this pins the
*aggregate tracking quality* claim (ROADMAP/README): ByteTrack sustains
identities through low-confidence windows that make SORT (with the
reference's 0.35 pipeline gate, easy_ViTPose/inference.py:240-241) drop
and re-spawn tracks.  Detection feeds mirror the pipeline's gating:
SORT sees conf > 0.35 only; ByteTrack sees everything >= its low_thresh.
"""
import numpy as np
import pytest

from easy_vitpose_tpu.track.bytetrack import ByteTrack
from easy_vitpose_tpu.track.sort import Sort


class Scenario:
    """T frames of gt boxes for P persons + per-frame detector output.

    paths: list of callables t -> (cx, cy) per person.
    conf(t, p): detection confidence (None = detector miss entirely).
    """

    def __init__(self, paths, conf, T, wh=(60.0, 130.0), jitter=0.5, seed=0):
        self.paths, self.conf, self.T = paths, conf, T
        self.w, self.h = wh
        self.rng = np.random.default_rng(seed)
        self.jitter = jitter

    def gt_boxes(self, t):
        out = []
        for p, path in enumerate(self.paths):
            cx, cy = path(t)
            out.append([cx - self.w / 2, cy - self.h / 2,
                        cx + self.w / 2, cy + self.h / 2])
        return np.asarray(out, np.float32)

    def detections(self, t):
        """(N, 5) detector rows + the true person index per row."""
        rows, who = [], []
        for p in range(len(self.paths)):
            c = self.conf(t, p)
            if c is None:
                continue
            b = self.gt_boxes(t)[p] + self.rng.normal(0, self.jitter, 4)
            rows.append([*b, c])
            who.append(p)
        return (np.asarray(rows, np.float32).reshape(-1, 5),
                np.asarray(who, int))


def iou(a, b):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = lambda x: (x[:, 2] - x[:, 0]) * (x[:, 3] - x[:, 1])  # noqa: E731
    return inter / (area(a)[:, None] + area(b)[None, :] - inter + 1e-9)


def run_mot(tracker, scen, gate):
    """Feed the scenario through ``tracker`` (detections gated at ``gate``,
    mirroring the pipeline's _filter_dets) and score vs ground truth.

    Returns dict: idsw (identity switches), frag (tracked->lost
    transitions), recall (gt boxes matched by an emitted track).
    """
    last_id = {}          # person -> last tracker id assigned
    tracked_prev = set()  # persons matched on the previous frame
    idsw = frag = hits = total = 0
    for t in range(scen.T):
        dets, _ = scen.detections(t)
        out = tracker.update(dets[dets[:, 4] > gate]
                             if len(dets) else dets)
        gt = scen.gt_boxes(t)
        total += len(gt)
        tracked_now = set()
        if len(out):
            m = iou(gt, out[:, :4])
            used = set()
            for p in range(len(gt)):
                j = int(np.argmax(m[p]))
                if m[p, j] < 0.3 or j in used:
                    continue
                used.add(j)
                tracked_now.add(p)
                hits += 1
                tid = int(out[j, 5])
                if p in last_id and last_id[p] != tid:
                    idsw += 1
                last_id[p] = tid
        frag += len(tracked_prev - tracked_now)   # tracked -> lost toggles
        tracked_prev = tracked_now
    return {"idsw": idsw, "frag": frag, "recall": hits / max(total, 1)}


def occlusion_scene(n_windows=3, T=60):
    """Two walkers; person 0 drops to conf 0.2 in n_windows blur windows
    (the classic ByteTrack motivating case)."""
    paths = [lambda t: (100.0 + 6.0 * t, 200.0),
             lambda t: (1500.0 - 5.0 * t, 600.0)]
    windows = [(10 + 15 * i, 18 + 15 * i) for i in range(n_windows)]

    def conf(t, p):
        if p == 0 and any(a <= t <= b for a, b in windows):
            return 0.2
        return 0.9
    return Scenario(paths, conf, T)


def crossing_scene(T=50):
    """Two persons crossing paths mid-sequence at full confidence."""
    paths = [lambda t: (200.0 + 14.0 * t, 400.0 + 3.0 * t),
             lambda t: (900.0 - 14.0 * t, 400.0 + 3.0 * t)]
    return Scenario(paths, lambda t, p: 0.9, T)


def dropout_scene(T=60):
    """Detector misses person 0 entirely every 4th frame (dropout), plus
    one 0.2-conf blur window."""
    paths = [lambda t: (300.0 + 8.0 * t, 300.0),
             lambda t: (300.0 + 8.0 * t, 700.0)]

    def conf(t, p):
        if p == 0 and t % 4 == 3:
            return None
        if p == 0 and 25 <= t <= 33:
            return 0.2
        return 0.85
    return Scenario(paths, conf, T)


def make_pair(max_age=2, min_hits=3):
    st = Sort(max_age=max_age, min_hits=min_hits, iou_threshold=0.3)
    bt = ByteTrack(max_age=max_age, min_hits=min_hits, iou_threshold=0.3,
                   high_thresh=0.35)
    return st, bt


def test_bytetrack_beats_sort_on_occlusions():
    st, bt = make_pair()
    rs = run_mot(st, occlusion_scene(), gate=0.35)
    rb = run_mot(bt, occlusion_scene(), gate=bt.low_thresh)
    # SORT loses the identity in every blur window (3 windows of 9 frames
    # > max_age=2); ByteTrack must keep ONE identity and higher recall
    assert rs["idsw"] >= 2, f"scenario too easy for SORT: {rs}"
    assert rb["idsw"] == 0, f"ByteTrack switched identities: {rb}"
    assert rb["recall"] > rs["recall"] + 0.2, (rs, rb)
    print(f"\nocclusion scene:  SORT {rs}   ByteTrack {rb}")


def test_equal_on_clean_crossing_scene():
    st, bt = make_pair()
    rs = run_mot(st, crossing_scene(), gate=0.35)
    rb = run_mot(bt, crossing_scene(), gate=bt.low_thresh)
    assert rs == rb, (rs, rb)   # no low boxes -> bit-identical behaviour
    assert rs["recall"] > 0.9
    print(f"\ncrossing scene:   SORT {rs}   ByteTrack {rb}")


def test_bytetrack_on_dropout_scene():
    st, bt = make_pair()
    rs = run_mot(st, dropout_scene(), gate=0.35)
    rb = run_mot(bt, dropout_scene(), gate=bt.low_thresh)
    # hard dropout frames hit both trackers equally (no box at any
    # threshold, and a post-dropout coast makes the blur rescue ineligible
    # — tsu > det_stride); BYTE must still be no worse on identity and
    # at least as good on recall
    assert rb["idsw"] <= rs["idsw"]
    assert rb["recall"] >= rs["recall"]
    print(f"\ndropout scene:    SORT {rs}   ByteTrack {rb}")


def test_fragmentation_better_under_occlusion():
    st, bt = make_pair()
    rs = run_mot(st, occlusion_scene(), gate=0.35)
    rb = run_mot(bt, occlusion_scene(), gate=bt.low_thresh)
    # SORT toggles tracked->lost at every blur window; BYTE keeps emitting
    assert rb["frag"] < rs["frag"], (rs, rb)
