"""COCO keypoint AP evaluator tests on hand-computable scenarios."""
import numpy as np
import pytest

from easy_vitpose_tpu.eval.cocoeval import CocoKeypointEval, compute_oks
from easy_vitpose_tpu.ops.oks import DEFAULT_SIGMAS


def make_gt_ann(img_id, ann_id, kpts, area=5000.0, **kw):
    return {"image_id": img_id, "id": ann_id, "category_id": 1,
            "keypoints": np.asarray(kpts, np.float64).ravel().tolist(),
            "area": area, "iscrowd": 0,
            "num_keypoints": int((np.asarray(kpts).reshape(-1, 3)[:, 2] > 0)
                                 .sum()),
            "bbox": [0, 0, 100, 100], **kw}


def make_dt(img_id, kpts, score):
    return {"image_id": img_id, "category_id": 1,
            "keypoints": np.asarray(kpts, np.float64).ravel().tolist(),
            "score": score}


def random_pose(rng, k=17):
    kp = np.zeros((k, 3))
    kp[:, 0] = rng.uniform(50, 150, k)
    kp[:, 1] = rng.uniform(50, 150, k)
    kp[:, 2] = 2
    return kp


def test_oks_identity_is_one():
    rng = np.random.default_rng(0)
    kp = random_pose(rng)
    oks = compute_oks(kp, 5000.0, kp[None])
    assert abs(oks[0] - 1.0) < 1e-9


def test_perfect_detections_ap1():
    rng = np.random.default_rng(1)
    gt = {"annotations": [], "images": []}
    results = []
    for img in range(4):
        for a in range(2):
            kp = random_pose(rng)
            gt["annotations"].append(
                make_gt_ann(img, img * 10 + a, kp, area=5000.0))
            results.append(make_dt(img, kp, score=rng.uniform(0.5, 1.0)))
    ev = CocoKeypointEval(gt, results)
    stats = ev.accumulate()
    assert abs(stats["AP"] - 1.0) < 1e-9
    assert abs(stats["AR"] - 1.0) < 1e-9


def test_half_detected_ap_half():
    """2 gts per image, only 1 detected perfectly -> recall 0.5; with no
    false positives precision stays 1 up to recall .5 -> AP ~ 0.5."""
    rng = np.random.default_rng(2)
    gt = {"annotations": []}
    results = []
    for img in range(4):
        kp1, kp2 = random_pose(rng), random_pose(rng) + [[300, 300, 0]]
        kp2[:, 2] = 2
        gt["annotations"].append(make_gt_ann(img, img * 10 + 1, kp1))
        gt["annotations"].append(make_gt_ann(img, img * 10 + 2, kp2))
        results.append(make_dt(img, kp1, score=0.9))
    stats = CocoKeypointEval(gt, results).accumulate()
    # 101-pt interpolation: recall points 0..0.5 inclusive have precision 1
    assert 0.49 < stats["AP"] < 0.52
    assert abs(stats["AR"] - 0.5) < 1e-9


def test_false_positive_lowers_ap():
    rng = np.random.default_rng(3)
    gt = {"annotations": []}
    results = []
    for img in range(4):
        kp = random_pose(rng)
        gt["annotations"].append(make_gt_ann(img, img + 1, kp))
        results.append(make_dt(img, kp, score=0.6))
        # a confident far-away false positive
        results.append(make_dt(img, random_pose(rng) + [[500, 500, 0]],
                               score=0.95))
    stats = CocoKeypointEval(gt, results).accumulate()
    assert stats["AP"] < 0.6
    assert abs(stats["AR"] - 1.0) < 1e-9  # all gts eventually matched


def test_ignored_crowd_not_counted():
    rng = np.random.default_rng(4)
    kp = random_pose(rng)
    gt = {"annotations": [
        make_gt_ann(0, 1, kp),
        make_gt_ann(0, 2, random_pose(rng), iscrowd=1),
    ]}
    gt["annotations"][1]["iscrowd"] = 1
    results = [make_dt(0, kp, 0.9)]
    stats = CocoKeypointEval(gt, results).accumulate()
    assert abs(stats["AP"] - 1.0) < 1e-9  # crowd gt is ignored


def test_oks_threshold_sensitivity():
    """A slightly-off detection passes loose OKS thresholds but fails tight
    ones -> AP between 0 and 1, AP@.5 > AP@.75."""
    rng = np.random.default_rng(5)
    gt = {"annotations": []}
    results = []
    for img in range(8):
        kp = random_pose(rng)
        gt["annotations"].append(make_gt_ann(img, img + 1, kp, area=2500.0))
        noisy = kp.copy()
        noisy[:, :2] += rng.normal(0, 4.5, (17, 2))
        results.append(make_dt(img, noisy, score=0.8))
    stats = CocoKeypointEval(gt, results).accumulate()
    assert stats["AP .5"] >= stats["AP .75"] >= 0
    assert 0.0 < stats["AP"] < 1.0
