"""Tests: 3D argmax decode, regression decode, bottom-up AE grouping."""
import numpy as np

from easy_vitpose_tpu.ops import decode
from easy_vitpose_tpu.ops.group import (heatmap_peak_nms, parse_bottom_up,
                                        top_k_candidates)


def test_get_max_preds_3d():
    hm = np.zeros((2, 3, 4, 8, 6), np.float32)
    hm[0, 0, 2, 5, 3] = 1.0
    hm[0, 1, 1, 0, 0] = 0.5
    hm[1, 2, 3, 7, 5] = 2.0
    preds, maxvals = decode.get_max_preds_3d(hm)
    np.testing.assert_array_equal(np.asarray(preds)[0, 0], [3, 5, 2])
    np.testing.assert_array_equal(np.asarray(preds)[1, 2], [5, 7, 3])
    # all-zero map -> maxval 0 -> -1 coords
    np.testing.assert_array_equal(np.asarray(preds)[1, 0], [-1, -1, -1])


def test_regression_decode():
    reg = np.array([[[0.5, 0.5], [0.25, 0.75]]], np.float32)  # (1, 2, 2)
    center = np.array([[100.0, 200.0]], np.float32)
    scale = np.array([[50.0, 80.0]], np.float32)
    preds, maxvals = decode.keypoints_from_regression(reg, center, scale,
                                                      (192, 256))
    # x = 0.5*192 * (50/192) + 100 - 25 = 25 + 75 = 100
    np.testing.assert_allclose(np.asarray(preds)[0, 0], [100.0, 200.0],
                               atol=1e-4)
    assert np.all(np.asarray(maxvals) == 1.0)


def _gauss(h, w, cy, cx, sigma=1.5):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma ** 2))


def test_peak_nms_keeps_only_peaks():
    hm = _gauss(32, 32, 10, 10) + 0.8 * _gauss(32, 32, 20, 24)
    out = np.asarray(heatmap_peak_nms(hm[None, None]))[0, 0]
    assert (out > 0).sum() <= 4  # only the two local maxima (plus ties)
    assert out[10, 10] > 0 and out[20, 24] > 0


def test_bottom_up_grouping_two_people():
    """Two synthetic people with distinct tag values must group correctly."""
    K, H, W = 4, 48, 48
    hm = np.zeros((K, H, W), np.float32)
    tags = np.zeros((K, H, W), np.float32)
    p1 = [(10, 10), (12, 14), (18, 9), (20, 15)]
    p2 = [(30, 32), (33, 36), (38, 30), (40, 35)]
    for k in range(K):
        y1, x1 = p1[k]
        y2, x2 = p2[k]
        hm[k] += _gauss(H, W, y1, x1) + 0.9 * _gauss(H, W, y2, x2)
        tags[k, y1 - 2:y1 + 3, x1 - 2:x1 + 3] = 1.0
        tags[k, y2 - 2:y2 + 3, x2 - 2:x2 + 3] = 5.0
    people = parse_bottom_up(hm, tags, detection_threshold=0.3,
                             tag_threshold=1.0)
    assert people.shape[0] == 2
    # each person has all 4 joints with positive score
    scores = people[:, :, 2]
    assert (scores > 0.3).all()
    # joints of each person share a tag cluster
    by_tag = people[np.argsort(people[:, 0, 3])]
    for k in range(K):
        assert abs(by_tag[0, k, 0] - p1[k][1]) <= 1
        assert abs(by_tag[0, k, 1] - p1[k][0]) <= 1
        assert abs(by_tag[1, k, 0] - p2[k][1]) <= 1
        assert abs(by_tag[1, k, 1] - p2[k][0]) <= 1


def test_top_k_candidates_shapes():
    hm = np.random.default_rng(0).uniform(0, 1, (17, 64, 48)).astype(np.float32)
    tags = np.random.default_rng(1).normal(size=(17, 64, 48)).astype(np.float32)
    c = top_k_candidates(np.asarray(hm), np.asarray(tags), k=10)
    assert c["loc"].shape == (17, 10, 2)
    assert c["val"].shape == (17, 10)
    assert c["tag"].shape == (17, 10, 1)
