"""Golden tests: metrics (PCK/AUC/NME/EPE) + OKS IoU/NMS vs reference oracle
fixtures (tests/golden/misc_golden.npz, from scripts/make_misc_golden.py)."""
import os

import numpy as np
import pytest

from easy_vitpose_tpu.eval import metrics as M
from easy_vitpose_tpu.ops import oks as O

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "misc_golden.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


def test_pck(g):
    acc, avg, cnt = M.keypoint_pck_accuracy(g["pred"], g["gt"], g["mask"],
                                            0.3, g["normalize"].copy())
    np.testing.assert_allclose(acc, g["pck_acc"], atol=1e-6)
    assert abs(avg - g["pck_avg"]) < 1e-6
    assert cnt == g["pck_cnt"]


def test_auc_nme_epe(g):
    assert abs(M.keypoint_auc(g["pred"], g["gt"], g["mask"], 30.0)
               - g["auc"]) < 1e-6
    assert abs(M.keypoint_nme(g["pred"], g["gt"], g["mask"],
                              g["normalize"].copy()) - g["nme"]) < 1e-5
    assert abs(M.keypoint_epe(g["pred"], g["gt"], g["mask"])
               - g["epe"]) < 1e-4


def test_pose_pck_from_heatmaps(g):
    acc, avg, cnt = M.pose_pck_accuracy(g["hm_out"], g["hm_tgt"], g["mask"])
    np.testing.assert_allclose(acc, g["p_acc"], atol=1e-6)
    assert abs(avg - g["p_avg"]) < 1e-6
    assert cnt == g["p_cnt"]


def test_oks_iou(g):
    np.testing.assert_allclose(
        O.oks_iou(g["oks_g"], g["oks_d"], float(g["oks_ag"]), g["oks_ad"]),
        g["ious_plain"], atol=1e-6)
    np.testing.assert_allclose(
        O.oks_iou(g["oks_g"], g["oks_d"], float(g["oks_ag"]), g["oks_ad"],
                  vis_thr=0.4),
        g["ious_vis"], atol=1e-6)


def _db(g):
    return [{"keypoints": kp, "score": float(s), "area": float(a)}
            for kp, s, a in zip(g["kpts_db_kp"], g["kpts_db_score"],
                                g["kpts_db_area"])]


def test_oks_nms(g):
    np.testing.assert_array_equal(O.oks_nms(_db(g), 0.5), g["keep_hard"])


def test_soft_oks_nms(g):
    np.testing.assert_array_equal(O.soft_oks_nms(_db(g), 0.5, max_dets=6),
                                  g["keep_soft"])


def test_bbox_nms(g):
    np.testing.assert_array_equal(O.bbox_nms(g["dets"], 0.4), g["keep_bbox"])


def test_native_nms_matches_numpy(g):
    from easy_vitpose_tpu import native
    keep_np = O.bbox_nms(g["dets"], 0.4)
    keep_c = native.nms_cpu(g["dets"], 0.4)
    if native.native_available():
        np.testing.assert_array_equal(keep_c, keep_np)
    else:  # fallback path must still agree
        np.testing.assert_array_equal(keep_c, keep_np)


def test_fliplr_regression_matches_reference():
    """fliplr_regression static + root modes vs the reference oracle
    (post_processing/post_transforms.py:54-107)."""
    import numpy as np
    from easy_vitpose_tpu.ops.affine import fliplr_regression
    g = np.load(GOLDEN)
    FP = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14],
          [15, 16]]
    got_s = np.asarray(fliplr_regression(g["reg"], FP, center_mode="static",
                                         center_x=0.5))
    np.testing.assert_allclose(got_s, g["reg_static"], rtol=1e-6, atol=1e-6)
    got_r = np.asarray(fliplr_regression(g["reg"], FP, center_mode="root",
                                         center_index=0))
    np.testing.assert_allclose(got_r, g["reg_root"], rtol=1e-6, atol=1e-6)


def test_flip_back_combined_target_matches_reference():
    """CombinedTarget flip_back: x-offset channels negated, joint triples
    swapped, width mirrored (post_transforms.py:110-147)."""
    import numpy as np
    from easy_vitpose_tpu.ops.affine import flip_back_heatmaps
    g = np.load(GOLDEN)
    got = np.asarray(flip_back_heatmaps(g["hm_comb"], [[1, 2], [4, 5]],
                                        target_type="CombinedTarget"))
    np.testing.assert_allclose(got, g["comb_back"], rtol=1e-6, atol=1e-6)


def test_fliplr_regression_involution():
    """Flipping twice (same static center) is the identity; root mode is
    also an involution because the root's x maps to itself."""
    import numpy as np
    from easy_vitpose_tpu.ops.affine import fliplr_regression
    rng = np.random.default_rng(0)
    FP = [[1, 2], [3, 4]]
    r = rng.normal(size=(3, 4, 6, 2)).astype(np.float32)
    twice = fliplr_regression(
        fliplr_regression(r, FP, center_x=0.3), FP, center_x=0.3)
    np.testing.assert_allclose(np.asarray(twice), r, rtol=1e-6, atol=1e-6)
    twice_root = fliplr_regression(
        fliplr_regression(r, FP, center_mode="root", center_index=0),
        FP, center_mode="root", center_index=0)
    np.testing.assert_allclose(np.asarray(twice_root), r,
                               rtol=1e-6, atol=1e-6)


def test_flip_back_heatmaps_involution_combined():
    """CombinedTarget flip_back applied twice restores the input (sign
    flips cancel, triple swaps cancel, width mirror cancels)."""
    import numpy as np
    from easy_vitpose_tpu.ops.affine import flip_back_heatmaps
    rng = np.random.default_rng(1)
    hm = rng.normal(size=(2, 12, 8, 6)).astype(np.float32)
    FP = [[0, 1], [2, 3]]
    twice = flip_back_heatmaps(
        flip_back_heatmaps(hm, FP, target_type="CombinedTarget"),
        FP, target_type="CombinedTarget")
    np.testing.assert_allclose(np.asarray(twice), hm, rtol=1e-6, atol=1e-6)
