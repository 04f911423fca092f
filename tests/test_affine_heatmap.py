"""Golden tests: affine transforms vs reference oracle fixtures, and Gaussian
target rendering vs an independent per-joint loop oracle."""
import os

import numpy as np
import pytest

from easy_vitpose_tpu.ops import affine as A
from easy_vitpose_tpu.ops.heatmap import generate_gaussian_targets

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "affine_golden.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


def test_get_affine_transform(g):
    for i in range(len(g["rots"])):
        t = A.get_affine_transform(g["centers"][i], g["scales"][i], 200,
                                   float(g["rots"][i]), (192, 256))
        np.testing.assert_allclose(t, g["trans"][i], atol=1e-4)
        ti = A.get_affine_transform(g["centers"][i], g["scales"][i], 200,
                                    float(g["rots"][i]), (192, 256), inv=True)
        np.testing.assert_allclose(ti, g["trans_inv"][i], atol=1e-3)


def test_affine_transform_points(g):
    for i in range(len(g["rots"])):
        w = A.affine_transform_batch(g["pts"][i], g["trans"][i])
        np.testing.assert_allclose(w, g["warped"][i], atol=1e-3)


def test_fliplr_joints(g):
    pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14],
             [15, 16]]
    fj, fv = A.fliplr_joints(g["joints"], g["vis"], 320, pairs)
    np.testing.assert_allclose(fj, g["fj"], atol=1e-5)
    np.testing.assert_array_equal(fv, g["fv"])


def test_warp_matrix(g):
    wm = A.get_warp_matrix(30.0, np.array([192.0, 256.0]),
                           np.array([47.0, 63.0]), np.array([192.0, 256.0]))
    np.testing.assert_allclose(wm, g["wm"], atol=1e-6)
    wj = A.warp_affine_joints(g["joints"], wm)
    np.testing.assert_allclose(wj, g["wj"], atol=1e-4)


def test_flip_back(g):
    out = np.asarray(A.flip_back_heatmaps(g["hm"],
                                          [[1, 2], [3, 4], [5, 6], [7, 8],
                                           [9, 10], [11, 12], [13, 14],
                                           [15, 16]]))
    np.testing.assert_array_equal(out, g["fb"])


def _loop_oracle(joints, vis, hm_size, img_size, sigma):
    """Independent per-joint rendering oracle (straight from the spec)."""
    Wh, Hh = hm_size
    Wi, Hi = img_size
    K = joints.shape[0]
    target = np.zeros((K, Hh, Wh), np.float32)
    weight = vis[:, :1].astype(np.float32).copy()
    tmp = sigma * 3
    for k in range(K):
        mx = int(joints[k, 0] / (Wi / Wh) + 0.5)
        my = int(joints[k, 1] / (Hi / Hh) + 0.5)
        ul = [int(mx - tmp), int(my - tmp)]
        br = [int(mx + tmp + 1), int(my + tmp + 1)]
        if ul[0] >= Wh or ul[1] >= Hh or br[0] < 0 or br[1] < 0:
            weight[k] = 0
            continue
        if weight[k] <= 0.5:
            continue
        for y in range(max(0, ul[1]), min(br[1], Hh)):
            for x in range(max(0, ul[0]), min(br[0], Wh)):
                size = 2 * tmp + 1
                cx = x - ul[0] - size // 2
                cy = y - ul[1] - size // 2
                target[k, y, x] = np.exp(-(cx * cx + cy * cy)
                                         / (2 * sigma ** 2))
    return target, weight


@pytest.mark.parametrize("sigma", [2, 3])
def test_gaussian_targets_match_loop_oracle(sigma):
    rng = np.random.default_rng(0)
    K = 17
    joints = rng.uniform(-40, 260, (K, 2)).astype(np.float32)
    joints[0] = [-100, -100]   # fully out of bounds -> weight 0
    joints[1] = [191, 255]     # corner
    vis = np.ones((K, 2), np.float32)
    vis[2] = 0
    tgt, w = generate_gaussian_targets(joints, vis, (48, 64), (192, 256),
                                       sigma=sigma)
    ref_t, ref_w = _loop_oracle(joints, vis, (48, 64), (192, 256), sigma)
    np.testing.assert_array_equal(w, ref_w)
    np.testing.assert_allclose(tgt, ref_t, atol=1e-6)
