"""Generate golden decode fixtures by running the *reference* numpy/cv2 decode
stack as an oracle on random heatmaps.  The fixtures (.npz) are committed so
the test suite never needs /root/reference at runtime.

Oracle: /root/reference/easy_ViTPose/vit_utils/top_down_eval.py
(keypoints_from_heatmaps with unbiased=True, use_udp=True — exactly what
VitInference.postprocess calls at easy_ViTPose/inference.py:200-204).
"""
import sys
import types

import numpy as np

# the reference's vit_utils/__init__ pulls in torchvision (unavailable, and we
# only need the numpy decode fns) — stub it out
for name in ("torchvision", "torchvision.transforms", "matplotlib",
             "matplotlib.pyplot", "ffmpeg"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.path.insert(0, "/root/reference/easy_ViTPose")
from vit_utils.top_down_eval import (  # noqa: E402
    keypoints_from_heatmaps, keypoints_from_heatmaps3d,
    multilabel_classification_accuracy, _get_max_preds, post_dark_udp)

OUT = "/root/repo/tests/golden/decode_golden.npz"


def peaked_heatmaps(rng, n, k, h, w):
    """Random smooth heatmaps with a dominant Gaussian peak each (realistic)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx = rng.uniform(1, w - 2, size=(n, k, 1, 1)).astype(np.float32)
    cy = rng.uniform(1, h - 2, size=(n, k, 1, 1)).astype(np.float32)
    sig = rng.uniform(1.2, 3.0, size=(n, k, 1, 1)).astype(np.float32)
    g = np.exp(-(((xx - cx) ** 2) + ((yy - cy) ** 2)) / (2 * sig ** 2))
    noise = rng.normal(0, 0.02, size=(n, k, h, w)).astype(np.float32)
    return (g + noise).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    N, K, H, W = 6, 17, 64, 48
    hm = peaked_heatmaps(rng, N, K, H, W)
    # include a negative-everywhere map to exercise the maxval<=0 -> -1 rule
    hm[0, 3] = -np.abs(hm[0, 3]) - 0.1

    centers = rng.uniform(40, 400, size=(N, 2)).astype(np.float32).round()
    scales = rng.uniform(80, 500, size=(N, 2)).astype(np.float32).round()

    preds_argmax, maxvals = _get_max_preds(hm.copy())
    preds_udp = post_dark_udp(preds_argmax.copy()[..., :2],
                              hm.copy(), kernel=11)
    preds_full, maxvals_full = keypoints_from_heatmaps(
        hm.copy(), centers, scales, unbiased=True, use_udp=True)

    # also k=17 modulate kernel variant
    preds_udp_k17 = post_dark_udp(_get_max_preds(hm.copy())[0][..., :2],
                                  hm.copy(), kernel=17)

    # non-UDP post-processing family (round-3 additions)
    pp = {}
    pp["unbiased"] = keypoints_from_heatmaps(
        hm.copy(), centers.copy(), scales.copy(),
        post_process="unbiased", kernel=11, use_udp=False)
    pp["default"] = keypoints_from_heatmaps(
        hm.copy(), centers.copy(), scales.copy(),
        post_process="default", use_udp=False)
    pp["megvii"] = keypoints_from_heatmaps(
        hm.copy(), centers.copy(), scales.copy(),
        post_process="megvii", kernel=11, use_udp=False)
    pp["none"] = keypoints_from_heatmaps(
        hm.copy(), centers.copy(), scales.copy(),
        post_process=None, use_udp=False)

    # second, odd-shaped set: guards the vectorized indexing across
    # non-default (H, W, K) (alternate kernel too)
    rng2 = np.random.default_rng(11)
    hm2 = peaked_heatmaps(rng2, 4, 21, 96, 72)
    hm2[1, 5] = -np.abs(hm2[1, 5]) - 0.1
    c2 = rng2.uniform(40, 400, size=(4, 2)).astype(np.float32).round()
    s2 = rng2.uniform(80, 500, size=(4, 2)).astype(np.float32).round()
    pp2 = {}
    for mode in ("unbiased", "default", "megvii"):
        pp2[mode] = keypoints_from_heatmaps(
            hm2.copy(), c2.copy(), s2.copy(),
            post_process=mode, kernel=17, use_udp=False)

    # 3d decode
    rng3 = np.random.default_rng(7)
    N3, K3, D3, H3, W3 = 3, 5, 8, 16, 12
    hm3 = rng3.normal(0, 1, (N3, K3, D3, H3, W3)).astype(np.float32)
    hm3[0, 1] = -np.abs(hm3[0, 1]) - 0.1  # maxval<=0 -> -1 rule
    c3 = rng3.uniform(40, 400, size=(N3, 2)).astype(np.float32).round()
    s3 = rng3.uniform(80, 500, size=(N3, 2)).astype(np.float32).round()
    preds3d, maxvals3d = keypoints_from_heatmaps3d(hm3.copy(), c3, s3)

    # multi-label classification accuracy (scalar oracles)
    ml_pred = rng3.uniform(0, 1, (10, 4)).astype(np.float32)
    ml_gt = (rng3.uniform(0, 1, (10, 4)) > 0.5).astype(np.float32)
    ml_mask2 = (rng3.uniform(0, 1, (10, 4)) > 0.2).astype(np.float32)
    ml_mask1 = (rng3.uniform(0, 1, (10,)) > 0.2).astype(np.float32)
    ml_acc2 = multilabel_classification_accuracy(ml_pred, ml_gt, ml_mask2)
    ml_acc1 = multilabel_classification_accuracy(ml_pred, ml_gt, ml_mask1)

    np.savez_compressed(
        OUT,
        heatmaps=hm, centers=centers, scales=scales,
        preds_argmax=preds_argmax, maxvals=maxvals,
        preds_udp=preds_udp, preds_udp_k17=preds_udp_k17,
        preds_full=preds_full, maxvals_full=maxvals_full,
        preds_unbiased=pp["unbiased"][0], maxvals_unbiased=pp["unbiased"][1],
        preds_default=pp["default"][0], maxvals_default=pp["default"][1],
        preds_megvii=pp["megvii"][0], maxvals_megvii=pp["megvii"][1],
        preds_none=pp["none"][0], maxvals_none=pp["none"][1],
        heatmaps2=hm2, centers2=c2, scales2=s2,
        preds2_unbiased=pp2["unbiased"][0],
        maxvals2_unbiased=pp2["unbiased"][1],
        preds2_default=pp2["default"][0], maxvals2_default=pp2["default"][1],
        preds2_megvii=pp2["megvii"][0], maxvals2_megvii=pp2["megvii"][1],
        heatmaps3d=hm3, centers3d=c3, scales3d=s3,
        preds3d=preds3d, maxvals3d=maxvals3d,
        ml_pred=ml_pred, ml_gt=ml_gt, ml_mask2=ml_mask2, ml_mask1=ml_mask1,
        ml_acc2=np.float64(ml_acc2), ml_acc1=np.float64(ml_acc1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
