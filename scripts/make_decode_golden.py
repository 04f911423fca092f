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
    keypoints_from_heatmaps, _get_max_preds, post_dark_udp)

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

    np.savez_compressed(
        OUT,
        heatmaps=hm, centers=centers, scales=scales,
        preds_argmax=preds_argmax, maxvals=maxvals,
        preds_udp=preds_udp, preds_udp_k17=preds_udp_k17,
        preds_full=preds_full, maxvals_full=maxvals_full)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
