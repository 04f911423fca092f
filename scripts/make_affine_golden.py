"""Golden fixtures for affine transforms + flip helpers, from the reference
(vit_utils/transform.py, vit_utils/post_processing/post_transforms.py)."""
import sys
import types

import numpy as np

for name in ("torchvision", "torchvision.transforms", "matplotlib",
             "matplotlib.pyplot", "ffmpeg", "munkres"):
    mod = types.ModuleType(name)
    if name == "munkres":
        mod.Munkres = object
    sys.modules.setdefault(name, mod)
sys.path.insert(0, "/root/reference/easy_ViTPose")

from vit_utils.transform import (  # noqa: E402
    get_affine_transform, affine_transform, fliplr_joints)
from vit_utils.post_processing.post_transforms import (  # noqa: E402
    get_warp_matrix, warp_affine_joints, flip_back)


def main():
    rng = np.random.default_rng(0)
    cases = []
    for i in range(6):
        center = rng.uniform(50, 400, 2).astype(np.float32)
        scale = rng.uniform(0.5, 3.0, 2).astype(np.float32)
        rot = float(rng.uniform(-80, 80)) if i % 2 else 0.0
        t = get_affine_transform(center, scale, 200, rot, (192, 256))
        t_inv = get_affine_transform(center, scale, 200, rot, (192, 256), inv=1)
        pts = rng.uniform(0, 500, (17, 2)).astype(np.float32)
        warped = np.stack([affine_transform(p, t) for p in pts])
        cases.append((center, scale, rot, t, t_inv, pts, warped))

    joints = rng.uniform(0, 300, (17, 2)).astype(np.float32)
    vis = (rng.uniform(size=(17, 2)) > 0.3).astype(np.float32)
    pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]]
    fj, fv = fliplr_joints(joints.copy(), vis.copy(), 320, pairs)

    wm = get_warp_matrix(30.0, np.array([192.0, 256.0]),
                         np.array([47.0, 63.0]), np.array([192.0, 256.0]))
    wj = warp_affine_joints(joints.copy(), wm)

    hm = rng.normal(size=(2, 17, 8, 6)).astype(np.float32)
    fb = flip_back(hm.copy(), pairs)

    np.savez_compressed(
        "/root/repo/tests/golden/affine_golden.npz",
        centers=np.stack([c[0] for c in cases]),
        scales=np.stack([c[1] for c in cases]),
        rots=np.array([c[2] for c in cases]),
        trans=np.stack([c[3] for c in cases]),
        trans_inv=np.stack([c[4] for c in cases]),
        pts=np.stack([c[5] for c in cases]),
        warped=np.stack([c[6] for c in cases]),
        joints=joints, vis=vis, fj=fj, fv=fv,
        wm=wm, wj=wj, hm=hm, fb=np.ascontiguousarray(fb))
    print("wrote affine golden")


if __name__ == "__main__":
    main()
