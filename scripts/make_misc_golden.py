"""Golden fixtures for metrics + OKS NMS, produced by running the reference
implementations (vit_utils/top_down_eval.py, vit_utils/post_processing/nms.py)
on random data.
"""
import sys
import types

import numpy as np

for name in ("torchvision", "torchvision.transforms", "matplotlib",
             "matplotlib.pyplot", "ffmpeg"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.path.insert(0, "/root/reference/easy_ViTPose")

from vit_utils.top_down_eval import (  # noqa: E402
    keypoint_pck_accuracy, keypoint_auc, keypoint_nme, keypoint_epe,
    pose_pck_accuracy)
from vit_utils.post_processing.nms import (  # noqa: E402
    nms, oks_iou, oks_nms, soft_oks_nms)
from vit_utils.post_processing.post_transforms import (  # noqa: E402
    flip_back, fliplr_regression)


def main():
    rng = np.random.default_rng(0)
    N, K = 8, 17
    pred = rng.uniform(0, 64, (N, K, 2)).astype(np.float32)
    gt = pred + rng.normal(0, 3, (N, K, 2)).astype(np.float32)
    mask = rng.uniform(size=(N, K)) > 0.2
    normalize = rng.uniform(30, 64, (N, 2)).astype(np.float32)
    normalize[1] = 0  # exercise the zero-normalize masking path

    acc, avg, cnt = keypoint_pck_accuracy(pred.copy(), gt.copy(), mask.copy(),
                                          0.3, normalize.copy())
    auc = keypoint_auc(pred.copy(), gt.copy(), mask.copy(), 30.0)
    nme = keypoint_nme(pred.copy(), gt.copy(), mask.copy(), normalize.copy())
    epe = keypoint_epe(pred.copy(), gt.copy(), mask.copy())

    hm_out = rng.uniform(0, 1, (N, K, 64, 48)).astype(np.float32)
    hm_tgt = rng.uniform(0, 1, (N, K, 64, 48)).astype(np.float32)
    p_acc, p_avg, p_cnt = pose_pck_accuracy(hm_out.copy(), hm_tgt.copy(),
                                            mask.copy())

    # OKS fixtures
    M = 12
    g = rng.uniform(0, 200, (K * 3,)).astype(np.float64)
    d = rng.uniform(0, 200, (M, K * 3)).astype(np.float64)
    d[:, 2::3] = rng.uniform(0, 1, (M, K))
    a_g = 5000.0
    a_d = rng.uniform(2000, 9000, M)
    ious_plain = oks_iou(g.copy(), d.copy(), a_g, a_d.copy())
    ious_vis = oks_iou(g.copy(), d.copy(), a_g, a_d.copy(), vis_thr=0.4)

    base = rng.uniform(0, 100, (M, K, 3))
    kpts_db = []
    for i in range(M):
        kp = base[i % 4] + rng.normal(0, 2 if i % 3 else 40, (K, 3))
        kpts_db.append({"keypoints": kp, "score": float(rng.uniform(0.2, 1)),
                        "area": float(rng.uniform(2000, 9000))})
    keep_hard = oks_nms([dict(k) for k in kpts_db], 0.5)
    keep_soft = soft_oks_nms([dict(k) for k in kpts_db], 0.5, max_dets=6)

    # flip-family fixtures (round-3 additions)
    FP = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14],
          [15, 16]]
    reg = rng.uniform(-1, 2, (4, K, 3)).astype(np.float32)
    reg_static = fliplr_regression(reg.copy(), FP, center_mode="static",
                                   center_x=0.5)
    reg_root = fliplr_regression(reg.copy(), FP, center_mode="root",
                                 center_index=0)
    K3 = 6  # CombinedTarget: 6 joints x 3 channels
    FP3 = [[1, 2], [4, 5]]
    hm_comb = rng.normal(0, 1, (2, K3 * 3, 16, 12)).astype(np.float32)
    comb_back = flip_back(hm_comb.copy(), FP3,
                          target_type="CombinedTarget")

    dets = rng.uniform(0, 200, (20, 5)).astype(np.float32)
    dets[:, 2:4] = dets[:, 0:2] + rng.uniform(10, 80, (20, 2))
    keep_bbox = nms(dets.copy(), 0.4)

    np.savez_compressed(
        "/root/repo/tests/golden/misc_golden.npz",
        pred=pred, gt=gt, mask=mask, normalize=normalize,
        pck_acc=acc, pck_avg=avg, pck_cnt=cnt, auc=auc, nme=nme, epe=epe,
        hm_out=hm_out, hm_tgt=hm_tgt, p_acc=p_acc, p_avg=p_avg, p_cnt=p_cnt,
        reg=reg, reg_static=reg_static, reg_root=reg_root,
        hm_comb=hm_comb, comb_back=comb_back,
        oks_g=g, oks_d=d, oks_ag=a_g, oks_ad=a_d,
        ious_plain=ious_plain, ious_vis=ious_vis,
        kpts_db_kp=np.array([k["keypoints"] for k in kpts_db]),
        kpts_db_score=np.array([k["score"] for k in kpts_db]),
        kpts_db_area=np.array([k["area"] for k in kpts_db]),
        keep_hard=keep_hard, keep_soft=keep_soft,
        dets=dets, keep_bbox=np.array(keep_bbox))
    print("wrote misc golden")


if __name__ == "__main__":
    main()
