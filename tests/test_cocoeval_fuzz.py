"""Fuzz the from-spec CocoKeypointEval against an independent transcription
of the pycocotools COCOeval keypoint algorithm (VERDICT r1 item 8).

The oracle below is a literal re-transcription of the published COCO
evaluation protocol (cocodataset/cocoapi pycocotools/cocoeval.py semantics:
computeOks, evaluateImg, accumulate, summarize for iouType='keypoints',
single category) written agains the algorithm, independently of
eval/cocoeval.py's vectorized implementation.  200+ randomized multi-person
scenes with crowd flags, unlabeled gts, area-range edge cases and >20
detections must agree to 1e-6 on all ten summary stats.
"""
import numpy as np
import pytest

from easy_vitpose_tpu.eval.cocoeval import CocoKeypointEval
from easy_vitpose_tpu.ops.oks import DEFAULT_SIGMAS

K = 17
T_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
R_THRS = np.linspace(0.0, 1.0, 101)
# keypoints protocol: areaRng [[0, 1e5^2], [32^2, 96^2], [96^2, 1e5^2]],
# maxDets [20]
A_RNGS = [(0.0, 1e5 ** 2), (32 ** 2, 96 ** 2), (96 ** 2, 1e5 ** 2)]
MAXDET = 20


def _oracle_oks(gts, dts, sigmas):
    """computeOks: (D, G) OKS matrix; dts already score-sorted+truncated."""
    var = (np.asarray(sigmas) * 2) ** 2
    ious = np.zeros((len(dts), len(gts)))
    for j, gt in enumerate(gts):
        g = np.asarray(gt["keypoints"], np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = int(np.count_nonzero(vg > 0))
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.asarray(dt["keypoints"], np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                z = np.zeros(K)
                dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
            e = (dx ** 2 + dy ** 2) / var / (gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _oracle_evaluate_img(gts, dts, ious_full, a_rng):
    """evaluateImg for one image / one area range."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        g["_ignore"] = 1 if (g["ignore"] or g["area"] < a_rng[0]
                             or g["area"] > a_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[:MAXDET]]
    iscrowd = [int(g["iscrowd"]) for g in gts]
    ious = (ious_full[:, gtind] if len(ious_full) > 0 else ious_full)

    T, G, D = len(T_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious) != 0:
        for tind, t in enumerate(T_THRS):
            for dind, d in enumerate(dts):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = g_id(gts[m])
                gtm[tind, m] = d_id(d)
    a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                  for d in dts]).reshape(1, -1)
    dt_ig = np.logical_or(dt_ig, np.logical_and(
        dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm, "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig, "dtIgnore": dt_ig,
    }


def g_id(g):
    return g["id"]


def d_id(d):
    return d["_id"]


def _oracle_accumulate(per_img_evals):
    """accumulate + summarize for one (area range): returns
    (precision (T, R), recall (T,))."""
    T, R = len(T_THRS), len(R_THRS)
    precision = -np.ones((T, R))
    recall = -np.ones(T)
    E = [e for e in per_img_evals if e is not None]
    if len(E) == 0:
        return precision, recall
    dt_scores = np.concatenate([e["dtScores"] for e in E])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
    dt_ig = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
    npig = np.count_nonzero(gt_ig == 0)
    if npig == 0:
        return precision, recall
    tps = np.logical_and(dtm, np.logical_not(dt_ig))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros(R)
        recall[t] = rc[-1] if nd else 0
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds_r = np.searchsorted(rc, R_THRS, side="left")
        for ri, pi in enumerate(inds_r):
            if pi < nd:
                q[ri] = pr[pi]
        precision[t] = q
    return precision, recall


def oracle_stats(gt, results, sigmas=DEFAULT_SIGMAS):
    """Full oracle: the ten keypoint summary stats, pycocotools order."""
    from collections import defaultdict
    gts_by_img = defaultdict(list)
    for ann in gt["annotations"]:
        a = dict(ann)
        a["ignore"] = int(a.get("iscrowd", 0)) or a["num_keypoints"] == 0
        a["iscrowd"] = a.get("iscrowd", 0)
        gts_by_img[a["image_id"]].append(a)
    dts_by_img = defaultdict(list)
    for i, r in enumerate(results):
        d = dict(r)
        d["_id"] = i + 1
        kp = np.asarray(d["keypoints"], np.float64)
        x, y = kp[0::3], kp[1::3]
        d["area"] = (x.max() - x.min()) * (y.max() - y.min())  # loadRes
        dts_by_img[d["image_id"]].append(d)
    img_ids = sorted(set(gts_by_img) | set(dts_by_img))

    # OKS matrices once per image (dts score-sorted, truncated)
    ious = {}
    for img in img_ids:
        dts = sorted(dts_by_img[img], key=lambda d: -d["score"])[:MAXDET]
        ious[img] = _oracle_oks(gts_by_img[img], dts, sigmas)

    out = {}
    names = ["AP", "AP .5", "AP .75", "AP (M)", "AP (L)",
             "AR", "AR .5", "AR .75", "AR (M)", "AR (L)"]
    per_rng = []
    for a_rng in A_RNGS:
        evals = [_oracle_evaluate_img([dict(g) for g in gts_by_img[i]],
                                      dts_by_img[i], ious[i], a_rng)
                 for i in img_ids]
        per_rng.append(_oracle_accumulate(evals))

    def mean_valid(x):
        v = x[x > -1]
        return float(v.mean()) if v.size else -1.0

    p_all, r_all = per_rng[0]
    p_m, r_m = per_rng[1]
    p_l, r_l = per_rng[2]
    t50 = int(np.argwhere(T_THRS == 0.5)[0][0])
    t75 = int(np.argwhere(T_THRS == 0.75)[0][0])
    out["AP"] = mean_valid(p_all)
    out["AP .5"] = mean_valid(p_all[t50])
    out["AP .75"] = mean_valid(p_all[t75])
    out["AP (M)"] = mean_valid(p_m)
    out["AP (L)"] = mean_valid(p_l)
    out["AR"] = mean_valid(r_all)
    out["AR .5"] = mean_valid(np.asarray([r_all[t50]]))
    out["AR .75"] = mean_valid(np.asarray([r_all[t75]]))
    out["AR (M)"] = mean_valid(r_m)
    out["AR (L)"] = mean_valid(r_l)
    return dict(zip(names, [out[n] for n in names]))


# --------------------------------------------------------------- scene gen

def random_scene(rng, n_imgs=4):
    """Random multi-person scenes: crowd gts, unlabeled gts, tiny/large
    areas straddling the 32^2/96^2 boundaries, noisy + spurious dts,
    sometimes >20 dts per image."""
    images, anns, results = [], [], []
    ann_id = 1
    for img_id in range(1, n_imgs + 1):
        images.append({"id": img_id, "width": 640, "height": 480})
        n_gt = int(rng.integers(0, 6))
        for _ in range(n_gt):
            side = float(rng.choice(
                [16, 31.9, 32, 32.1, 64, 95.9, 96, 96.1, 160, 300]))
            cx, cy = rng.uniform(50, 590), rng.uniform(50, 430)
            kp = np.zeros((K, 3))
            kp[:, 0] = rng.uniform(cx - side / 2, cx + side / 2, K)
            kp[:, 1] = rng.uniform(cy - side / 2, cy + side / 2, K)
            kp[:, 2] = rng.choice([0, 1, 2], K, p=[0.2, 0.3, 0.5])
            nk = int((kp[:, 2] > 0).sum())
            if rng.uniform() < 0.15:   # unlabeled gt
                kp[:, 2] = 0
                nk = 0
            # exact boundary areas (32^2, 96^2) sometimes: pycocotools
            # treats area == rng-edge as IN range on both ends
            area = float(side * side) if rng.uniform() < 0.3 else \
                float(side * side * rng.uniform(0.6, 1.0))
            anns.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kp.ravel().tolist(), "num_keypoints": nk,
                "bbox": [cx - side / 2, cy - side / 2, side, side],
                "area": area,
                "iscrowd": int(rng.uniform() < 0.15)})
            ann_id += 1
            # detections near this gt (0-2), jittered
            for _ in range(int(rng.integers(0, 3))):
                d = kp.copy()
                d[:, 0] += rng.normal(0, side * rng.uniform(0.005, 0.15), K)
                d[:, 1] += rng.normal(0, side * rng.uniform(0.005, 0.15), K)
                d[:, 2] = rng.uniform(0.1, 1.0, K)
                results.append({
                    "image_id": img_id, "category_id": 1,
                    "keypoints": d.ravel().tolist(),
                    "score": float(rng.uniform(0.05, 1.0))})
        # spurious detections; occasionally blow past maxDets=20
        n_fp = int(rng.integers(0, 4))
        if rng.uniform() < 0.1:
            n_fp = int(rng.integers(20, 30))
        for _ in range(n_fp):
            side = float(rng.choice([20, 60, 150]))
            cx, cy = rng.uniform(50, 590), rng.uniform(50, 430)
            d = np.zeros((K, 3))
            d[:, 0] = rng.uniform(cx - side / 2, cx + side / 2, K)
            d[:, 1] = rng.uniform(cy - side / 2, cy + side / 2, K)
            d[:, 2] = rng.uniform(0.1, 1.0, K)
            if rng.uniform() < 0.1:   # degenerate: all kpts on one point
                d[:, 0] = cx
                d[:, 1] = cy
            if rng.uniform() < 0.15:  # some zero-confidence keypoints
                d[rng.uniform(size=K) < 0.5, 2] = 0.0
            results.append({
                "image_id": img_id, "category_id": 1,
                "keypoints": d.ravel().tolist(),
                "score": float(rng.uniform(0.05, 1.0))})
    return {"images": images, "annotations": anns}, results


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_agreement_batched(seed):
    """8 param cases x 25 scenes = 200 randomized scenarios."""
    rng = np.random.default_rng(seed)
    for _ in range(25):
        gt, results = random_scene(rng)
        if not results:
            continue
        got = CocoKeypointEval(gt, results).accumulate()
        want = oracle_stats(gt, results)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6, (
                f"seed={seed} stat {k}: got {got[k]}, oracle {want[k]}")
