"""COCO val evaluation CLI (reference evaluation_on_coco.py:31-91 workflow):
run VitInference over val images, write results.json, score with the
built-in OKS AP evaluator (pycocotools-free).

Usage:
  python -m easy_vitpose_tpu.cli.eval_coco --ann ann.json --imgdir val2017 \
      --model vitpose-b-coco.npz --model-name b --yolo yolov8n.npz
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..eval.cocoeval import CocoKeypointEval
from ..pipeline.inference import VitInference
from ..utils.io import NumpyEncoder

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def main(argv=None, model_cfg=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True, help="COCO keypoint ann json")
    p.add_argument("--imgdir", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--model-name", required=True, choices=["s", "b", "l", "h"])
    p.add_argument("--dataset", default=None,
                   help="default: the --task name, else inferred from the "
                        "checkpoint filename")
    p.add_argument("--yolo", default=None)
    p.add_argument("--yolo-size", type=int, default=640)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32", "int8"])
    p.add_argument("--out", default="results.json")
    p.add_argument("--limit", type=int, default=0, help="max images (debug)")
    p.add_argument("--use-gt-bbox", action="store_true",
                   help="evaluate with ground-truth boxes (no detector)")
    p.add_argument("--gt-crops-batched", type=int, default=0, metavar="B",
                   help="fast gt-crop path: dataset-style affine crops in "
                        "fixed batches of B through one jitted forward "
                        "(no detector, no per-image pipeline) — the cheap "
                        "way to run the AP parity gate; supports "
                        "bf16/fp32/int8 dtypes")
    p.add_argument("--oks-nms", choices=["none", "hard", "soft"],
                   default="none",
                   help="per-image OKS NMS over predictions before scoring "
                        "(the reference dataset writer's nms/soft_nms, "
                        "datasets/COCO.py:441-496; thresholds from "
                        "configs data_cfg: oks_thr=0.9, vis_thr=0.2)")
    p.add_argument("--oks-thr", type=float, default=0.9)
    p.add_argument("--task", default=None,
                   help="task head for multi-task (ViTPose+) checkpoints")
    p.add_argument("--per-keypoint", action="store_true",
                   help="with --gt-crops-batched: also print a per-keypoint "
                        "PCK@0.05 table (bbox-normalized, matched 1:1 to "
                        "each gt instance) with skeleton joint names")
    p.add_argument("--flip-test", action="store_true",
                   help="flip-test averaging (mmpose eval protocol: also "
                        "forward the mirrored crop, un-flip, average; the "
                        "reference declares flip_test in its configs but "
                        "never wires it)")
    args = p.parse_args(argv)

    with open(args.ann) as f:
        gt = json.load(f)
    images = {im["id"]: im for im in gt["images"]}
    img_ids = sorted({a["image_id"] for a in gt["annotations"]
                      if a.get("num_keypoints", 0) > 0})
    if args.limit:
        img_ids = img_ids[:args.limit]

    gt_boxes = {}
    if args.use_gt_bbox:
        for a in gt["annotations"]:
            if a.get("num_keypoints", 0) == 0 or a.get("iscrowd", 0):
                continue
            x, y, w, h = a["bbox"]
            gt_boxes.setdefault(a["image_id"], []).append(
                [x, y, x + w, y + h, 1.0])

    if args.gt_crops_batched:
        results = _gt_crops_batched(args, model_cfg=model_cfg)
        return _score(args, gt, results)

    dataset = args.dataset
    if dataset is None and args.task is None:
        from ..configs import NUM_KEYPOINTS, infer_dataset_by_path
        try:
            dataset = infer_dataset_by_path(args.model)
        except ValueError:
            dataset = None
        if dataset not in NUM_KEYPOINTS:
            # no (valid) dataset token in the filename (e.g. model-final.npz
            # would 'infer' the junk token 'final') -> historical default
            dataset = "coco" 
    model = VitInference(args.model, yolo=args.yolo,
                         model_name=args.model_name, dataset=dataset,
                         yolo_size=args.yolo_size, is_video=False,
                         dtype=args.dtype, task=args.task,
                         flip_test=args.flip_test)

    results = []
    t0 = time.perf_counter()
    for n, img_id in enumerate(img_ids):
        path = os.path.join(args.imgdir, images[img_id]["file_name"])
        img = cv2.imread(path)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        bboxes = (np.asarray(gt_boxes.get(img_id, []), np.float32)
                  if args.use_gt_bbox else None)
        if bboxes is not None and len(bboxes) == 0:
            continue
        kpts = model.inference(img, bboxes=bboxes)
        for pid, k in kpts.items():
            # k rows are (y, x, score); COCO wants flat [x, y, v] * K.
            # Keep the per-keypoint confidence in the third slot (like the
            # reference dataset writer, datasets/COCO.py:481) — COCOeval
            # ignores predicted v, but the --oks-nms path below gates
            # keypoints on it via vis_thr, so zeros would make OKS-NMS a
            # silent no-op.
            flat = np.stack([k[:, 1], k[:, 0], k[:, 2]], -1).ravel()
            results.append({
                "image_id": int(img_id), "category_id": 1,
                "keypoints": [round(float(v), 2) for v in flat],
                "score": float(model._scores_bbox.get(pid, float(k[:, 2].mean()))),
            })
        if (n + 1) % 100 == 0:
            rate = (n + 1) / (time.perf_counter() - t0)
            print(f"  {n + 1}/{len(img_ids)} images ({rate:.1f} img/s)")

    return _score(args, gt, results)


def _gt_crops_batched(args, model_cfg=None):
    """Batched gt-crop evaluation: dataset-style affine crops -> fixed-slot
    jitted forward -> UDP decode -> COCO results.

    Isolates model quality from the detector and runs at training-forward
    throughput, so the "AP within 0.3" parity gate
    (reference evaluation_on_coco.py:76-87) is one cheap command once real
    checkpoints are reachable; int8 gives the quantization AP delta the
    same way."""
    import jax
    import jax.numpy as jnp

    from ..configs import NUM_KEYPOINTS, get_model_config
    from ..models.vitpose import cast_params, vitpose_forward
    from ..ops.decode import keypoints_from_heatmaps_udp
    from ..pipeline.pose_step import default_block_impl
    from ..train.dataset import PIXEL_STD, CocoPoseDataset, batch_iterator
    from ..utils.checkpoint import load_params

    dataset = args.dataset
    if dataset is None and args.task is not None:
        dataset = args.task  # a multi-task checkpoint's task IS its dataset
    if dataset is None:
        # same filename-inference UX as the pipeline path
        from ..configs import infer_dataset_by_path
        try:
            dataset = infer_dataset_by_path(args.model)
        except ValueError:
            dataset = None
        if dataset not in NUM_KEYPOINTS:
            dataset = "coco"
    args.dataset = dataset  # resolved name (for the per-keypoint report)
    K = NUM_KEYPOINTS[dataset]
    cfgm = model_cfg or get_model_config(dataset, args.model_name)
    params = load_params(args.model)
    # multi-task (ViTPose+) checkpoint: splice the task's expert + head
    # into a single-task tree, same as VitInference
    from ..convert.vitpose_plus import is_plus_params, select_task
    if is_plus_params(params):
        params = select_task(params, args.task or dataset)
    elif args.task is not None:
        raise SystemExit("--task requires a multi-task (ViTPose+) "
                         "checkpoint from 'cli/convert plus'")
    impl = default_block_impl(
        compute_dtype=jnp.float32 if args.dtype == "fp32"
        else jnp.bfloat16)
    if args.dtype in ("int8", "w8a8"):
        from ..models.quant import quantize_vit_params
        params = quantize_vit_params(params, jnp.bfloat16)
        impl = "pallas_q8" if impl == "pallas" else "xla_q8"
    elif args.dtype in ("bf16", "bfloat16"):
        params = cast_params(params, jnp.bfloat16)
    in_dtype = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16
    fp = None
    if args.flip_test:
        from ..skeletons import flip_pairs as _flip_pairs
        fp = tuple(tuple(int(v) for v in pr) for pr in _flip_pairs(dataset))

    def _fwd(p, x):
        x = x.astype(in_dtype)
        h = vitpose_forward(p, x, cfgm,
                            block_impl=impl).astype(jnp.float32)
        if fp is not None:
            from ..ops.affine import flip_back_heatmaps
            hf = vitpose_forward(p, x[:, :, ::-1, :], cfgm,
                                 block_impl=impl).astype(jnp.float32)
            h = 0.5 * (h + flip_back_heatmaps(hf, fp))
        return h

    # commit params to device(s) once — a host pytree would re-upload the
    # whole model every batch through jit
    n_dev = len(jax.devices())
    if n_dev > 1 and args.gt_crops_batched % n_dev == 0:
        # data-parallel eval: crops 'data'-sharded over the local mesh,
        # params replicated (multi-chip val runs at aggregate throughput)
        from ..parallel import mesh as meshlib
        mesh = meshlib.make_mesh()
        params = jax.device_put(params, meshlib.replicated(mesh))
        fwd = jax.jit(_fwd,
                      in_shardings=(meshlib.replicated(mesh),
                                    meshlib.batch_sharded(mesh)),
                      out_shardings=meshlib.batch_sharded(mesh))
    else:
        params = jax.tree.map(jnp.asarray, params)
        fwd = jax.jit(_fwd)

    ds = CocoPoseDataset(
        root_path=os.path.dirname(args.imgdir.rstrip("/")) or ".",
        data_version=os.path.basename(args.imgdir.rstrip("/")),
        ann_file=args.ann, is_train=False, num_joints=K)
    if args.limit:
        ds.data = ds.data[:args.limit]  # --limit counts gt instances here
    B = args.gt_crops_batched
    results = []
    t0 = time.perf_counter()
    done = 0
    for b in batch_iterator(ds, B, shuffle=False, drop_last=False,
                            prefetch=2):
        n = len(b["images"])
        imgs = b["images"]
        if n < B:  # keep the jitted program's shape static
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], B - n, 0)])
        heat = np.asarray(fwd(params, jnp.asarray(imgs)))[:n]
        metas = b["meta"]
        centers = np.stack([m["center"] for m in metas])
        scales = np.stack([m["scale"] for m in metas]) * PIXEL_STD
        preds, maxv = keypoints_from_heatmaps_udp(heat, centers, scales)
        preds, maxv = np.asarray(preds), np.asarray(maxv)
        for i, m in enumerate(metas):
            flat = np.concatenate([preds[i], maxv[i]], -1).ravel()
            results.append({
                "image_id": int(m["imgId"]), "category_id": 1,
                "keypoints": [round(float(v), 2) for v in flat],
                "score": float(maxv[i].mean()),
                "ann_id": int(m["annId"])})  # extra key; COCOeval ignores
        done += n
        if done % (20 * B) < B:
            rate = done / (time.perf_counter() - t0)
            print(f"  {done}/{len(ds)} crops ({rate:.1f} crop/s)")
    print(f"gt-crops-batched: {len(results)} detections "
          f"({len(ds) / (time.perf_counter() - t0):.1f} crop/s)")
    return results


def _per_keypoint_report(args, gt, results):
    """Per-keypoint PCK@0.05 over gt-matched instances (mmpose-style
    breakdown the reference never reports); distances normalized by each
    instance's gt bbox (w, h)."""
    from ..eval.metrics import keypoint_pck_accuracy
    anns = {a.get("id", -1): a for a in gt.get("annotations", [])}
    pred_list, gt_list, mask_list, norm_list = [], [], [], []
    for r in results:
        a = anns.get(r.get("ann_id"))
        if a is None:
            continue
        pk = np.asarray(r["keypoints"], np.float32).reshape(-1, 3)
        gk = np.asarray(a["keypoints"], np.float32).reshape(-1, 3)
        if len(pk) != len(gk):
            continue
        pred_list.append(pk[:, :2])
        gt_list.append(gk[:, :2])
        mask_list.append(gk[:, 2] > 0)
        norm_list.append(np.asarray(a["bbox"][2:4], np.float32))
    if not pred_list:
        return
    acc, avg, cnt = keypoint_pck_accuracy(
        np.stack(pred_list), np.stack(gt_list), np.stack(mask_list),
        0.05, np.stack(norm_list))
    names = None
    try:
        from ..skeletons import keypoint_names
        ds_name = args.dataset
        if ds_name and len(keypoint_names(ds_name)) == len(acc):
            names = keypoint_names(ds_name)
    except Exception:
        pass
    print(f"per-keypoint PCK@0.05 (bbox-normalized, "
          f"{len(pred_list)} instances, {cnt} keypoint types):")
    for k, a in enumerate(acc):
        label = names[k] if names else f"kpt_{k}"
        val = "   n/a" if a < 0 else f"{a:6.3f}"
        print(f"  {label:24s} {val}")
    print(f"  {'mean':24s} {avg:6.3f}")


def _score(args, gt, results):
    """Optional OKS-NMS, results file, and AP summary (shared tail)."""
    if getattr(args, "per_keypoint", False):
        _per_keypoint_report(args, gt, results)
    if args.oks_nms != "none" and results:
        from collections import defaultdict
        from ..ops.oks import oks_nms, soft_oks_nms
        by_img = defaultdict(list)
        for r in results:
            by_img[r["image_id"]].append(r)
        kept = []
        for img_id, rs in by_img.items():
            db = []
            for r in rs:
                kp = np.asarray(r["keypoints"], np.float64).reshape(-1, 3)
                w = kp[:, 0].max() - kp[:, 0].min()
                h = kp[:, 1].max() - kp[:, 1].min()
                db.append({"keypoints": kp, "score": r["score"],
                           "area": max(w * h, 1.0)})
            fn = soft_oks_nms if args.oks_nms == "soft" else oks_nms
            keep = fn(db, args.oks_thr, vis_thr=0.2)
            kept.extend(rs[int(i)] for i in np.atleast_1d(keep))
        print(f"OKS {args.oks_nms}-NMS: {len(results)} -> {len(kept)} dets")
        results = kept

    with open(args.out, "w") as f:
        json.dump(results, f, cls=NumpyEncoder)
    print(f"wrote {args.out} ({len(results)} detections)")

    stats = CocoKeypointEval(gt, results).summarize()
    return stats


if __name__ == "__main__":
    main()
