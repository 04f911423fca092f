"""Training input-pipeline benchmark: host loader samples/s, host-render vs
device-input mode.

The ViT-B/64 fused train step consumes ~900 imgs/s on one v5e chip
(PERF.md); a single loader worker must therefore produce a sample every
~1.1 ms x workers.  This script decomposes the per-sample host cost
(JPEG decode / affine warp / Gaussian render / normalize / collate) and
measures the end-to-end samples/s of ``batch_iterator`` in both modes on a
synthetic on-disk COCO dataset, plus the host->device bytes per sample.

Usage: python scripts/bench_loader.py [--n 512] [--batch 64] [--workers 0]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_coco(root, n_images=64, hw=(480, 640), people=2, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    images, annotations = [], []
    h, w = hw
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    base = cv2.GaussianBlur(base, (31, 31), 8)  # jpeg-compressible content
    for i in range(n_images):
        name = f"{i:012d}.jpg"
        cv2.imwrite(os.path.join(root, "train2017", name), base,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        for a in range(people):
            kp = np.zeros((17, 3))
            kp[:, 0] = rng.uniform(40, w - 40, 17)
            kp[:, 1] = rng.uniform(40, h - 40, 17)
            kp[:, 2] = 2
            x0, y0 = kp[:, 0].min() - 5, kp[:, 1].min() - 5
            bw, bh = kp[:, 0].max() - x0 + 5, kp[:, 1].max() - y0 + 5
            annotations.append({
                "id": i * 100 + a, "image_id": i, "category_id": 1,
                "keypoints": kp.ravel().tolist(), "num_keypoints": 17,
                "bbox": [float(x0), float(y0), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0})
    with open(os.path.join(root, "annotations",
                           "person_keypoints_train2017.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)


def bytes_per_sample(batch, batch_size):
    return sum(v.nbytes for k, v in batch.items() if k != "meta") / batch_size


def run_mode(ds, n, batch_size, workers):
    from easy_vitpose_tpu.train.dataset import batch_iterator
    it = batch_iterator(ds, batch_size, shuffle=True, seed=1,
                        workers=workers)
    first = next(it)          # warm the pool / thread before timing
    t0 = time.perf_counter()
    seen = 0
    for batch in it:
        seen += len(batch["meta"])
        if seen >= n:
            break
    dt = time.perf_counter() - t0
    return seen / dt, bytes_per_sample(first, batch_size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512, help="samples to time")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=0)
    args = ap.parse_args()

    from easy_vitpose_tpu.train.dataset import CocoPoseDataset

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    make_synthetic_coco(tmp)
    print(f"# synthetic COCO at {tmp}; cores={os.cpu_count()}, "
          f"workers={args.workers}")

    results = {}
    for mode, device_input in [("host-render", False), ("device-input", True)]:
        ds = CocoPoseDataset(tmp, "train2017", is_train=True, seed=0,
                             device_input=device_input)
        sps, bps = run_mode(ds, args.n, args.batch, args.workers)
        results[mode] = (sps, bps)
        print(f"{mode:13s}: {sps:7.1f} samples/s/loader, "
              f"{bps / 1024:6.1f} KiB/sample host->device")

    h, d = results["host-render"][0], results["device-input"][0]
    ratio_b = results["host-render"][1] / results["device-input"][1]
    print(f"# device-input speedup {d / h:.2f}x, "
          f"transfer reduction {ratio_b:.1f}x")
    print(json.dumps({
        "metric": "train loader samples/s (device-input mode)",
        "value": round(d, 1), "unit": "samples/s",
        "vs_host_render": round(d / h, 3),
        "transfer_reduction_x": round(ratio_b, 2)}))


if __name__ == "__main__":
    main()
