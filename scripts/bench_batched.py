"""TPU A/B: offline batched video inference vs the sequential per-frame path.

Drives the PUBLIC VitInference API end-to-end (detector + tracker + pose)
on a synthetic 1080p video, interleaved within one process.  The batched
mode's win is dispatch/RTT amortization: one detector program + one pose
program per window instead of two programs (and two fetches) per frame.

Usage: python scripts/bench_batched.py [--size b] [--window 16] [--frames 64]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="b", choices=["s", "b", "l", "h"])
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bf16",
                    choices=["bf16", "fp32", "int8"])
    ap.add_argument("--people", type=int, default=4,
                    help="synthetic boxes per frame (precomputed-box mode "
                         "isolates the pipeline; --yolo adds detection)")
    ap.add_argument("--yolo", action="store_true",
                    help="run a random-weight YOLOv8n live instead of "
                         "precomputed boxes")
    args = ap.parse_args()

    import jax
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    ckpt = f"/tmp/bench_vitpose-{args.size}-coco.npz"
    save_params(ckpt, params)
    yolo_path = None
    if args.yolo:
        from easy_vitpose_tpu.detect.yolo import YoloSpec, init_yolo_params
        from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
        yparams = init_yolo_params(jax.random.PRNGKey(1), YoloSpec("n"))
        yolo_path = "/tmp/bench_yolov8n.npz"
        save_yolo_npz(yolo_path, yparams, "n", 80)

    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W, 3), np.uint8)
    frames = [np.roll(base, 7 * i, axis=1) for i in range(args.frames)]
    boxes = [np.stack([np.stack(
        [rng.uniform(0, W - 500, args.people),
         rng.uniform(0, H - 700, args.people),
         rng.uniform(500, W, args.people),
         rng.uniform(700, H, args.people),
         np.full(args.people, 0.9)], -1)], 0)[0].astype(np.float32)
        for _ in range(args.frames)]

    def fresh():
        return VitInference(ckpt, yolo=yolo_path, model_name=args.size,
                            dataset="coco", is_video=True, dtype=args.dtype)

    def run_seq(m):
        m.reset()
        for i, f in enumerate(frames):
            out = m.inference(f, bboxes=None if args.yolo else boxes[i])
        return out

    def run_bat(m):
        m.reset()
        for s in range(0, args.frames, args.window):
            w = frames[s:s + args.window]
            b = None if args.yolo else boxes[s:s + args.window]
            outs = m.inference_batched(w, bboxes_per_frame=b)
        return outs[-1]

    m = fresh()
    t0 = time.perf_counter()
    run_seq(m)
    print(f"seq compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    run_bat(m)
    print(f"batched compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {"seq": [], "batched": []}
    for rep in range(args.reps):
        for label, fn in (("seq", run_seq), ("batched", run_bat)):
            t0 = time.perf_counter()
            fn(m)
            dt = (time.perf_counter() - t0) / args.frames
            times[label].append(dt * 1e3)
            print(f"rep {rep} {label:8s}: {dt * 1e3:7.2f} ms/frame "
                  f"({1e3 / (dt * 1e3):6.1f} fps)", flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    print(json.dumps({
        "size": args.size, "window": args.window, "people": args.people,
        "dtype": args.dtype, "yolo": bool(args.yolo),
        "seq_ms_per_frame": round(med["seq"], 2),
        "batched_ms_per_frame": round(med["batched"], 2),
        "speedup": round(med["seq"] / med["batched"], 3),
    }))


if __name__ == "__main__":
    main()
