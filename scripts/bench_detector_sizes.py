"""TPU A/B: (1) detector rect vs square letterbox @16:9, (2) fused block vs
XLA across ViT sizes (the serving default must not regress any size),
(3) single-dispatch detection frames (pipeline/fused_detect.py) vs the
two-program detect->fetch->pose path — interleaved, both paths paying
their real host fetches (the whole point is the fetch count: the fused
program saves one device round-trip + one dispatch per detection frame).

Usage: python scripts/bench_detector_sizes.py [--frames 30] [--reps 3]
       [--only dispatch]
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
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None, choices=["dispatch"],
                    help="run only the named section (dispatch = the "
                         "single-dispatch A/B)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.detect import yolo as Y
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params)
    from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    H, W = 1080, 1920
    frame = jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    result = {}

    # ---------------- detector: rect vs square, YOLOv8n @ 640, 16:9 -------
    params_n = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                            Y.init_yolo_params(jax.random.PRNGKey(1),
                                               Y.YoloSpec("n")))
    spec = Y.YoloSpec("n")

    # ------------- single-dispatch vs two-program detection frames --------
    if args.only in (None, "dispatch"):
        from easy_vitpose_tpu.pipeline.fused_detect import detect_pose_jit
        cfg_b = get_model_config("coco", "b")
        pose_params = cast_params(
            init_vitpose_params(jax.random.PRNGKey(0), cfg_b), jnp.bfloat16)
        geom = Y.letterbox_geometry(H, W, 640, rect=True)
        slots = 16
        det_args = (geom, spec, 640, (0,), 0.25, 0.7, 64, jnp.bfloat16)

        def frame_two_program(f):
            packed = jax.device_get(
                Y.detect_frame_jit(params_n, f, *det_args))
            # host side of the real pipeline: unpack/gate + slot fill
            boxes = np.zeros((slots, 4), np.float32)
            mask = np.zeros((slots,), bool)
            ok = (packed[:, 6] > 0) & (packed[:, 4] > 0.35)
            rows = packed[ok][:slots]
            boxes[:len(rows)] = np.clip(rows[:, :4], 0, [W, H, W, H])
            mask[:len(rows)] = True
            return jax.device_get(pose_step_jit(
                pose_params, f, jnp.asarray(boxes), jnp.asarray(mask),
                cfg_b, compute_dtype=jnp.bfloat16, sampler="matmul",
                block_impl="pallas"))

        def frame_fused(f):
            packed, kpts = jax.device_get(detect_pose_jit(
                params_n, pose_params, f, *det_args, cfg_b, slots, 0.35,
                compute_dtype=jnp.bfloat16, sampler="matmul",
                block_impl="pallas"))
            return packed, kpts

        paths = {"two_program": frame_two_program, "fused": frame_fused}
        disp_times = {k: [] for k in paths}
        for fn in paths.values():
            fn(frame)  # compile
        for rep in range(args.reps):
            for k, fn in paths.items():
                t0 = time.perf_counter()
                for _ in range(args.frames):
                    fn(frame)
                dt = (time.perf_counter() - t0) / args.frames * 1e3
                disp_times[k].append(dt)
                print(f"rep {rep} dispatch {k:12s}: {dt:6.2f} ms/frame",
                      flush=True)
        result["single_dispatch_ms"] = {
            k: round(float(np.median(v)), 2) for k, v in disp_times.items()}
        del pose_params
    if args.only == "dispatch":
        print(json.dumps(result))
        return

    def det_fn(rect):
        geom = Y.letterbox_geometry(H, W, 640, rect=rect)
        print(f"rect={rect}: canvas {geom[5]}x{geom[6]}", flush=True)

        def run(f):
            return Y.detect_frame_jit(params_n, f, geom, spec, 640, (0,),
                                      0.25, 0.7, 64, jnp.bfloat16)
        return jax.jit(run)

    fns = {"square": det_fn(False), "rect": det_fn(True)}
    det_times = {k: [] for k in fns}
    for k, fn in fns.items():
        fn(frame)  # compile
    for rep in range(args.reps):
        for k, fn in fns.items():
            f = frame
            t0 = time.perf_counter()
            out = None
            for _ in range(args.frames):
                out = fn(f)
                f = frame + (0 * out[0, 0]).astype(frame.dtype)
            float(out[0, 0])
            dt = (time.perf_counter() - t0) / args.frames * 1e3
            det_times[k].append(dt)
            print(f"rep {rep} detector {k:7s}: {dt:6.2f} ms", flush=True)

    # ---------------- fused block across sizes ----------------------------
    size_times = {}
    M = 64
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, W - 400, M), rng.uniform(0, H - 600, M),
        rng.uniform(400, W, M), rng.uniform(600, H, M)], -1)
        .astype(np.float32))
    mask = jnp.ones((M,), bool)
    for size in ("s", "l", "h"):
        cfg = get_model_config("coco", size)
        params = cast_params(init_vitpose_params(jax.random.PRNGKey(0), cfg),
                             jnp.bfloat16)
        times = {"xla": [], "pallas": []}

        def chain(n, impl):
            b = boxes
            out = None
            for _ in range(n):
                out = pose_step_jit(params, frame, b, mask, cfg,
                                    compute_dtype=jnp.bfloat16,
                                    sampler="matmul", block_impl=impl)
                b = boxes + 0.0 * out[0, 0, 0]
            return out

        for impl in times:
            chain(1, impl)  # compile
        n = max(args.frames // (4 if size == "h" else 2), 5)
        for rep in range(args.reps):
            for impl in times:
                t0 = time.perf_counter()
                out = chain(n, impl)
                float(out[0, 0, 0])
                dt = (time.perf_counter() - t0) / n * 1e3
                times[impl].append(dt)
                print(f"rep {rep} vit-{size} {impl:7s}: {dt:7.2f} ms/frame",
                      flush=True)
        size_times[size] = {k: round(float(np.median(v)), 2)
                            for k, v in times.items()}
        del params

    result["detector_ms"] = {k: round(float(np.median(v)), 2)
                             for k, v in det_times.items()}
    result["pose_e2e_ms"] = size_times
    print(json.dumps(result))


if __name__ == "__main__":
    main()
