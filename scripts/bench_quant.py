"""TPU A/B: int8 (W8A8) fused block vs the bf16 fused block.

Interleaved within one process (tunnel throughput drifts 2-3x between runs,
so only interleaved comparisons are trustworthy).  Times the full pose step
(crop sample + backbone + head + decode) per path with the dependency-chain
+ single-fetch method from bench.py.

Usage: python scripts/bench_quant.py [--size b] [--slots 64] [--reps 5]
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
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--frames", type=int, default=20,
                    help="chained steps per timed rep")
    ap.add_argument("--reps", type=int, default=5,
                    help="interleaved A/B repetitions")
    ap.add_argument("--impl-a", default="pallas",
                    help="baseline block_impl (bf16 params)")
    ap.add_argument("--impl-b", default="pallas_q8",
                    help="quantized block_impl (int8 params)")
    ap.add_argument("--sampler-a", default="matmul")
    ap.add_argument("--sampler-b", default="matmul")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.quant import quantize_vit_params
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params)
    from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)
    params_f32 = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    params16 = cast_params(params_f32, jnp.bfloat16)
    params_q8 = quantize_vit_params(params_f32, jnp.bfloat16)
    del params_f32

    H, W, M = 1080, 1920, args.slots
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, W - 400, M), rng.uniform(0, H - 600, M),
        rng.uniform(400, W, M), rng.uniform(600, H, M)], -1)
        .astype(np.float32))
    mask = jnp.ones((M,), bool)

    name_a = f"{args.impl_a}+{args.sampler_a}"
    name_b = f"{args.impl_b}+{args.sampler_b}"

    def pick(impl):
        return params_q8 if "q8" in impl else params16

    variants = {name_a: (pick(args.impl_a), args.impl_a, args.sampler_a),
                name_b: (pick(args.impl_b), args.impl_b, args.sampler_b)}

    def chain(n, name):
        params, impl, sampler = variants[name]
        b = boxes
        out = None
        for _ in range(n):
            out = pose_step_jit(params, frame, b, mask, cfg,
                                compute_dtype=jnp.bfloat16, sampler=sampler,
                                block_impl=impl)
            b = boxes + 0.0 * out[0, 0, 0]
        return out

    # numeric check first (also compiles both programs)
    a = np.asarray(chain(1, name_a))
    t0 = time.perf_counter()
    bv = np.asarray(chain(1, name_b))
    print(f"{name_b} compile+run: {time.perf_counter() - t0:.1f}s",
          flush=True)
    finite = np.isfinite(a) & np.isfinite(bv)
    dpos = np.abs(a[..., :2] - bv[..., :2])[finite[..., :2]]
    dsc = np.abs(a[..., 2] - bv[..., 2])[finite[..., 2]]
    print(f"keypoint pos |bf16 - int8|: median {np.median(dpos):.3f} px, "
          f"p95 {np.percentile(dpos, 95):.3f}; score max {dsc.max():.5f}",
          flush=True)

    times = {name_a: [], name_b: []}
    for rep in range(args.reps):
        for impl in (name_a, name_b):
            t0 = time.perf_counter()
            out = chain(args.frames, impl)
            float(out[0, 0, 0])  # single fetch = hard sync
            dt = (time.perf_counter() - t0) / args.frames
            times[impl].append(dt * 1e3)
            print(f"rep {rep} {impl:10s}: {dt * 1e3:7.2f} ms/frame "
                  f"({M / dt:7.0f} crops/s)", flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    result = {
        "size": args.size, "slots": M,
        f"{name_a}_ms": round(med[name_a], 2),
        f"{name_b}_ms": round(med[name_b], 2),
        "speedup": round(med[name_a] / med[name_b], 3),
        "pos_diff_median_px": float(np.median(dpos)),
        "score_diff_max": float(dsc.max()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
