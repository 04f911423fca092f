"""TPU A/B: fused Pallas transformer block vs the XLA block path.

Interleaved within one process (tunnel throughput drifts 2-3x between runs,
so only interleaved comparisons are trustworthy).  Times the full pose step
(crop sample + backbone + head + decode) per block_impl with the
dependency-chain + single-fetch method from bench.py.

Usage: python scripts/bench_fused_block.py [--size b] [--slots 64] [--reps 5]
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
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params)
    from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    if dtype == jnp.bfloat16:
        params = cast_params(params, dtype)

    H, W, M = 1080, 1920, args.slots
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, W - 400, M), rng.uniform(0, H - 600, M),
        rng.uniform(400, W, M), rng.uniform(600, H, M)], -1)
        .astype(np.float32))
    mask = jnp.ones((M,), bool)
    sampler = "matmul" if dtype == jnp.bfloat16 else "gather"

    def chain(n, block_impl):
        b = boxes
        out = None
        for _ in range(n):
            out = pose_step_jit(params, frame, b, mask, cfg,
                                compute_dtype=dtype, sampler=sampler,
                                block_impl=block_impl)
            b = boxes + 0.0 * out[0, 0, 0]
        return out

    # numeric check first (also compiles both programs)
    a = np.asarray(chain(1, "xla"))
    t0 = time.perf_counter()
    bv = np.asarray(chain(1, "pallas"))
    print(f"pallas compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    finite = np.isfinite(a) & np.isfinite(bv)
    d = np.abs(a - bv)[finite].max()
    print(f"keypoint max|xla - pallas| = {d:.5f} "
          f"(y/x in pixels, scores in [0,1])", flush=True)

    times = {"xla": [], "pallas": []}
    for rep in range(args.reps):
        for impl in ("xla", "pallas"):
            t0 = time.perf_counter()
            out = chain(args.frames, impl)
            float(out[0, 0, 0])  # single fetch = hard sync
            dt = (time.perf_counter() - t0) / args.frames
            times[impl].append(dt * 1e3)
            print(f"rep {rep} {impl:7s}: {dt * 1e3:7.2f} ms/frame "
                  f"({M / dt:7.0f} crops/s)", flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    result = {
        "size": args.size, "slots": M,
        "dtype": "fp32" if args.fp32 else "bf16",
        "xla_ms": round(med["xla"], 2),
        "pallas_ms": round(med["pallas"], 2),
        "speedup": round(med["xla"] / med["pallas"], 3),
        "max_kpt_diff": float(d),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
