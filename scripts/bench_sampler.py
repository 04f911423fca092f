"""TPU A/B: crop samplers (gather / matmul / pallas) standalone and e2e.

Interleaved within one process (tunnel drift).  Standalone sampler timing
uses the chain-and-fetch method; e2e uses the full pose step with the
fused-block backbone so the sampler delta is visible against the round-2
baseline (21.9 ms/frame).

Usage: python scripts/bench_sampler.py [--slots 64] [--reps 5]
       [--dtype bf16|int8]

--dtype int8 reruns the e2e lane at the round-4+ shipping config
(quantized backbone, pallas_q8 blocks): the r2 e2e null for the pallas
sampler was measured against a ~14 ms bf16 backbone; at int8 the
backbone is ~8.5 ms, so there is less compute to overlap the sampler
with and the verdict could flip (VERDICT r4 item 8's "one new idea").
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
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import IMAGE_SIZE, get_model_config
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params)
    from easy_vitpose_tpu.ops.pallas_sampler import sample_crops_pallas
    from easy_vitpose_tpu.ops.preprocess import (crop_geometry, sample_crops,
                                                 sample_crops_matmul)
    from easy_vitpose_tpu.pipeline.pose_step import pose_step_jit

    print("devices:", jax.devices(), flush=True)
    H, W, M = 1080, 1920, args.slots
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, W - 400, M), rng.uniform(0, H - 600, M),
        rng.uniform(400, W, M), rng.uniform(600, H, M)], -1)
        .astype(np.float32))
    mask = jnp.ones((M,), bool)

    samplers = {
        "gather": lambda f, g: sample_crops(f, g, IMAGE_SIZE,
                                            sample_dtype=jnp.bfloat16),
        "matmul": lambda f, g: sample_crops_matmul(f, g, IMAGE_SIZE,
                                                   sample_dtype=jnp.bfloat16),
        "pallas": lambda f, g: sample_crops_pallas(f, g, IMAGE_SIZE,
                                                   sample_dtype=jnp.bfloat16),
    }
    jits = {k: jax.jit(lambda b, k=k: samplers[k](frame, crop_geometry(
        b, (H, W)))) for k in samplers}

    # numeric check (bf16): pallas vs matmul
    ref = np.asarray(jits["matmul"](boxes), np.float32)
    got = np.asarray(jits["pallas"](boxes), np.float32)
    print(f"bf16 crops max|pallas - matmul| = {np.abs(ref - got).max():.3f} "
          f"(0..255 scale)", flush=True)

    def chain(fn, n):
        b = boxes
        out = None
        for _ in range(n):
            out = fn(b)
            b = boxes + 0.0 * out[0, 0, 0, 0].astype(jnp.float32)
        return out

    # standalone interleaved
    times = {k: [] for k in samplers}
    for rep in range(args.reps):
        for k in samplers:
            t0 = time.perf_counter()
            out = chain(jits[k], args.frames)
            float(out[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / args.frames * 1e3
            times[k].append(dt)
            print(f"rep {rep} sampler {k:7s}: {dt:6.2f} ms", flush=True)

    # e2e pose step: matmul vs pallas sampler, fused block backbone
    cfg = get_model_config("coco", "b")
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    if args.dtype == "int8":
        from easy_vitpose_tpu.models.quant import quantize_vit_params
        params = quantize_vit_params(params, jnp.bfloat16)
        e2e_block = "pallas_q8"
    else:
        params = cast_params(params, jnp.bfloat16)
        e2e_block = "pallas"

    def pose_chain(n, sampler):
        b = boxes
        out = None
        for _ in range(n):
            out = pose_step_jit(params, frame, b, mask, cfg,
                                compute_dtype=jnp.bfloat16, sampler=sampler,
                                block_impl=e2e_block)
            b = boxes + 0.0 * out[0, 0, 0]
        return out

    e2e = {"matmul": [], "pallas": []}
    for rep in range(args.reps):
        for k in e2e:
            t0 = time.perf_counter()
            out = pose_chain(args.frames, k)
            float(out[0, 0, 0])
            dt = (time.perf_counter() - t0) / args.frames * 1e3
            e2e[k].append(dt)
            print(f"rep {rep} e2e {k:7s}: {dt:6.2f} ms/frame", flush=True)

    result = {
        "dtype": args.dtype,
        "standalone_ms": {k: round(float(np.median(v)), 2)
                          for k, v in times.items()},
        "e2e_ms": {k: round(float(np.median(v)), 2) for k, v in e2e.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
