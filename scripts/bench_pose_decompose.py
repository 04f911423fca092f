"""Decompose the int8 serving pose step's time (VERDICT r4 item 8).

The r2 decomposition of the bf16 step (PERF.md "Step breakdown") predates
the int8 serving default; this re-measures the cumulative stages at the
SHIPPING config so the non-backbone tail's share is known at dtype=int8:

  sampler     crop_geometry + sample_crops_matmul + normalize
  +backbone   ... + ViT forward (fused int8 Pallas blocks)
  +head       ... + deconv head (phase lowering)
  +decode     ... + UDP decode + un-crop  == the full pose_step

All lanes run interleaved in one process (chained dispatch + single
scalar fetch per rep, best-of-reps), so stage costs are differences of
same-session numbers.

Usage: python scripts/bench_pose_decompose.py [--size b] [--slots 64]
       [--dtype int8|bf16]
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
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import IMAGE_SIZE, get_model_config
    from easy_vitpose_tpu.models.vit import vit_forward
    from easy_vitpose_tpu.models.head import head_forward
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params)
    from easy_vitpose_tpu.ops import decode
    from easy_vitpose_tpu.ops.preprocess import (crop_geometry,
                                                 normalize_crops,
                                                 sample_crops_matmul)
    from easy_vitpose_tpu.pipeline.pose_step import (default_block_impl,
                                                     pose_step)

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)
    quant = args.dtype == "int8"
    dtype = jnp.bfloat16
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    if quant:
        from easy_vitpose_tpu.models.quant import quantize_vit_params
        params = quantize_vit_params(params, dtype)
    else:
        params = cast_params(params, dtype)
    block_impl = default_block_impl(compute_dtype=dtype)
    if quant:
        block_impl = "pallas_q8" if block_impl == "pallas" else "xla_q8"

    H, W, M = args.height, args.width, args.slots
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    bw, bh = min(400, W // 2), min(600, H // 2)
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, W - bw, M), rng.uniform(0, H - bh, M),
        rng.uniform(bw, W, M), rng.uniform(bh, H, M)], -1)
        .astype(np.float32))
    mask = jnp.ones((M,), bool)

    # cumulative stages — each a separately jitted program over the same
    # inputs, mirroring pose_step's exact dataflow (pipeline/pose_step.py)
    @jax.jit
    def s_sampler(boxes):
        geo = crop_geometry(boxes, frame.shape[-3:-1])
        crops = sample_crops_matmul(frame, geo, IMAGE_SIZE,
                                    sample_dtype=dtype)
        return normalize_crops(crops, dtype=dtype)

    @jax.jit
    def s_backbone(boxes):
        x = s_sampler.__wrapped__(boxes)
        return vit_forward(params["backbone"], x, cfg.backbone,
                           block_impl=block_impl)

    @jax.jit
    def s_head(boxes):
        feats = s_backbone.__wrapped__(boxes)
        heat, _ = head_forward(params["head"], feats, cfg.head,
                               train=False, deconv_impl="phase")
        return jnp.transpose(heat, (0, 3, 1, 2)).astype(jnp.float32)

    @jax.jit
    def s_full(boxes):
        return pose_step(params, frame, boxes, mask, cfg,
                         compute_dtype=dtype, sampler="matmul",
                         block_impl=block_impl)

    lanes = {"sampler": s_sampler, "backbone": s_backbone,
             "head": s_head, "full": s_full}

    def time_chain(fn, n, reps):
        fn(boxes)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            b = boxes
            out = None
            for _ in range(n):
                out = fn(b)
                b = boxes + 0.0 * out.reshape(-1)[0].astype(jnp.float32)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best / n * 1e3

    results = {}
    for name, fn in lanes.items():
        results[name] = round(time_chain(fn, args.iters, args.reps), 3)
        print(f"{name:9s} {results[name]:7.3f} ms (cumulative)", flush=True)

    stages = {
        "sampler_ms": results["sampler"],
        "backbone_ms": round(results["backbone"] - results["sampler"], 3),
        "head_ms": round(results["head"] - results["backbone"], 3),
        "decode_ms": round(results["full"] - results["head"], 3),
        "full_ms": results["full"],
    }
    print(json.dumps({"size": args.size, "slots": M, "dtype": args.dtype,
                      **stages}))


if __name__ == "__main__":
    main()
