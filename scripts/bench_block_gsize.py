"""TPU sweep: fused-block crops_per_step (G) — VMEM tile size vs step time.

Backbone-only timing (12 ViT-B layers over (64, 192, 768) bf16 tokens) so
the sampler/head don't mask the delta.

Usage: python scripts/bench_block_gsize.py [--reps 3]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", default="b", choices=["s", "b", "l", "h"])
    ap.add_argument("--q8", action="store_true",
                    help="sweep the int8 fused block instead of bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.fused_block import fused_block
    from easy_vitpose_tpu.models.vit import init_vit_params

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size).backbone
    params_f32 = init_vit_params(jax.random.PRNGKey(0), cfg)
    if args.q8:
        from easy_vitpose_tpu.models.quant import (fused_block_q8,
                                                   quantize_vit_params)
        params = quantize_vit_params(
            {"backbone": params_f32})["backbone"]
        blk = fused_block_q8
    else:
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                              params_f32)
        blk = fused_block
    del params_f32
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (64, 192, cfg.embed_dim), jnp.bfloat16)

    def backbone(tokens, g):
        def body(carry, layer):
            return blk(carry, layer, cfg, crops_per_step=g), None
        out, _ = jax.lax.scan(body, tokens, params["blocks"])
        return out

    jits = {g: jax.jit(lambda t, g=g: backbone(t, g)) for g in (2, 4, 8, 16)}
    for g, f in jits.items():
        f(x)  # compile

    med = {}
    times = {g: [] for g in jits}
    for rep in range(args.reps):
        for g, f in jits.items():
            t = x
            t0 = time.perf_counter()
            for _ in range(args.iters):
                t = f(t)
            float(t[0, 0, 0])
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            times[g].append(dt)
            print(f"rep {rep} G={g:2d}: {dt:6.2f} ms/backbone", flush=True)
    med = {g: round(float(np.median(v)), 2) for g, v in times.items()}
    print(json.dumps({"backbone_ms_by_G": med}))


if __name__ == "__main__":
    main()
