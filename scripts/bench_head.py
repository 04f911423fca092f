"""Interleaved A/B: deconv head 'dilated' (lhs-dilated convT) vs 'phase'
(sub-pixel decomposition, models/head.py::conv_transpose_s2_phase).

Two measurements, both chained-dispatch + single-fetch (see bench.py):
  * head-only: head_forward on (B, 16, 12, D) features;
  * e2e forward: vitpose_forward (fused-block backbone + head) on crops.

Usage: python scripts/bench_head.py [--size b] [--batch 64] [--reps 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="b", choices=["s", "b", "l", "h"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--block-impl", default=None,
                    help="default: pallas on TPU else xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.head import head_forward
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params,
                                                 vitpose_forward)
    from easy_vitpose_tpu.pipeline.pose_step import default_block_impl

    cfg = get_model_config("coco", args.size)
    params = cast_params(init_vitpose_params(jax.random.PRNGKey(0), cfg),
                         jnp.bfloat16)
    block_impl = args.block_impl or default_block_impl(
        compute_dtype=jnp.bfloat16)
    B, D = args.batch, cfg.backbone.embed_dim
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, 16, 12, D)), jnp.bfloat16)
    crops = jnp.asarray(rng.normal(size=(B, 256, 192, 3)), jnp.bfloat16)

    def time_chain(fn, x0, n, reps):
        fn(x0)  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            x = x0
            out = None
            for _ in range(n):
                out = fn(x)
                x = x0 + 0.0 * out.reshape(-1)[0].astype(x0.dtype)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best / n * 1e3

    fns = {}
    for impl in ("dilated", "phase"):
        fns[f"head:{impl}"] = jax.jit(
            lambda x, impl=impl: head_forward(
                params["head"], x, cfg.head, deconv_impl=impl)[0])
        fns[f"e2e:{impl}"] = jax.jit(
            lambda x, impl=impl: vitpose_forward(
                params, x, cfg, block_impl=block_impl, deconv_impl=impl))

    # interleave A/B inside one process (tunnel drift makes cross-process
    # comparisons meaningless)
    results = {}
    for name, fn in fns.items():
        x0 = feats if name.startswith("head") else crops
        results[name] = time_chain(fn, x0, args.iters, args.reps)
    for name, ms in results.items():
        print(f"{name:14s} {ms:7.3f} ms")
    for kind in ("head", "e2e"):
        d, p = results[f"{kind}:dilated"], results[f"{kind}:phase"]
        print(f"{kind}: dilated {d:.3f} -> phase {p:.3f} ms  "
              f"({d / p:.3f}x)")


if __name__ == "__main__":
    main()
