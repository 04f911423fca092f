"""TPU train-step throughput: ViTPose finetune images/s on one chip.

The reference publishes no training numbers (SURVEY.md §6); this records
ours.  Times the full jitted train step (bf16 AMP forward, f32 grads/Adam,
BN update, grad clip) with the dependency-chain + single-fetch method.

Usage: python scripts/bench_train.py [--size b] [--batch 64] [--remat]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10,
                    help="chained steps per timed rep")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="custom-VJP fused Pallas train block")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.train.step import (init_train_state,
                                             make_optimizer, make_train_step)

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(5e-4)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, tx, use_amp=not args.fp32,
                                   remat=args.remat,
                                   block_impl="pallas_train" if args.fused
                                   else "xla"),
                   donate_argnums=(0,))

    B, K = args.batch, cfg.head.num_keypoints
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (B, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (B, K, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.asarray(np.ones((B, K, 1), np.float32)),
    }
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.5f}", flush=True)

    times = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch, key)
        float(metrics["loss"])  # single fetch = hard sync
        dt = (time.perf_counter() - t0) / args.steps
        times.append(dt * 1e3)
        print(f"rep {rep}: {dt * 1e3:7.2f} ms/step ({B / dt:7.0f} imgs/s)",
              flush=True)

    med = float(np.median(times))
    # fwd 12*D^2/token matmul FLOPs + attn; bwd ~2x fwd
    result = {
        "size": args.size, "batch": B,
        "amp": not args.fp32, "remat": args.remat, "fused": args.fused,
        "ms_per_step": round(med, 2),
        "imgs_per_s": round(B / (med / 1e3), 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
