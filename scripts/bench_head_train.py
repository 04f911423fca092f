"""TPU decomposition of the TRAINING head cost (VERDICT r3 weak-4 / next-5).

bench_train_decompose.py reports head fwd+bwd ~5.1 ms at ViT-B/64 (7% of
the step).  Before fusing anything, split that 5.1 ms into its parts —
conv MACs, BN batch statistics, loss — and compare the deconv lowerings
in TRAINING mode (the phase decomposition was only A/B'd for serving):

  * full        grad wrt (head params, feats), BN train stats, MSE loss
                — the real in-step cost
  * featsgrad   grad wrt feats only (what bench_train_decompose times)
  * bn_frozen   full, but BN in inference mode (affine fold): isolates
                the batch-statistics reductions + their backward
  * fwd_only    forward with train-mode BN, no backward
  * dilated     full, with the lhs-dilated convT lowering (the r4 train
                default)
  * packed      full, with the 3x3-packed phase lowering (r5: 9/4 the
                minimal MACs vs 4x for dilated, scatter-free VJP —
                models/head.py::conv_transpose_s2_packed)

All interleaved in one process (chained dispatch + single scalar fetch).
Usage: python scripts/bench_head_train.py [--size b] [--batch 64]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.head import head_forward
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params)
    from easy_vitpose_tpu.train.losses import joints_mse_loss

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)
    B, D = args.batch, cfg.backbone.embed_dim
    K = cfg.head.num_keypoints
    Hp, Wp = cfg.backbone.patch_shape

    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    head_p = cast_params(params["head"], jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, Hp, Wp, D)), jnp.bfloat16)
    targets = jnp.asarray(rng.uniform(0, 1, (B, K, 64, 48)), jnp.float32)
    tw = jnp.ones((B, K, 1), jnp.float32)

    def loss_of(hp, f, *, train, impl):
        heat, _ = head_forward(hp, f, cfg.head, train=train,
                               deconv_impl=impl)
        return joints_mse_loss(
            jnp.transpose(heat, (0, 3, 1, 2)).astype(jnp.float32),
            targets, tw)

    def full(impl="phase", train=True):
        @jax.jit
        def run(f):
            (_, gf) = jax.grad(
                lambda hp, ff: loss_of(hp, ff, train=train, impl=impl),
                argnums=(0, 1))(head_p, f)
            return gf
        return run

    @jax.jit
    def featsgrad(f):
        return jax.grad(
            lambda ff: loss_of(head_p, ff, train=True, impl="phase"))(f)

    @jax.jit
    def fwd_only(f):
        heat, _ = head_forward(head_p, f, cfg.head, train=True,
                               deconv_impl="phase")
        return heat

    fns = {
        "full": full(),
        "featsgrad": featsgrad,
        "bn_frozen": full(train=False),
        "fwd_only": fwd_only,
        "dilated": full(impl="dilated"),
        "packed": full(impl="packed"),
    }

    def time_chain(fn, n, reps):
        fn(feats)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            f = feats
            out = None
            for _ in range(n):
                out = fn(f)
                f = feats + 0.0 * out.reshape(-1)[0].astype(feats.dtype)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best / n * 1e3

    results = {}
    for name, fn in fns.items():
        results[name] = round(time_chain(fn, args.iters, args.reps), 3)
        print(f"{name:10s} {results[name]:7.3f} ms", flush=True)
    print(json.dumps({"size": args.size, "batch": B, **results}))


if __name__ == "__main__":
    main()
