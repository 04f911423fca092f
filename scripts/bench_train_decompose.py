"""Decompose the fused-VJP train step's time (VERDICT r2 weak-5).

Times each component of the training step in isolation on the TPU
(dependency-chained dispatch + single fetch, like bench.py):

  * fwd blocks      - fused forward kernel x depth (scan, like the step)
  * bwd-mlp blocks  - MLP backward kernel(s) x depth
  * bwd-attn blocks - attention backward kernel x depth
  * full bwd blocks - both backward kernels chained x depth
  * full step       - the real jitted train step (reference point)
  * outside blocks  - full step minus fwd/bwd blocks (embed, head fwd+bwd,
                      loss, optimizer, BN, scheduling overhead)

Usage: python scripts/bench_train_decompose.py [--size b] [--batch 64]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time_ms(run_once, sync, steps=10, reps=5):
    """Median ms per call. run_once(carry) -> carry chains device work."""
    times = []
    for _ in range(reps):
        c = None
        t0 = time.perf_counter()
        for _ in range(steps):
            c = run_once(c)
        sync(c)
        times.append((time.perf_counter() - t0) / steps * 1e3)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="b", choices=["s", "b", "l", "h"])
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models import fused_block_train as fbt
    from easy_vitpose_tpu.models.vit import init_vit_params
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.train.step import (init_train_state, make_optimizer,
                                             make_train_step)

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)
    bcfg = cfg.backbone
    B, N, D = args.batch, bcfg.num_tokens, bcfg.embed_dim
    depth = bcfg.depth
    dt = jnp.bfloat16
    G = min(fbt._tile(D), B)

    vp = init_vit_params(jax.random.PRNGKey(0), bcfg)
    blocks = jax.tree.map(lambda a: a.astype(dt), vp["blocks"])
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), dt)
    dp2 = jnp.ones((B, 1), jnp.float32)
    dp = jnp.ones((B,), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(2), (B, N, D), dt)

    def scanned(body):
        @jax.jit
        def run(c):
            out, _ = jax.lax.scan(body, c, blocks)
            return out
        return run

    fwd = scanned(lambda c, layer: (
        fbt._fused_train_fwd_impl(c, dp, layer, bcfg, False)[0], None))
    Gm = fbt._tile_mlp_bwd(D)
    if B % Gm:
        Gm = G
    bwd_mlp = scanned(lambda c, layer: (
        fbt._mlp_backward_padded(x, c, dp2, layer, bcfg, Gm, False)[0], None))
    bwd_attn = scanned(lambda c, layer: (
        fbt._attn_backward_padded(x, c, dp2, layer, bcfg, G, False)[0], None))
    bwd_full = scanned(lambda c, layer: (
        fbt._fused_train_bwd_impl(x, x, c, dp, layer, bcfg, False)[0], None))

    def bench(fn, seed_val):
        out = jax.block_until_ready(fn(seed_val))  # compile
        del out
        return _time_ms(
            lambda c: fn(seed_val if c is None else c),
            lambda c: float(jnp.sum(
                jax.tree.leaves(c)[0].astype(jnp.float32))))

    t_fwd = bench(fwd, x)
    t_mlp = bench(bwd_mlp, dout)
    t_attn = bench(bwd_attn, dout)
    t_bwd = bench(bwd_full, dout)

    # ---- outside-blocks components ----
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(5e-4)
    state = init_train_state(params, tx)

    from easy_vitpose_tpu.models.head import head_forward
    from easy_vitpose_tpu.models.vitpose import cast_params
    from easy_vitpose_tpu.train.losses import joints_mse_loss

    K = cfg.head.num_keypoints
    head_p = cast_params(params["head"], jnp.bfloat16)
    Hp, Wp = bcfg.patch_shape
    feats = jax.random.normal(jax.random.PRNGKey(4), (B, Hp, Wp, D), dt)
    targets = jnp.asarray(np.random.default_rng(1)
                          .uniform(0, 1, (B, K, 64, 48)).astype(np.float32))
    tw = jnp.ones((B, K, 1), jnp.float32)

    @jax.jit
    def head_fwd_bwd(feats):
        def loss_fn(f):
            heat, _ = head_forward(head_p, f, cfg.head, train=True)
            return joints_mse_loss(jnp.transpose(heat, (0, 3, 1, 2))
                                   .astype(jnp.float32), targets, tw)
        _, g = jax.value_and_grad(loss_fn)(feats)
        return g

    t_head = bench(head_fwd_bwd, feats)

    grads = jax.tree.map(jnp.ones_like, state["params"])

    @jax.jit
    def opt_update(params_in):
        upd, _ = tx.update(grads, state["opt_state"], params_in)
        import optax
        return optax.apply_updates(params_in, upd)

    t_opt = bench(opt_update, state["params"])

    # ---- the real full train step ----
    step = jax.jit(make_train_step(cfg, tx, use_amp=True,
                                   block_impl="pallas_train"),
                   donate_argnums=())
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (B, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (B, K, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.ones((B, K, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(3)
    s0, _ = step(state, batch, key)
    jax.block_until_ready(s0)

    times = []
    for _ in range(5):
        s = state
        t0 = time.perf_counter()
        for _ in range(10):
            s, m = step(s, batch, key)
        float(m["loss"])
        times.append((time.perf_counter() - t0) / 10 * 1e3)
    t_step = float(np.median(times))

    result = {
        "size": args.size, "batch": B, "depth": depth, "G": G, "G_mlp": Gm,
        "full_step_ms": round(t_step, 2),
        "fwd_blocks_ms": round(t_fwd, 2),
        "bwd_mlp_blocks_ms": round(t_mlp, 2),
        "bwd_attn_blocks_ms": round(t_attn, 2),
        "bwd_blocks_ms": round(t_bwd, 2),
        "head_fwd_bwd_ms": round(t_head, 2),
        "optimizer_ms": round(t_opt, 2),
        "outside_blocks_ms": round(t_step - t_fwd - t_bwd, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
