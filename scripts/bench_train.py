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
    ap.add_argument("--ab", action="store_true",
                    help="interleave reps with the XLA-block step in the "
                         "same process (trustworthy speedup on the "
                         "drifting tunnel)")
    ap.add_argument("--ab-remat", action="store_true",
                    help="remat the XLA baseline only (L/H fit)")
    ap.add_argument("--ab-wide", action="store_true",
                    help="interleave the saved-operand wide-MLP backward "
                         "(default) against the recompute flavor "
                         "(EVT_TRAIN_WIDE=recompute) in one process")
    ap.add_argument("--ab-attn", action="store_true",
                    help="interleave the saved-qkv attention backward "
                         "(opt-in; lost the r3 A/B) against the default "
                         "recompute flavor (EVT_TRAIN_ATTN)")
    ap.add_argument("--ab-mlp", action="store_true",
                    help="interleave the saved-m MLP backward (default "
                         "<= ViT-L) against the recompute flavor "
                         "(EVT_TRAIN_MLP=recompute)")
    ap.add_argument("--fused-opt", action="store_true",
                    help="single-pass fused clip+Adam "
                         "(train/fused_opt.py; EVT_FUSED_OPT=pallas for "
                         "the per-leaf kernel flavor)")
    ap.add_argument("--ab-opt", action="store_true",
                    help="interleave fused-opt (A) against the optax "
                         "chain (B) in one process")
    ap.add_argument("--ab-inbwd", action="store_true",
                    help="interleave the in-backward-norm manual-VJP step "
                         "(train/fast_step.py, A) against the custom-VJP "
                         "fused step with the same fused Adam (B) — the "
                         "delta is the trailing global-norm reduce alone")
    ap.add_argument("--ab-moments", default=None, choices=["bf16", "int8"],
                    help="interleave quantized-moment fused Adam (A) "
                         "against f32-moment fused Adam (B): the step-time "
                         "cost of the 8-bit-optimizer memory cut")
    ap.add_argument("--moments", default="f32",
                    choices=["f32", "bf16", "int8"],
                    help="single-sided moment dtype (implies fused-opt): "
                         "for HBM-headroom probes where the A/B's double "
                         "state would itself OOM")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for the train state (0=off) — measures "
                         "the shadow-weight HBM-pass overhead")
    ap.add_argument("--ab-input", action="store_true",
                    help="A/B the device-input raw batch (uint8 crops + "
                         "joint coords, normalize + Gaussian targets "
                         "rendered in-step) vs the same batch pre-rendered "
                         "on the host — measures the in-jit render cost")
    ap.add_argument("--grad-check", action="store_true",
                    help="before timing, check fused-block grads vs the "
                         "XLA block ON THIS BACKEND (catches TPU-only "
                         "pipelining bugs the CPU interpret tests cannot)")
    args = ap.parse_args()
    if args.ema and any((args.ab, args.ab_wide, args.ab_attn, args.ab_mlp,
                         args.ab_opt, args.ab_input, args.ab_moments,
                         args.ab_inbwd)):
        # the B step is built without ema_decay — the pair would confound
        # block/flavor deltas with the EMA pass
        ap.error("--ema cannot be combined with --ab* modes")

    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.train.step import (init_train_state,
                                             make_optimizer, make_train_step)

    print("devices:", jax.devices(), flush=True)
    cfg = get_model_config("coco", args.size)

    if args.grad_check:
        # On-device fused-vs-XLA block grad parity at this size's real
        # embed_dim (D>768 exercises the chunked two-kernel MLP backward,
        # whose output-block revisit pattern only real pipelining or the
        # TPU interpreter can falsify).
        from easy_vitpose_tpu.models.fused_block_train import (
            make_fused_block_train)
        from easy_vitpose_tpu.models.vit import block, init_vit_params
        bcfg = cfg.backbone
        vp = init_vit_params(jax.random.PRNGKey(2), bcfg)
        layer = jax.tree.map(lambda a: a[0], vp["blocks"])
        # f32 numerics check at batch 6 (the G=8 MLP tile cannot run f32
        # within 128M VMEM — production is bf16 — so this batch falls
        # back to G=2; the PRODUCTION G=8 tile is validated separately
        # below with a bf16 G8-vs-G2 same-kernel comparison)
        xb = jax.random.normal(jax.random.PRNGKey(3),
                               (6, bcfg.num_tokens, bcfg.embed_dim),
                               jnp.float32) * 0.5
        dp = jnp.ones((6,), jnp.float32)
        fused = make_fused_block_train(bcfg)

        def loss(fn, xx, pp):
            out = fn(xx, pp)
            w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)
                        ).reshape(out.shape)
            return jnp.sum(out * w)

        ga = jax.jit(jax.grad(lambda xx, pp: loss(
            lambda x_, p_: block(x_, p_, bcfg.num_heads,
                                 bcfg.layer_norm_eps,
                                 drop_path_keep=dp[:, None, None]),
            xx, pp), argnums=(0, 1)))(xb, layer)
        gb = jax.jit(jax.grad(lambda xx, pp: loss(
            lambda x_, p_: fused(x_, p_, dp), xx, pp),
            argnums=(0, 1)))(xb, layer)
        # Threshold: the XLA baseline's f32 matmuls run at the TPU's
        # DEFAULT precision (bf16-pass decomposition) while the Pallas
        # kernel's dots accumulate differently — measured noise floor is
        # ~7e-4 on input grads and up to ~1e-2 on bias grads (large
        # near-cancelling row sums).  The bug class this check exists for
        # (undefined output-block revisits) produces order-1 garbage /
        # NaN, so gate at 2e-2 and rely on the printed per-leaf table
        # for anything subtler.
        worst = 0.0
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(ga),
                jax.tree_util.tree_leaves(gb)):
            s = float(jnp.max(jnp.abs(a))) + 1e-9
            rel = float(jnp.max(jnp.abs(a - b))) / s
            worst = max(worst, rel)
            print(f"  grad {jax.tree_util.keystr(path)}: rel={rel:.2e}",
                  flush=True)
            if rel > 2e-2 or not np.isfinite(rel):
                raise SystemExit(
                    f"FUSED GRAD MISMATCH {jax.tree_util.keystr(path)}: "
                    f"rel={rel:.2e}")
        print(f"grad-check OK (worst rel err {worst:.2e})", flush=True)

        # --- production-tile pipelining check: SAME kernel, SAME bf16
        # math, G=8 vs G=2 MLP-backward tile.  Isolates exactly the
        # output-block revisit/pipelining dimension: corruption is
        # order-1; accumulation-order noise is ~1e-3 in bf16.
        xb16 = (jax.random.normal(jax.random.PRNGKey(4),
                                  (16, bcfg.num_tokens, bcfg.embed_dim))
                * 0.5).astype(jnp.bfloat16)
        dp16 = jnp.ones((16,), jnp.float32)
        lb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), layer)

        def tile_grads(tile):
            os.environ["EVT_TRAIN_TILE_MLP"] = tile
            f = make_fused_block_train(bcfg)
            # fresh lambda per tile -> separate jit cache entries traced
            # under the env value
            g = jax.jit(jax.grad(
                lambda xx, pp: jnp.sum(
                    (f(xx, pp, dp16).astype(jnp.float32)) ** 2),
                argnums=(0, 1)))(xb16, lb)
            os.environ.pop("EVT_TRAIN_TILE_MLP", None)
            return jax.tree.map(np.asarray, g)

        g8 = tile_grads("8")
        g2 = tile_grads("2")
        worst_t = 0.0
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g2),
                                jax.tree_util.tree_leaves(g8)):
            s = float(np.abs(a).max()) + 1e-9
            rel = float(np.abs(a.astype(np.float32)
                               - b.astype(np.float32)).max()) / s
            worst_t = max(worst_t, rel)
            if rel > 2e-2 or not np.isfinite(rel):
                raise SystemExit(
                    f"G8-vs-G2 TILE MISMATCH "
                    f"{jax.tree_util.keystr(path)}: rel={rel:.2e}")
        print(f"tile-check OK (G8 vs G2 worst rel err {worst_t:.2e})",
              flush=True)

        if bcfg.embed_dim > 768:
            # wide path: saved-operand vs recompute flavor, same bf16
            # math — the operands the saved dw kernel consumes are the
            # values the recompute kernel re-derives, so only matmul
            # accumulation order separates them (~1e-3 bf16); pipelining
            # corruption is order-1.
            def wide_grads(mode):
                os.environ["EVT_TRAIN_WIDE"] = mode
                f = make_fused_block_train(bcfg)
                g = jax.jit(jax.grad(
                    lambda xx, pp: jnp.sum(
                        (f(xx, pp, dp16).astype(jnp.float32)) ** 2),
                    argnums=(0, 1)))(xb16, lb)
                os.environ.pop("EVT_TRAIN_WIDE", None)
                return jax.tree.map(np.asarray, g)

            gs = wide_grads("saved")
            gr = wide_grads("recompute")
            worst_w = 0.0
            for (path, a), b in zip(
                    jax.tree_util.tree_leaves_with_path(gr),
                    jax.tree_util.tree_leaves(gs)):
                s = float(np.abs(a).max()) + 1e-9
                rel = float(np.abs(a.astype(np.float32)
                                   - b.astype(np.float32)).max()) / s
                worst_w = max(worst_w, rel)
                if rel > 2e-2 or not np.isfinite(rel):
                    raise SystemExit(
                        f"SAVED-vs-RECOMPUTE WIDE MISMATCH "
                        f"{jax.tree_util.keystr(path)}: rel={rel:.2e}")
            print(f"wide-check OK (saved vs recompute worst rel err "
                  f"{worst_w:.2e})", flush=True)

    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    # host snapshot: the fused step donates its state, whose params alias
    # these buffers (init_train_state does not copy) — the --ab baseline
    # must be able to re-init from them AFTER the first donating step
    params = jax.tree.map(np.asarray, params)
    if args.ab_attn:
        # force the A step onto the saved flavor even where the default
        # is recompute (ViT-H), so the A/B actually compares flavors
        os.environ["EVT_TRAIN_ATTN"] = "saved"
    if args.ab_mlp:
        os.environ["EVT_TRAIN_MLP"] = "saved"
    if (args.fused_opt or args.ab_opt or args.ab_moments or args.ab_inbwd
            or args.moments != "f32"):
        from easy_vitpose_tpu.train.fused_opt import make_fused_adam
        tx = make_fused_adam(5e-4,
                             moment_dtype=args.ab_moments or args.moments)
    else:
        tx = make_optimizer(5e-4)
    state = init_train_state(params, tx, ema_decay=args.ema)
    if args.ab_inbwd:
        if args.fp32 or args.remat:
            ap.error("--ab-inbwd is AMP-bf16 fused-block only")
        from easy_vitpose_tpu.train.fast_step import make_train_step_inbwd
        step = jax.jit(make_train_step_inbwd(cfg, tx, ema_decay=args.ema),
                       donate_argnums=(0,))
    else:
        step = jax.jit(make_train_step(cfg, tx, use_amp=not args.fp32,
                                       remat=args.remat, ema_decay=args.ema,
                                       block_impl="pallas_train" if args.fused
                                       else "xla"),
                       donate_argnums=(0,))

    B, K = args.batch, cfg.head.num_keypoints
    rng = np.random.default_rng(0)
    if args.ab_input:
        # raw (device-input) batch and its exact host-rendered twin — same
        # work for both steps, so the delta is the in-jit render alone
        from easy_vitpose_tpu.train.step import render_batch_on_device
        batch_raw = {
            "images_u8": jnp.asarray(rng.integers(
                0, 256, (B, 256, 192, 3)).astype(np.uint8)),
            "joints": jnp.asarray(
                (rng.uniform(0, 1, (B, K, 2))
                 * np.array([192, 256])).astype(np.float32)),
            "joints_vis": jnp.asarray(np.ones((B, K, 2), np.float32)),
        }
        batch = jax.tree.map(jnp.asarray, jax.device_get(
            jax.jit(render_batch_on_device)(batch_raw)))
        batch_a = batch_raw
    else:
        batch = {
            "images": jnp.asarray(rng.normal(0, 1, (B, 256, 192, 3))
                                  .astype(np.float32)),
            "targets": jnp.asarray(rng.uniform(0, 1, (B, K, 64, 48))
                                   .astype(np.float32)),
            "target_weights": jnp.asarray(np.ones((B, K, 1), np.float32)),
        }
        batch_a = batch
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, metrics = step(state, batch_a, key)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.5f}", flush=True)

    step_b = None
    if args.ab:
        # interleaved A/B vs the XLA block within ONE process — the only
        # timing comparison the drifting tunnel makes trustworthy
        step_b = jax.jit(make_train_step(cfg, tx, use_amp=not args.fp32,
                                         remat=args.remat or args.ab_remat,
                                         block_impl="xla"),
                         donate_argnums=())
        state_b = init_train_state(params, tx)  # params are host numpy
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        print("xla baseline compiled", flush=True)
    elif args.ab_wide:
        # same fused step, recompute-flavor wide-MLP backward: env read
        # at trace time, so set it around this step's first (tracing)
        # call only — the main step above already traced under 'saved'
        os.environ["EVT_TRAIN_WIDE"] = "recompute"
        step_b = jax.jit(make_train_step(cfg, tx, use_amp=not args.fp32,
                                         remat=args.remat,
                                         block_impl="pallas_train"),
                         donate_argnums=())
        state_b = init_train_state(params, tx)
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        os.environ.pop("EVT_TRAIN_WIDE", None)
        print("recompute-flavor baseline compiled", flush=True)
    elif args.ab_attn:
        os.environ["EVT_TRAIN_ATTN"] = "recompute"
        step_b = jax.jit(make_train_step(cfg, tx, use_amp=not args.fp32,
                                         remat=args.remat,
                                         block_impl="pallas_train"),
                         donate_argnums=())
        state_b = init_train_state(params, tx)
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        os.environ.pop("EVT_TRAIN_ATTN", None)
        print("recompute-attn baseline compiled", flush=True)
    elif args.ab_mlp:
        os.environ["EVT_TRAIN_MLP"] = "recompute"
        step_b = jax.jit(make_train_step(cfg, tx, use_amp=not args.fp32,
                                         remat=args.remat,
                                         block_impl="pallas_train"),
                         donate_argnums=())
        state_b = init_train_state(params, tx)
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        os.environ.pop("EVT_TRAIN_MLP", None)
        print("recompute-mlp baseline compiled", flush=True)
    elif args.ab_input:
        # same step config; B consumes the pre-rendered batch (the jit
        # specializes per batch structure, so this is a second cache entry)
        step_b = jax.jit(make_train_step(cfg, tx, use_amp=not args.fp32,
                                         remat=args.remat,
                                         block_impl="pallas_train"
                                         if args.fused else "xla"),
                         donate_argnums=())
        state_b = init_train_state(params, tx)
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        print("host-rendered baseline compiled", flush=True)
    elif args.ab_moments:
        # quantized-moment fused Adam (A) vs f32-moment fused Adam (B)
        tx_b = make_fused_adam(5e-4)
        step_b = jax.jit(make_train_step(cfg, tx_b, use_amp=not args.fp32,
                                         remat=args.remat,
                                         block_impl="pallas_train"
                                         if args.fused else "xla"),
                         donate_argnums=())
        state_b = init_train_state(params, tx_b)
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        print("f32-moment baseline compiled", flush=True)
    elif args.ab_opt:
        # fused-opt step (A, already built above) vs the optax chain (B)
        tx_b = make_optimizer(5e-4)
        step_b = jax.jit(make_train_step(cfg, tx_b, use_amp=not args.fp32,
                                         remat=args.remat,
                                         block_impl="pallas_train"
                                         if args.fused else "xla"),
                         donate_argnums=())
        state_b = init_train_state(params, tx_b)
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        print("optax-chain baseline compiled", flush=True)
    elif args.ab_inbwd:
        # same fused Adam, but grads via jax.grad over the custom-VJP
        # blocks + the trailing full-gradient norm reduce
        step_b = jax.jit(make_train_step(cfg, tx, use_amp=True,
                                         block_impl="pallas_train"),
                         donate_argnums=())
        state_b = init_train_state(params, tx)
        sb, mb = step_b(state_b, batch, key)
        jax.block_until_ready(sb)
        print("custom-VJP baseline compiled", flush=True)

    times, times_b = [], []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch_a, key)
        float(metrics["loss"])  # single fetch = hard sync
        dt = (time.perf_counter() - t0) / args.steps
        times.append(dt * 1e3)
        line = f"rep {rep}: {dt * 1e3:7.2f} ms/step ({B / dt:7.0f} imgs/s)"
        if step_b is not None:
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state_b, mb = step_b(state_b, batch, key)
            float(mb["loss"])
            dtb = (time.perf_counter() - t0) / args.steps
            times_b.append(dtb * 1e3)
            blabel = ("recompute" if args.ab_wide or args.ab_attn
                      or args.ab_mlp
                      else "f32mom" if args.ab_moments
                      else "optax" if args.ab_opt
                      else "customvjp" if args.ab_inbwd
                      else "rendered" if args.ab_input else "xla")
            line += f"  | {blabel} {dtb * 1e3:7.2f} ms"
        print(line, flush=True)

    med = float(np.median(times))
    result = {
        "size": args.size, "batch": B,
        "amp": not args.fp32, "remat": args.remat, "fused": args.fused,
        "ms_per_step": round(med, 2),
        "imgs_per_s": round(B / (med / 1e3), 1),
    }
    if times_b:
        medb = float(np.median(times_b))
        bkey = ("recompute" if args.ab_wide or args.ab_attn
                or args.ab_mlp
                else "f32mom" if args.ab_moments
                else "optax" if args.ab_opt
                else "customvjp" if args.ab_inbwd
                else "rendered" if args.ab_input else "xla")
        result[f"{bkey}_ms_per_step"] = round(medb, 2)
        result[f"speedup_vs_{bkey}"] = round(medb / med, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
