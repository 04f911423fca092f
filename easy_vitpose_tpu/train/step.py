"""pjit data-parallel training step.

Replaces the reference's DDP epoch loop internals (reference
vit_utils/train_valid_fn.py:41-166): Adam + grad-clip(1.0) + AMP + gradient
sync.  Here gradient sync is implicit — params carry a replicated sharding,
batches a 'data'-sharded one, and XLA inserts the psum over ICI (no NCCL, no
GradScaler: bf16 on TPU needs no loss scaling).

State layout (a plain dict so orbax can checkpoint it directly):
  params     f32 master weights
  opt_state  optax state
  bn_state   head BatchNorm running stats (f32)
  step       int32
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..configs import ModelConfig
from ..models.vitpose import cast_params, vitpose_forward_train
from ..parallel import mesh as meshlib
from .losses import joints_mse_loss


def make_optimizer(learning_rate: float, max_grad_norm: float = 1.0,
                   freeze_backbone: bool = False) -> optax.GradientTransformation:
    """Adam + global-norm clip (reference train_valid_fn.py:76-79, :130).

    ``freeze_backbone`` reproduces the reference's full-backbone freeze
    (train.py:118-123) by zeroing backbone updates.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
    )
    if freeze_backbone:
        def label(params):
            return {k: ("frozen" if k == "backbone" else "train")
                    for k in params}
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)
    return tx


def layerwise_lr_decay(layer_decay_rate: float, depth: int
                       ) -> optax.GradientTransformation:
    """Per-layer learning-rate decay for the ViT backbone.

    The reference's AdamW recipes use a LayerDecayOptimizerConstructor with
    ``layer_decay_rate`` (reference configs/ViTPose_common.py:2-14) and ship a
    simplistic per-step variant (vit_models/optimizer.py:3-14).  Here: scale
    each block's update by rate^(depth - layer_index) — embeddings get the
    deepest decay, the head none — as a composable optax transform.
    """
    def scale_for_path(path):
        keys = [str(getattr(p, "key", "")) for p in path]
        if keys and keys[0] == "head":
            return 1.0
        if "blocks" in keys:
            return None  # per-layer, handled via the stacked leading axis
        # patch embed / pos embed / final LN: treat as layer 0
        return layer_decay_rate ** depth

    def update_fn(updates, state, params=None):
        del params

        def scale(path, u):
            s = scale_for_path(path)
            if s is not None:
                return u * s
            # stacked block params: leading axis is depth; layer i gets
            # rate^(depth - i)
            scales = layer_decay_rate ** (depth - jnp.arange(1, depth + 1,
                                                             dtype=jnp.float32))
            shape = (depth,) + (1,) * (u.ndim - 1)
            return u * scales.reshape(shape).astype(u.dtype)

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def make_step_lr_schedule(base_lr: float = 5e-4,
                          steps_per_epoch: int = 1,
                          milestones=(170, 200),
                          gamma: float = 0.1,
                          warmup_iters: int = 500,
                          warmup_ratio: float = 1e-3):
    """The reference from-scratch LR policy (train_configs/
    ViTPose_base_coco_256x192.py:24-29): mmcv ``StepLrUpdaterHook`` with
    linear warmup.  Per-iteration LR:

      regular(epoch) = base_lr * gamma^(# milestones passed)   [by epoch]
      it < warmup_iters:
          lr = regular * (1 - (1 - it/warmup_iters) * (1 - warmup_ratio))
      else: lr = regular

    (iter 0 starts at base_lr*warmup_ratio and ramps linearly to regular
    at warmup_iters — mmcv's exact linear-warmup formula).  Returns an
    optax schedule (step count -> lr) to pass as the ``learning_rate`` of
    ``make_adamw_layer_decay_optimizer``.
    """
    ms = jnp.asarray(milestones, jnp.int32)

    def sched(count):
        count = jnp.asarray(count, jnp.int32)
        epoch = count // steps_per_epoch
        n_passed = jnp.sum(epoch >= ms)
        regular = base_lr * gamma ** n_passed.astype(jnp.float32)
        frac = jnp.minimum(count.astype(jnp.float32) / warmup_iters, 1.0)
        return regular * (1.0 - (1.0 - frac) * (1.0 - warmup_ratio))

    return sched


def make_adamw_layer_decay_optimizer(learning_rate=5e-4,
                                     weight_decay: float = 0.1,
                                     layer_decay_rate: float = 0.75,
                                     depth: int = 12,
                                     max_grad_norm: float = 1.0
                                     ) -> optax.GradientTransformation:
    """The reference's from-scratch AdamW recipe (train_configs/
    ViTPose_base_coco_256x192.py:7-31): AdamW(lr=5e-4, wd=0.1) + layer
    decay + grad clip.  Bias/norm/pos-embed get no weight decay
    (common.py:7-12).  ``learning_rate`` may be a float or an optax
    schedule — pass ``make_step_lr_schedule(...)`` for the full recipe
    (linear warmup 500 iters from ratio 1e-3, x0.1 at epochs [170, 200])."""
    def wd_mask(params):
        def visit(path, x):
            keys = [str(getattr(p, "key", "")) for p in path]
            name = keys[-1] if keys else ""
            no_decay = (name.endswith("_b") or "ln" in name
                        or name in ("pos_embed", "patch_b")
                        or name in ("bias", "scale")
                        # hybrid-stem conv biases / LN params
                        or name == "b" or "lns" in keys)
            return not no_decay
        return jax.tree_util.tree_map_with_path(visit, params)

    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, b1=0.9, b2=0.999,
            weight_decay=weight_decay, mask=wd_mask),
        layerwise_lr_decay(layer_decay_rate, depth),
    )


def set_learning_rate(opt_state, lr: float):
    """Host-side LR override — the ReduceLROnPlateau controller
    (train_valid_fn.py:79, :166) lives in the epoch loop and injects here."""
    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return s
    return jax.tree.map(visit, opt_state,
                        is_leaf=lambda s: hasattr(s, "hyperparams"))


def get_learning_rate(opt_state) -> float:
    """Read the realized current LR out of an inject_hyperparams state
    (after an update this is the schedule's last-evaluated value)."""
    found = []

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            found.append(float(s.hyperparams["learning_rate"]))
        return s

    jax.tree.map(visit, opt_state,
                 is_leaf=lambda s: hasattr(s, "hyperparams"))
    return found[0] if found else float("nan")


def init_train_state(params, tx: optax.GradientTransformation,
                     ema_decay: float = 0.0) -> Dict[str, Any]:
    # BN running stats live inside params["head"]["bn_state"]; optimizer
    # must not touch them -> keep them out of the trainable tree.
    trainable, bn_state = split_bn_state(params)
    state = {
        "params": trainable,
        "opt_state": tx.init(trainable),
        "bn_state": bn_state,
        "step": jnp.zeros((), jnp.int32),
    }
    if ema_decay:
        # EMA shadow weights (beyond the reference: its loop keeps none);
        # BN running stats are already their own moving average and are
        # shared between the raw and EMA snapshots
        state["ema_params"] = jax.tree.map(jnp.array, trainable)
    return state


def _ema_update(state, new_params, ema_decay: float):
    """e' = d*e + (1-d)*p' per leaf — one extra HBM pass, only when on."""
    if not ema_decay:
        return {}
    return {"ema_params": jax.tree.map(
        lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
        state["ema_params"], new_params)}


def split_bn_state(params):
    p = dict(params)
    head = dict(p["head"])
    bn_state = head.pop("bn_state")
    p["head"] = head
    return p, bn_state


def merge_bn_state(params, bn_state):
    p = dict(params)
    head = dict(p["head"])
    head["bn_state"] = bn_state
    p["head"] = head
    return p


def render_batch_on_device(batch: Dict[str, Any],
                           render_kwargs: Dict[str, Any] = None
                           ) -> Dict[str, Any]:
    """Expand a raw device-input batch inside jit.

    A raw batch ships ``images_u8`` (B,H,W,3) uint8 + ``joints`` (B,K,2) +
    ``joints_vis`` (B,K,2) instead of normalized f32 images and pre-rendered
    heatmap targets — ~6.5x fewer host->device bytes, and the normalize +
    Gaussian render run on the MXU/VPU instead of the host loader (which is
    the train-throughput bottleneck on few-core hosts; see
    scripts/bench_loader.py).  A batch that already carries ``images`` passes
    through untouched, so every step builder accepts either form.
    Numerics match the host path exactly (tests/test_device_input.py).
    """
    if "images_u8" not in batch:
        return batch
    from ..configs import IMAGENET_MEAN, IMAGENET_STD
    from ..ops.heatmap import generate_gaussian_targets_jnp
    x = batch["images_u8"].astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) \
        / jnp.asarray(IMAGENET_STD, jnp.float32)
    targets, weights = generate_gaussian_targets_jnp(
        batch["joints"], batch["joints_vis"], **(render_kwargs or {}))
    return {"images": x, "targets": targets, "target_weights": weights}


def _batch_rows(batch: Dict[str, Any]) -> int:
    return batch["images_u8" if "images_u8" in batch else "images"].shape[0]


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                    *, use_amp: bool = True, remat: bool = False,
                    loss_fn: Callable = joints_mse_loss,
                    block_impl: str = "xla", ema_decay: float = 0.0,
                    grad_accum: int = 1, render_kwargs: Dict = None):
    """Build the jittable train step.

    Batch: dict(images (B,256,192,3) f32 normalized NHWC,
                targets (B,K,64,48), target_weights (B,K,1)).
    block_impl='pallas_train' runs the backbone blocks through the
    custom-VJP fused Pallas kernels (fast TPU training path; remat is
    implicit — the kernels recompute everything from (x, x1) in VMEM).
    ``grad_accum``=k splits the batch into k sequential micro-batches
    inside the step (``lax.scan``): gradients are averaged in f32 and the
    optimizer updates ONCE, so step counters / LR schedules / EMA / the
    epoch loop all see a single large-batch step.  This is how a
    single-chip run reproduces the reference's from-scratch recipe batch
    (64 samples x 8 GPUs — train_configs/*.py ``data['samples_per_gpu']``
    with 8-GPU launchers) without 8 chips.  BN batch statistics are
    chained through the micro-batches (the running-average update runs k
    times, like the reference's per-GPU batches); drop-path draws are
    per-micro-batch.
    """

    def grad_one(trainable, bn_state, batch, rng):
        def compute_loss(trainable):
            params = merge_bn_state(trainable, bn_state)
            fwd_params = cast_params(params, jnp.bfloat16) if use_amp else params
            x = batch["images"].astype(jnp.bfloat16 if use_amp else jnp.float32)
            heat, new_bn = vitpose_forward_train(fwd_params, x, cfg,
                                                 rng=rng, remat=remat,
                                                 block_impl=block_impl)
            loss = loss_fn(heat, batch["targets"], batch["target_weights"])
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(trainable)
        return loss, jax.tree.map(jnp.asarray, new_bn), grads

    def finish(state, loss, new_bn, grads):
        new_params, new_opt, gnorm = apply_optimizer(
            tx, grads, state["opt_state"], state["params"])
        new_state = {
            "params": new_params,
            "opt_state": new_opt,
            "bn_state": new_bn,
            "step": state["step"] + 1,
        }
        new_state.update(_ema_update(state, new_params, ema_decay))
        return new_state, {"loss": loss, "grad_norm": gnorm}

    if grad_accum <= 1:
        def step(state, batch, rng):
            batch = render_batch_on_device(batch, render_kwargs)
            loss, new_bn, grads = grad_one(state["params"], state["bn_state"],
                                           batch, rng)
            return finish(state, loss, new_bn, grads)
        return step

    k = int(grad_accum)

    def step(state, batch, rng):
        batch = render_batch_on_device(batch, render_kwargs)
        B = batch["images"].shape[0]
        assert B % k == 0, f"batch {B} not divisible by grad_accum {k}"
        micro = jax.tree.map(
            lambda v: v.reshape((k, v.shape[0] // k) + v.shape[1:]), batch)
        keys = jax.random.split(rng, k)

        def body(carry, xs):
            bn_state, gsum, lsum = carry
            mb, key = xs
            loss, new_bn, g = grad_one(state["params"], bn_state, mb, key)
            return (new_bn, jax.tree.map(jnp.add, gsum, g), lsum + loss), None

        g0 = jax.tree.map(jnp.zeros_like, state["params"])
        (new_bn, gsum, lsum), _ = jax.lax.scan(
            body, (state["bn_state"], g0, jnp.zeros((), jnp.float32)),
            (micro, keys))
        grads = jax.tree.map(lambda g: g / k, gsum)
        return finish(state, lsum / k, new_bn, grads)

    return step


def apply_optimizer(tx, grads, opt_state, params):
    """(grads, opt_state, params) -> (new_params, new_opt_state, gnorm).

    Dispatches between a fused single-pass optimizer (train/fused_opt.py,
    anything exposing ``fused_apply``) and the generic optax
    update/apply_updates dataflow."""
    if hasattr(tx, "fused_apply"):
        return tx.fused_apply(grads, opt_state, params)
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt, optax.global_norm(grads)


def make_eval_step(cfg: ModelConfig, *, use_amp: bool = True,
                   loss_fn: Callable = joints_mse_loss,
                   return_heatmaps: bool = False, render_kwargs: Dict = None):
    """Validation step (reference valid_model, train_valid_fn.py:22-39).

    ``return_heatmaps`` additionally returns the f32 heatmaps so the epoch
    loop can compute in-loop PCK (eval/metrics.py::pose_pck_accuracy) —
    the reference's loop tracks only the loss (train_valid_fn.py:25
    ``total_metric`` is never filled in)."""
    from ..models.vitpose import vitpose_forward

    def step(state, batch):
        batch = render_batch_on_device(batch, render_kwargs)
        params = merge_bn_state(state["params"], state["bn_state"])
        fwd_params = cast_params(params, jnp.bfloat16) if use_amp else params
        x = batch["images"].astype(jnp.bfloat16 if use_amp else jnp.float32)
        heat = vitpose_forward(fwd_params, x, cfg).astype(jnp.float32)
        loss = loss_fn(heat, batch["targets"], batch["target_weights"])
        if return_heatmaps:
            return loss, heat
        return loss

    return step


def jit_data_parallel(step_fn, mesh, donate_state: bool = True):
    """jit a (state, batch, ...) step with replicated state and 'data'-sharded
    batch over the mesh — XLA derives the gradient psum over ICI."""
    rep = meshlib.replicated(mesh)
    shard = meshlib.batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def make_train_step_sharded(cfg: ModelConfig, tx: optax.GradientTransformation,
                            mesh, *, use_amp: bool = True,
                            loss_fn: Callable = joints_mse_loss,
                            block_impl: str = "pallas_train",
                            donate_state: bool = True,
                            ema_decay: float = 0.0,
                            grad_accum: int = 1, render_kwargs: Dict = None):
    """Data-parallel train step via ``shard_map`` (explicit SPMD).

    The GSPMD wrapper (``jit_data_parallel``) relies on XLA's sharding
    propagation, which has no partitioning rule for ``pallas_call`` — on a
    real multi-chip mesh it may all-gather the batch and run the fused
    custom-VJP kernels replicated.  This wrapper instead runs the whole
    per-device computation inside ``shard_map`` over the 'data' axis, so
    the Pallas train kernels see exactly the B/n_dev local shard *by
    construction* (the treatment pipeline/stream.py gave sharded serving).

    Single-program semantics are preserved exactly:
      * drop-path masks are drawn for the GLOBAL batch outside shard_map
        (replicated rng) and row-sharded in — same draws as the
        single-device step;
      * head BN batch statistics are computed globally (pmean of shard
        moments — torch SyncBatchNorm semantics; see models/head.py
        batch_norm(axis_name=...));
      * gradients/loss are pmean'd over 'data', then the optimizer update
        runs identically (replicated) on every device.

    Same (state, batch, rng) -> (state, metrics) contract as
    ``jit_data_parallel(make_train_step(...))``.
    Reference mapping: SURVEY §2.3 DDP (train_valid_fn.py:59-68).

    ``grad_accum``=k additionally splits each device's local batch into k
    sequential micro-batches (``lax.scan``), accumulating f32 gradients
    locally and pmean-ing ONCE after the scan — micro-batch i is the
    union of every device's i-th local slice, and its BN statistics are
    still global (pmean per micro-step).  One optimizer update per call,
    exactly like ``make_train_step(grad_accum=k)``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..models.vit import draw_drop_path_masks

    axis = "data"
    k = int(max(grad_accum, 1))

    def grad_one(trainable, bn_state, batch, masks):
        def compute_loss(trainable):
            params = merge_bn_state(trainable, bn_state)
            fwd_params = cast_params(params, jnp.bfloat16) if use_amp \
                else params
            x = batch["images"].astype(jnp.bfloat16 if use_amp
                                       else jnp.float32)
            heat, new_bn = vitpose_forward_train(
                fwd_params, x, cfg, block_impl=block_impl,
                drop_path_masks=masks, axis_name=axis)
            loss = loss_fn(heat, batch["targets"], batch["target_weights"])
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(trainable)
        return loss, jax.tree.map(jnp.asarray, new_bn), grads

    def device_step(state, batch, masks):
        # raw device-input batches expand per-shard (each device renders
        # only its own rows — the render partitions with the batch)
        batch = render_batch_on_device(batch, render_kwargs)
        if k == 1:
            loss, new_bn, grads = grad_one(state["params"],
                                           state["bn_state"], batch, masks)
        else:
            # local (B_loc, ...) -> (k, B_loc/k, ...); masks (L, B_loc, 1, 1)
            # -> (k, L, B_loc/k, 1, 1) so scan slices per micro-batch
            micro = jax.tree.map(
                lambda v: v.reshape((k, v.shape[0] // k) + v.shape[1:]),
                batch)
            m = masks.reshape(masks.shape[0], k, -1, 1, 1)
            m = jnp.moveaxis(m, 1, 0)

            def body(carry, xs):
                bn_state, gsum, lsum = carry
                mb, mm = xs
                loss, new_bn, g = grad_one(state["params"], bn_state, mb, mm)
                return (new_bn, jax.tree.map(jnp.add, gsum, g),
                        lsum + loss), None

            g0 = jax.tree.map(jnp.zeros_like, state["params"])
            (new_bn, gsum, lsum), _ = jax.lax.scan(
                body, (state["bn_state"], g0, jnp.zeros((), jnp.float32)),
                (micro, m))
            grads = jax.tree.map(lambda g: g / k, gsum)
            loss = lsum / k
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        new_params, new_opt, gnorm = apply_optimizer(
            tx, grads, state["opt_state"], state["params"])
        new_state = {
            "params": new_params,
            "opt_state": new_opt,
            "bn_state": new_bn,
            "step": state["step"] + 1,
        }
        # grads are pmean'd, so the update (and the EMA recursion) is
        # identical on every device — stays replicated
        new_state.update(_ema_update(state, new_params, ema_decay))
        return new_state, {"loss": loss, "grad_norm": gnorm}

    inner = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(axis), P(None, axis, None, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(state, batch, rng):
        B = _batch_rows(batch)
        masks = draw_drop_path_masks(rng, cfg.backbone, B)
        return inner(state, batch, masks)

    rep = meshlib.replicated(mesh)
    shard = meshlib.batch_sharded(mesh)
    return jax.jit(step,
                   in_shardings=(rep, shard, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,) if donate_state else ())
